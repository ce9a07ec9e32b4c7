"""Maintain STAMPS.json — per-query implementation fingerprints,
computed from the git tree the driver actually verified.

A driver stamp (green row in CORRECTNESS_r*.json) certifies one
specific implementation of a query.  The fingerprint recorded here is
computed from the COMMIT that introduced that CORRECTNESS file's
content — the driver commits its outputs on top of the end-of-round
snapshot it verified, so that tree IS the verified source.  The
working tree is never trusted: running this tool at any point in a
round, before or after edits, records exactly what the driver saw
(the previous version stamped the *current* fingerprint and relied on
the convention that the tool runs at round start before any edit — a
late first run would have certified source the driver never
verified).

For each query the NEWEST round with a green row defines its verified
tree.  Fingerprints are computed by a subprocess inside a `git
archive` export of that commit, with the current `__spark_entry__.py`
overlaid so the *current* fingerprint algorithm runs over the
*verified* package source — an algorithm change therefore re-keys
every stamp consistently instead of orphaning all of them.

Discovery is restricted to COMMITTED CORRECTNESS files (`git ls-files`)
and green rows are read from the committed blob, never the working
tree: an untracked or locally-edited CORRECTNESS file cannot claim a
name away from an older committed round and then be skipped for having
no commit (which silently dropped those names' stamps), and a
working-tree edit cannot certify rows the driver never wrote.  The
ledger is therefore a pure function of committed history — running
this tool with a dirty tree is safe at any point in a round.

`__spark_entry__._ordered_specs` classifies a query whose working-tree
fingerprint differs from its stamp as *modified* and rotates it back
into the driver's ~50-entry verification window.  To force
re-verification of a stamped query, edit its implementation (even a
docstring touch changes the source hash) — STAMPS.json itself is a
pure function of the CORRECTNESS history and regenerating it would
undo a manual deletion.

    python tools/update_stamps.py          # regenerate from history
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

REPO = os.path.dirname(entrymod.__file__)
STAMPS_PATH = os.path.join(REPO, "STAMPS.json")

_SUBPROC_SCRIPT = (
    "import json, __spark_entry__ as e; "
    "from open_street_map_data_wrangling_spark.plans import load_all_queries; "
    "print(json.dumps({n: e._fingerprint(s) "
    "for n, s in load_all_queries().items()}))"
)


def _committed_corr_files() -> list[str]:
    """Basenames of CORRECTNESS files tracked by git, sorted by round.
    Untracked files (e.g. a driver output not yet committed) are
    invisible here by design — see the module docstring."""
    out = subprocess.run(
        ["git", "ls-files", "CORRECTNESS_r*.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    return sorted(l.strip() for l in out.stdout.splitlines() if l.strip())


def _green_names(corr_basename: str, commit: str) -> set[str]:
    """Green rows from the COMMITTED blob of this round's file."""
    out = subprocess.run(
        ["git", "show", f"{commit}:{corr_basename}"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    if out.returncode != 0:
        return set()
    try:
        rows = json.loads(out.stdout)
    except ValueError:
        return set()
    return {
        n
        for n, rec in rows.items()
        if isinstance(rec, dict)
        and (rec.get("hash_match") is True or rec.get("err") == "no_oracle")
    }


def _verified_commit(corr_basename: str) -> str | None:
    """Commit whose tree carries the source the driver verified for
    this round: the last commit that changed the CORRECTNESS file."""
    out = subprocess.run(
        ["git", "log", "-n1", "--format=%H", "--", corr_basename],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    sha = out.stdout.strip()
    return sha or None


def _fingerprints_at(commit: str) -> dict[str, str] | None:
    """{name: fingerprint} with the CURRENT algorithm over the package
    source at ``commit`` (current __spark_entry__.py overlaid on a
    git-archive export; registry import only — no SparkSession)."""
    tmp = tempfile.mkdtemp(prefix="osmdw_stamps_")
    try:
        archive = subprocess.run(
            ["git", "archive", commit],
            cwd=REPO,
            capture_output=True,
        )
        if archive.returncode != 0:
            return None
        subprocess.run(["tar", "-x", "-C", tmp], input=archive.stdout, check=True)
        shutil.copy(
            os.path.join(REPO, "__spark_entry__.py"),
            os.path.join(tmp, "__spark_entry__.py"),
        )
        run = subprocess.run(
            [sys.executable, "-c", _SUBPROC_SCRIPT],
            cwd=tmp,
            capture_output=True,
            text=True,
            env={**os.environ, "PYTHONPATH": tmp},
        )
        if run.returncode != 0:
            sys.stderr.write(run.stderr[-2000:] + "\n")
            return None
        return json.loads(run.stdout.strip().splitlines()[-1])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main(argv: list[str]) -> int:
    corr_files = _committed_corr_files()
    # resolve each committed round's verified commit up front, then
    # assign every name to the NEWEST round (with a resolvable commit)
    # that has a green row for it
    round_commit = {b: _verified_commit(b) for b in corr_files}
    skipped_rounds = [b for b, c in round_commit.items() if c is None]
    verified_round: dict[str, str] = {}
    for base in reversed(corr_files):
        commit = round_commit[base]
        if commit is None:
            continue
        for name in _green_names(base, commit):
            verified_round.setdefault(name, base)

    stamps: dict[str, str] = {}
    for base in sorted({r for r in verified_round.values()}):
        names = [n for n, r in verified_round.items() if r == base]
        fps = _fingerprints_at(round_commit[base])
        if fps is None:
            # unreadable commit tree: better to leave these names
            # unstamped (they re-queue for verification) than to
            # certify source the driver may never have seen
            skipped_rounds.append(base)
            continue
        for n in names:
            if n in fps:
                stamps[n] = fps[n]

    with open(STAMPS_PATH, "w") as fh:
        json.dump(dict(sorted(stamps.items())), fh, indent=1)
        fh.write("\n")

    # report how the working tree now classifies against the stamps
    from open_street_map_data_wrangling_spark.plans import load_all_queries

    specs = load_all_queries()
    modified = [
        n
        for n, s in specs.items()
        if n in stamps and entrymod._fingerprint(s) != stamps[n]
    ]
    unstamped = [n for n in specs if n not in stamps]
    print(
        f"recorded {len(stamps)} stamps from {len(corr_files)} committed rounds; "
        f"working tree: {len(modified)} modified, {len(unstamped)} unstamped"
    )
    if skipped_rounds:
        print("skipped (no verified commit):", ", ".join(skipped_rounds))
    if modified:
        print("modified:", ", ".join(sorted(modified)))
    if unstamped:
        print("unstamped:", ", ".join(sorted(unstamped)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
