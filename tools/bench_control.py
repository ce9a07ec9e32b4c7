"""Same-host control-pair benchmark: pinned prior tree vs working
tree (VERDICT r13 advice #2, made durable as a tool in r15).

    python tools/bench_control.py <prior-commit> <out.json> [label]

Procedure (the BENCH_CONTROL_r14 design):
* `git worktree add` the prior commit at a temp path (reused if
  already present at the same commit).
* TWO passes in OPPOSITE orders — pass 1 runs prior-then-current,
  pass 2 current-then-prior — because the second leg of a pass starts
  under the first leg's load tail; swapping the order in pass 2
  controls for exactly that bias.
* An idle settle (load1 below threshold, bounded wait) before every
  leg; /proc/loadavg snapshots are recorded.
* Headline comparator: per-query MIN over the two passes on each
  tree (each query's quietest window), summed over the common query
  subset.

Each leg is one `python bench.py` in the tree's own directory; the
full per-query record is parsed from the run's stdout (the longest
JSON line — the middle of bench.py's three-line output), so the tool
works against trees from before BENCH_FULL_LATEST.json existed.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SETTLE_LOAD = 1.5
SETTLE_MAX_S = 900


def _settle(tag: str, notes: list[str]) -> None:
    t0 = time.time()
    while time.time() - t0 < SETTLE_MAX_S:
        load1 = float(open("/proc/loadavg").read().split()[0])
        if load1 < SETTLE_LOAD:
            break
        time.sleep(10)
    notes.append(f"load before {tag}: " + open("/proc/loadavg").read().strip())


def _run_bench(tree: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
    run = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if run.returncode != 0:
        raise RuntimeError(f"bench failed in {tree}: {run.stderr[-800:]}")
    best: dict | None = None
    for line in run.stdout.splitlines():
        line = line.strip()
        if not (line.startswith("{") and line.endswith("}")):
            continue
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if isinstance(rec.get("queries"), dict) and (
            best is None or len(rec["queries"]) > len(best["queries"])
        ):
            best = rec
    if best is None:
        raise RuntimeError(f"no parseable bench line from {tree}")
    return best


def main() -> None:
    prior_commit, out_path = sys.argv[1], sys.argv[2]
    label = sys.argv[3] if len(sys.argv) > 3 else "control pair"
    prior_tree = f"/tmp/ctrl_{prior_commit[:8]}"
    if os.path.isdir(prior_tree):
        # Reuse ONLY a verified-clean checkout of the requested
        # commit — an interrupted run, manual edits, or leftover
        # build artifacts in the tree would silently bench the wrong
        # code and skew the control ratio.
        head = subprocess.run(
            ["git", "-C", prior_tree, "rev-parse", "HEAD"],
            capture_output=True,
            text=True,
        )
        status = subprocess.run(
            ["git", "-C", prior_tree, "status", "--porcelain"],
            capture_output=True,
            text=True,
        )
        want = subprocess.run(
            ["git", "rev-parse", prior_commit],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip()
        if (
            head.returncode != 0
            or status.returncode != 0
            or head.stdout.strip() != want
            or status.stdout.strip()
        ):
            subprocess.run(
                ["git", "worktree", "remove", "--force", prior_tree],
                cwd=REPO,
                capture_output=True,
            )
            shutil.rmtree(prior_tree, ignore_errors=True)
    if not os.path.isdir(prior_tree):
        subprocess.run(
            ["git", "worktree", "add", "--detach", prior_tree, prior_commit],
            cwd=REPO,
            check=True,
            capture_output=True,
        )
    notes: list[str] = []
    # Cache-priming pre-pass (untimed): the PRIOR tree's /tmp index
    # artifacts are warm from its own round's runs, while the current
    # tree's code edits re-token shared artifacts — without a priming
    # leg, pass 1 charges those one-time rebuilds to the current
    # tree's timings (observed as a uniform smear in the first r15
    # attempt).  Prime both trees so every TIMED leg is cache-warm.
    for leg, tree in (("current", REPO), ("prior", prior_tree)):
        _settle(f"prime/{leg}", notes)
        _run_bench(tree)
        notes.append(f"primed {leg}")
    passes: dict[str, dict] = {}
    for pass_name, order in (
        ("pass1_prior_first", (("prior", prior_tree), ("current", REPO))),
        ("pass2_current_first", (("current", REPO), ("prior", prior_tree))),
    ):
        legs = {}
        for leg, tree in order:
            _settle(f"{pass_name}/{leg}", notes)
            t0 = time.time()
            rec = _run_bench(tree)
            legs[leg] = {
                "wall_sec": round(time.time() - t0, 1),
                "value": rec["value"],
                "queries": rec["queries"],
            }
            print(
                f"{pass_name}/{leg}: {rec['value']}s over "
                f"{len(rec['queries'])} queries",
                file=sys.stderr,
            )
        passes[pass_name] = legs

    def _min_q(tree: str) -> dict[str, float]:
        q1 = passes["pass1_prior_first"][tree]["queries"]
        q2 = passes["pass2_current_first"][tree]["queries"]
        return {k: min(q1[k], q2[k]) for k in set(q1) & set(q2)}

    prior_q, cur_q = _min_q("prior"), _min_q("current")
    common = sorted(set(prior_q) & set(cur_q))
    prev_sec = round(sum(prior_q[q] for q in common), 3)
    now_sec = round(sum(cur_q[q] for q in common), 3)
    deltas = sorted(
        ((q, round(cur_q[q] - prior_q[q], 3)) for q in common),
        key=lambda kv: kv[1],
    )
    out = {
        "purpose": (
            f"{label}: pinned prior tree (commit {prior_commit[:8]}, git "
            f"worktree at {prior_tree}) vs current tree, sf0.1 local[32]. "
            "TWO passes in OPPOSITE orders with idle settles; headline "
            "comparator is per-query min-over-passes."
        ),
        "window_loads": notes,
        "passes": {
            p: {leg: {k: v for k, v in d.items() if k != "queries"}
                for leg, d in legs.items()}
            for p, legs in passes.items()
        },
        "common_subset_min_over_passes": {
            "n_queries": len(common),
            "prev_sec": prev_sec,
            "now_sec": now_sec,
            "ratio": round(now_sec / prev_sec, 3) if prev_sec else None,
        },
        "top_improvements": deltas[:8],
        "top_regressions": deltas[-8:][::-1],
        "new_queries_current": sorted(
            set(passes["pass2_current_first"]["current"]["queries"])
            - set(prior_q)
        ),
        "per_query_min": {"prior": prior_q, "current": cur_q},
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"wrote {out_path}: {len(common)} common queries "
        f"{prev_sec}s -> {now_sec}s "
        f"(ratio {out['common_subset_min_over_passes']['ratio']})"
    )


if __name__ == "__main__":
    main()
