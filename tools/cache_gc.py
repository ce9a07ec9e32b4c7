"""Garbage-collect stale index-cache artifacts.

    python tools/cache_gc.py [--days N] [--dry-run]

The content-tagged cache (operators/index_cache.py) embeds a token of
(module sources, input files, params) in each artifact dir's NAME, so
any code or data change lands in a FRESH dir and the old one is never
read again.  That is the correctness property — but it means every
module edit strands the previous round's artifacts under the system
temp dir.  This janitor removes `osm_spark_idx_*` entries (main dirs
AND their `<suffix>` siblings, plus orphaned `.build.*` temp copies)
whose newest file is older than ``--days`` (default 7).

Age is judged by the MAX mtime across the whole prefix group (a main
dir and its siblings live or die together — deleting the `_edges`
side-store from under a live registry dir would corrupt the set).
Live artifacts keep being re-read, but reading does not bump mtime,
so the default window is generous; a wrongly-deleted artifact costs
one rebuild, never a wrong answer (the marker protocol treats a
missing dir exactly like a cold cache).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time


def _group_key(name: str) -> str:
    """Prefix group: osm_spark_idx_<kind>_<token> — siblings append
    suffixes after the 16-hex token, temp copies append '.build.*'."""
    base = name.split(".build.")[0].split(".stale.")[0]
    # kind may contain underscores; the token is the LAST 16-hex run
    parts = base.split("_")
    for i in range(len(parts) - 1, 2, -1):
        tok = parts[i]
        if len(tok) >= 16 and all(c in "0123456789abcdef" for c in tok[:16]):
            return "_".join(parts[: i + 1])[: len("_".join(parts[: i]))
                                            + 1 + 16]
    return base


def _newest_mtime(path: str) -> float:
    newest = 0.0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                newest = max(newest, os.stat(os.path.join(root, f)).st_mtime)
            except OSError:
                continue
    try:
        newest = max(newest, os.stat(path).st_mtime)
    except OSError:
        pass
    return newest


def collect(
    days: float = 7.0, dry: bool = False, parent: str | None = None
) -> tuple[int, int, int]:
    """Sweep stale artifact groups; returns (removed, kept, bytes).

    This is the RETENTION POLICY's single entry point: artifacts
    whose whole prefix group is older than ``days`` (default 7 — one
    driver round plus slack) are deleted.  tools/verify_local.py runs
    it in its preamble, so every correctness pass doubles as the
    janitor tick and stale content-tagged artifacts can never
    accumulate unbounded across rounds."""
    parent = parent or tempfile.gettempdir()
    cutoff = time.time() - days * 86400
    groups: dict[str, list[str]] = {}
    for e in os.listdir(parent):
        if e.startswith("osm_spark_idx_"):
            groups.setdefault(_group_key(e), []).append(e)
    n_rm = n_keep = 0
    bytes_rm = 0
    for _key, members in sorted(groups.items()):
        paths = [os.path.join(parent, m) for m in members]
        newest = max(_newest_mtime(p) for p in paths)
        if newest >= cutoff:
            n_keep += len(members)
            continue
        for p in paths:
            # per-file stat guarded by try/except (not an exists()
            # pre-check, which is a TOCTOU: a concurrent deleter
            # between check and stat would abort the sweep mid-walk)
            size = 0
            for r, _, fs in os.walk(p):
                for f in fs:
                    try:
                        size += os.stat(os.path.join(r, f)).st_size
                    except OSError:
                        pass
            bytes_rm += size
            n_rm += 1
            if dry:
                print(f"would remove {p} ({size} B)")
            else:
                shutil.rmtree(p, ignore_errors=True)
    mode = "dry-run: would remove" if dry else "removed"
    print(
        f"{mode} {n_rm} entries ({bytes_rm / 1e6:.1f} MB), "
        f"kept {n_keep} (newer than {days:g} days)"
    )
    return n_rm, n_keep, bytes_rm


def main() -> None:
    days = 7.0
    dry = "--dry-run" in sys.argv
    if "--days" in sys.argv:
        days = float(sys.argv[sys.argv.index("--days") + 1])
    collect(days=days, dry=dry)


if __name__ == "__main__":
    main()
