"""Per-query bench regression gate.

    python tools/bench_gate.py [--threshold R] [--floor SEC]
                               [current.json [baseline.json]]

Diffs the working tree's full per-query bench map
(``BENCH_FULL_LATEST.json``) against the PREVIOUS round's map and
exits non-zero if any query regressed beyond the threshold — turning
the 180+-query map into enforcement the way stamps and COVERAGE
totals already are (r15 verdict #8).

Baseline resolution: with no explicit baseline path, walk
``git log -- BENCH_FULL_LATEST.json`` and take the NEWEST committed
version whose content differs from the current map — i.e. "the
previous round's map" even when the current one is already committed.
If no differing version exists (first round with a map), the gate
passes vacuously.

Noise policy: single-process local bench times jitter by tens of ms,
so a pure ratio would flag 0.05 s -> 0.09 s. A query only fails the
gate when BOTH hold: time > threshold x baseline (default 1.5) AND
baseline >= floor seconds (default 0.30 — below that the fixed Spark
job overhead dominates and the ratio is noise).  Queries present in
only one map are reported but never fail the gate (new/removed ops).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAP = "BENCH_FULL_LATEST.json"

# r17 (VERDICT r16 #8): the r16 codec optimizations pushed these
# queries BELOW the gate's 0.30 s noise floor and out of bench.py's
# printed slowest-66 window — a regression there would be invisible
# to both the driver line and the floored gate.  Always-checked
# queries are gated regardless of the floor (with a 0.15 s absolute
# guard so tens-of-ms jitter still cannot flag).  Append-only.
ALWAYS_CHECK = frozenset(
    {
        "q_image_gif",
        "q_image_jpeg",
        "q_audio_pcm",
        "q_image_pixels",
        "q_video_sample",
        "q_video_frames",
        "q_image_thumbnail",
    }
)
ALWAYS_CHECK_ABS_GUARD = 0.15  # seconds


def _queries(obj: dict) -> dict[str, float]:
    qs = obj.get("queries", obj)
    return {k: float(v) for k, v in qs.items()}


def previous_committed_map(current: dict) -> dict | None:
    """Newest committed BENCH_FULL_LATEST.json whose content differs
    from ``current`` — the previous round's map."""
    revs = subprocess.run(
        ["git", "log", "--format=%H", "--", MAP],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    cur_q = _queries(current)
    for rev in revs:
        show = subprocess.run(
            ["git", "show", f"{rev}:{MAP}"],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        if show.returncode != 0:
            continue
        try:
            cand = json.loads(show.stdout)
        except ValueError:
            continue
        if _queries(cand) != cur_q:
            return cand
    return None


def gate(
    current: dict,
    baseline: dict,
    threshold: float = 1.5,
    floor: float = 0.30,
) -> tuple[list[str], list[str]]:
    """Returns (failures, notes); the gate fails iff failures.

    Ambient normalization (r16): the two maps are usually recorded on
    different days under different machine states — when the WHOLE
    map drifts together (r16 measured a median 1.09x against r15's
    map while an alternating same-host A/B of the two trees showed
    0 code regression), a raw ratio gate reports the weather.  The
    gate therefore divides each per-query ratio by the MEDIAN ratio over
    the common set (the session-state estimator a single query cannot
    move) and flags only the residual, so a real single-query
    regression still fails while a uniform ambient shift passes."""
    import statistics

    cur, base = _queries(current), _queries(baseline)
    failures, notes = [], []
    common = sorted(set(cur) & set(base))
    gated = [q for q in common if base[q] >= floor]
    # the median is a session-state estimator only when the cohort is
    # large enough that no single query IS the median — below 8 gated
    # queries fall back to raw ratios
    ambient = (
        statistics.median(cur[q] / base[q] for q in gated)
        if len(gated) >= 8
        else 1.0
    )
    ambient = max(ambient, 1.0)  # never EXCUSE a uniform speedup's outliers
    if ambient > 1.02:
        notes.append(
            f"ambient drift: median ratio {ambient:.2f}x over "
            f"{len(gated)} gated queries — residual gated at {threshold}x"
        )
    waivers = {}
    wpath = os.path.join(REPO, "BENCH_WAIVERS.json")
    if os.path.exists(wpath):
        with open(wpath) as f:
            waivers = json.load(f)
    for q in common:
        floored = base[q] >= floor or (
            q in ALWAYS_CHECK
            and cur[q] - base[q] > ALWAYS_CHECK_ABS_GUARD
        )
        if floored and cur[q] > threshold * ambient * base[q]:
            w = waivers.get(q)
            if w and base[q] <= float(w["baseline_below"]):
                # a DOCUMENTED intentional trade (e.g. a scale-safe
                # plan rewrite priced higher at bench SF), pinned to
                # the pre-change baseline: once the committed map
                # records the new cost, base[q] exceeds the pin and
                # the waiver self-expires — it can never hide a
                # FURTHER regression on top of the waived one
                notes.append(
                    f"waived: {q} {base[q]:.3f}s -> {cur[q]:.3f}s "
                    f"({w['reason']})"
                )
                continue
            failures.append(
                f"{q}: {base[q]:.3f}s -> {cur[q]:.3f}s "
                f"({cur[q] / base[q]:.2f}x raw, "
                f"{cur[q] / (ambient * base[q]):.2f}x residual > {threshold}x)"
            )
    only_new = sorted(set(cur) - set(base))
    only_old = sorted(set(base) - set(cur))
    if only_new:
        notes.append(f"new queries (not gated): {', '.join(only_new)}")
    if only_old:
        notes.append(f"dropped queries: {', '.join(only_old)}")
    return failures, notes


def main() -> int:
    args = [a for a in sys.argv[1:]]
    threshold, floor = 1.5, 0.30
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = float(args[i + 1])
        del args[i : i + 2]
    if "--floor" in args:
        i = args.index("--floor")
        floor = float(args[i + 1])
        del args[i : i + 2]
    cur_path = args[0] if args else os.path.join(REPO, MAP)
    with open(cur_path) as f:
        current = json.load(f)
    if len(args) > 1:
        with open(args[1]) as f:
            baseline = json.load(f)
    else:
        baseline = previous_committed_map(current)
        if baseline is None:
            print("bench-gate: no differing committed map — vacuous pass")
            return 0
    failures, notes = gate(current, baseline, threshold, floor)
    for n in notes:
        print(f"bench-gate note: {n}")
    if failures:
        print(f"bench-gate FAIL ({len(failures)} regressions):")
        for f_ in failures:
            print(f"  {f_}")
        return 1
    n = len(set(_queries(current)) & set(_queries(baseline)))
    print(f"bench-gate PASS: {n} common queries within {threshold}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
