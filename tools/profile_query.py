"""Profile one registry query: wall time (best-of-N warm) + physical
plan complexity summary.

    python tools/profile_query.py q_name [sf_dir] [n_runs]

Prints one JSON object: timings plus counts of the plan features the
scale postures care about (exchanges, scans, join strategies, windows,
whole-stage codegen spans). The per-round audit loop: run this before
and after touching an operator; if a count moved, explain why in the
commit (PLANS.md is built from exactly these observations).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_street_map_data_wrangling_spark.plans import load_all_queries
from open_street_map_data_wrangling_spark.session import get_spark


def main(argv: list[str]) -> int:
    if not argv:
        sys.exit(__doc__)
    name = argv[0]
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(argv[2]) if len(argv) > 2 else 3
    specs = load_all_queries()
    if name not in specs:
        sys.exit(f"unknown query {name!r}")
    spark = get_spark("osmdw-profile")
    spark.sparkContext.setLogLevel("ERROR")

    def run() -> float:
        t0 = time.time()
        specs[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    times = [run() for _ in range(max(1, n_runs))]
    df = specs[name].spark(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = {
        "query": name,
        "sf_dir": sf_dir,
        "runs": times,
        "best_sec": min(times),
        "plan": {
            "exchanges_hash": plan.count("Exchange hashpartitioning"),
            "exchanges_range": plan.count("Exchange rangepartitioning"),
            "exchanges_single": plan.count("Exchange SinglePartition"),
            "reused_exchanges": plan.count("ReusedExchange"),
            "parquet_scans": plan.count("Scan parquet"),
            "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
            "sort_merge_joins": plan.count("SortMergeJoin"),
            "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
            "nested_loop_joins": plan.count("NestedLoopJoin"),
            "windows": plan.count("Window ["),
            "window_group_limits": plan.count("WindowGroupLimit"),
            "take_ordered": plan.count("TakeOrderedAndProject"),
            "codegen_spans": plan.count("WholeStageCodegen"),
        },
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
