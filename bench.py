"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query is fully materialized through
the `noop` sink — unlike count(), noop cannot let column pruning skip
the projected work, so timings reflect real execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from open_street_map_data_wrangling_spark.plans import load_all_queries
from open_street_map_data_wrangling_spark.session import get_spark

HEADLINE = (
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q8",
    "q_tpch_q13",
    "q_tpch_q21",
    "q_star_join",
    "q_top_users",
    "q_moving_avg",
    "q_sessionize",
    "q_tumbling",
    "q_wordcount",
    "q_dedup_exact",
    "q_dedup_near",
    "q_dedup_near_fast",
    "q_dedup_ngram",
    "q_vec_topk",
    "q_ann_ivf",
    "q_fuzzy_street",
    "q_langid",
    "q_mm_extract",
    "q_tfidf",
    "q_asof_join",
    "q_contamination",
    # added round 2 (keep the set append-only so rounds stay comparable)
    "q_dedup_clusters",
    "q_tpch_q17",
    "q_salted_join",
    "q_simhash_near",
    "q_repetition",
    "q_rare_tokens",
    "q_chunk_dedup",
    "q_curriculum",
    "q_minhash_estimate",
    "q_centroids",
    "q_expectations",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    specs = load_all_queries()
    spark = get_spark("osmdw-bench", driver_memory=os.environ.get("OSMDW_DRIVER_MEM", "48g"))

    # Warmup: run every headline plan shape once at the smallest SF —
    # whole-stage codegen compilation, JIT, and Python-worker startup
    # are one-time costs per plan, not per-byte throughput; timing them
    # against sf0.1 would benchmark the JVM compiler instead of the
    # engine.
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        specs[name].spark(spark, warm_dir).write.format("noop").mode("overwrite").save()

    # best-of-2 per query: local machines carry ambient load and the
    # min is the stable steady-state estimator
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in HEADLINE:
            t0 = time.time()
            specs[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
