"""Count Spark jobs (actions) one registry query triggers, plus wall
time — the instrument for serve-path composition depth (r17 item 3:
at sf0.1 the slow serve queries are JOB-BOUND, not data-bound; the
8-core~=32-core scaling fingerprint in PERF_r16 proves per-job
overhead dominates, so job count is the lever the bench can see).

    python tools/profile_jobs.py q_name [q_name ...] [--sf sf_dir]

Prints one JSON line per query: {"query", "jobs", "best_sec", "runs"}.
Jobs are counted with the status tracker's job-id delta around a warm
noop materialization (cached index artifacts already built by the
warmup run, so the count is the SERVE path's own composition depth).
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
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    names = argv
    if not names:
        sys.exit(__doc__)
    specs = load_all_queries()
    unknown = [n for n in names if n not in specs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    spark = get_spark("osmdw-profile-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    for name in names:
        # warm (builds cached artifacts, compiles codegen)
        specs[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        runs = []
        jobs = None
        for i in range(3):
            group = f"profile:{name}:{i}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            specs[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobGroup("idle", "idle")
            jobs = len(tracker.getJobIdsForGroup(group) or [])
        print(
            json.dumps(
                {
                    "query": name,
                    "jobs": jobs,
                    "best_sec": min(runs),
                    "runs": runs,
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
