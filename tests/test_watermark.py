"""Watermark semantics (SURVEY.md §2.9 'watermark / late data'):
drive a running tumbling-window query across two micro-batches and
observe that (a) windows finalize once the watermark passes them and
(b) an event later than the watermark is dropped, not aggregated."""

import time
import uuid

from pyspark.sql import functions as F

from open_street_map_data_wrangling_spark.streaming import (
    events_file_stream,
    tumbling_counts,
)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, 1, "click", 1.0, "{}") for i, ts in enumerate(rows)],
        "event_id long, ts_s string, user_id long, event_type string, value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def test_late_data_dropped(spark, tmp_path):
    src = str(tmp_path / "src")
    name = f"wm_{uuid.uuid4().hex[:8]}"

    # batch 1: events 10:00-10:30 -> watermark advances to 10:20
    _mk_events(
        spark,
        ["2024-01-01 10:00:10", "2024-01-01 10:07:00", "2024-01-01 10:30:00"],
    ).write.mode("overwrite").parquet(src)

    stream = events_file_stream(spark, src)
    q = (
        tumbling_counts(stream, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()

        # batch 2: one very late event (09:00 < watermark) that must be
        # dropped + one fresh event (10:40) that advances the watermark
        # past the 10:05 and 10:30 windows
        _mk_events(
            spark, ["2024-01-01 09:00:00", "2024-01-01 10:40:00"]
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {r.win_start_us: r.cnt for r in spark.table(name).collect()}
    win = lambda hhmm: int(
        (
            __import__("datetime").datetime.fromisoformat(f"2024-01-01 {hhmm}:00+00:00")
        ).timestamp()
        * 1_000_000
    )
    # finalized windows contain exactly the on-time events
    assert rows.get(win("10:00")) == 1
    assert rows.get(win("10:05")) == 1
    # the 09:00 late event produced no window
    assert win("09:00") not in rows
