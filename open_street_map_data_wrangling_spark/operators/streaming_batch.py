"""Windowed / sessionized event-time operators — SURVEY.md §2.9.

The reference is batch-only; the driver's `events` table motivates a
streaming surface. These are the *batch-equivalent* forms so DuckDB
can oracle-check the exact same logic; `streaming/jobs.py` wires the
identical expressions behind `readStream` (rows-only checked).

Window starts are emitted as epoch-µs BIGINTs. The oracle computes
bucket starts arithmetically (`epoch_us // width * width`) rather
than via DuckDB's `time_bucket`, so alignment (Spark windows are
1970-epoch aligned) is explicit and engine-independent.

Scale notes: tumbling/sliding windows are plain hash aggregates on
(bucket, key) — map-side partial agg applies; sessionization is one
shuffle on user_id + a per-partition sort, the same cost shape
Structured Streaming's state store pays incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.catalog import load_table

_FIVE_MIN_US = 5 * 60 * 1_000_000
_TEN_MIN_US = 10 * 60 * 1_000_000


@query(
    "q_tumbling",
    oracle=f"""
        SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // {_FIVE_MIN_US}) * {_FIVE_MIN_US}
                 AS win_start_us,
               event_type, count(*) AS cnt
        FROM events
        GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute window count per event type (§2.9) via
    `F.window` — the same expression Structured Streaming runs
    incrementally."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.unix_micros("w.start").alias("win_start_us"), "event_type", "cnt")
    )


@query(
    "q_sliding",
    oracle=f"""
        SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // {_FIVE_MIN_US}) * {_FIVE_MIN_US}
                 - k.k * {_FIVE_MIN_US} AS win_start_us,
               count(*) AS cnt
        FROM events CROSS JOIN (VALUES (0), (1)) k(k)
        GROUP BY 1
    """,
    tags=("streaming", "window"),
)
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 10-minute width, 5-minute slide (§2.9). Every
    event lands in exactly two windows; the oracle materializes the
    two shifted 5-minute-grid buckets explicitly."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.unix_micros("w.start").alias("win_start_us"), "cnt")
    )


_SESSIONIZE_SQL = """
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                         - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                         > 30 * 60 * 1000000
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts_us,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events, min(ts_us) AS start_us, max(ts_us) AS end_us
    FROM sessions
    GROUP BY user_id, session_id
"""


@query("q_sessionize", oracle=_SESSIONIZE_SQL, tags=("streaming", "session"))
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity gap) via
    lag + cumulative-sum of session-start flags (§2.9) — the
    DataFrame program both engines can run identically."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    flagged = events.select(
        "user_id",
        "event_id",
        ts_us.alias("ts_us"),
        F.when(
            (ts_us - F.lag(ts_us).over(w) > 30 * 60 * 1_000_000)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w2))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    )


@query("q_session_window", oracle=_SESSIONIZE_SQL, tags=("streaming", "session"))
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native `session_window` (30-minute gap) — must produce exactly
    the gap-sessionization the lag/cumsum oracle computes; session_id
    is reconstructed per user by start-time order so the two
    formulations align row-for-row."""
    events = load_table(spark, sf_dir, "events")
    grouped = (
        events.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
    )
    w = W.partitionBy("user_id").orderBy("first_ts")
    return grouped.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("session_id"),
        "n_events",
        F.unix_micros("first_ts").alias("start_us"),
        F.unix_micros("last_ts").alias("end_us"),
    )


@query(
    "q_stream_dedup",
    oracle=f"""
        SELECT DISTINCT user_id,
               (epoch_us(CAST(ts AS TIMESTAMP)) // {_TEN_MIN_US * 6}) * {_TEN_MIN_US * 6}
                 AS hour_us,
               event_type
        FROM events
    """,
    tags=("streaming", "dedup"),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup's batch form (§2.9): one row per (user, hour,
    type) — in streaming this is `withWatermark + dropDuplicates`
    with the watermark bounding state retention."""
    events = load_table(spark, sf_dir, "events")
    hour_us = (F.unix_micros("ts") - F.unix_micros("ts") % (3600 * 1_000_000)).alias(
        "hour_us"
    )
    return events.select("user_id", hour_us, "event_type").dropDuplicates()
