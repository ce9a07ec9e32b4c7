"""Table catalog over the driver fixture universe.

Reference scan (SURVEY.md §2.1 S1): `ET.iterparse` over one OSM XML
file, `elem.clear()` to bound memory — a streaming row scan. Engine
equivalent: columnar Parquet scans; Catalyst gives predicate pushdown
+ column pruning into the scan for free, which is the 100 TB version
of "only touch what you need".

The fixture universe (TESTDATA.md / FIXTURES.md):
    region nation customer supplier part orders lineitem
    events documents embeddings

OSM-analog binding (FIXTURES.md §B): events ≈ the element-metadata
stream (user_id≈uid, ts≈timestamp, props≈tag map), star-schema joins
≈ nodes_tags-style id joins, documents/embeddings serve the text /
similarity extensions.

ts normalization note: the fixture generator has shipped `events.ts`
in two physical forms across rounds — TIMESTAMP(NANOS) (rejected by
Spark's vectorized reader; `nanosAsLong=true` surfaces it as a long
we exactly-truncate with `ts div 1000` — integer division, a double
would lose precision above 2^53) and plain TIMESTAMP(MICROS) with
isAdjustedToUTC=false (arrives as TIMESTAMP_NTZ, which rejects
`unix_micros` et al.). `load_table` normalizes BOTH to TimestampType;
the NTZ→LTZ cast is instant-preserving because the session timezone
is pinned UTC (session.py). DuckDB reads the same file as a naive
µs timestamp, so both engines see identical µs instants either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_conf

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes events.ts to TimestampType."""
    apply_runtime_conf(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) via nanosAsLong
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":  # TIMESTAMP(MICROS), naive
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES, register: bool = True
) -> dict[str, DataFrame]:
    """Load fixture tables; optionally register temp views under their
    bare names so `spark.sql` queries see the same catalog the DuckDB
    oracle does."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def tags_long_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `nodes_tags`-shaped long table (SURVEY.md §1.2): one row per
    (element id, key, value). Derived from `events` by unpivoting the
    typed column plus the JSON props map — the engine's analog of
    exploding the per-element OSM tag soup into the join-friendly
    canonical form.

    stack() is a zero-shuffle narrow transform; at 100 TB this stays
    embarrassingly parallel (no exchange in the plan).
    """
    events = load_table(spark, sf_dir, "events")
    return events.select(
        F.col("event_id").alias("id"),
        F.expr(
            "stack(2, 'event_type', event_type, 'k', get_json_object(props, '$.k')) AS (key, value)"
        ),
    )


# DuckDB twin of tags_long_table, spliced into oracle SQL strings.
TAGS_LONG_SQL = """
    SELECT event_id AS id, 'event_type' AS key, event_type AS value FROM events
    UNION ALL
    SELECT event_id AS id, 'k' AS key, regexp_extract(props, '"k":\\s*(\\d+)', 1) AS value FROM events
"""
