"""Scale patterns — the 100 TB levers as reusable operators.

These are not fixture queries; they are the building blocks the
SURVEY.md §4.3 posture names for surviving scale-up, packaged so any
query in the inventory can adopt them:

* salted aggregation — two-phase groupBy for skewed keys (a hot key's
  rows split across `n_salts` partial groups, then recombined; the
  shuffle never concentrates a hot key on one task)
* salted skew join — explode the small side per salt so a skewed fact
  key joins against n copies, spreading its rows over n tasks
* two-phase distinct count — exact countDistinct without shipping
  every (key, value) pair to one stage

tests/test_scale_patterns.py proves each pattern equivalent to its
naive form, and additionally demonstrates (with plan assertions)
dynamic partition pruning and bucketed shuffle-free joins on written
layouts — the two write-time levers sources/sinks.py exposes.
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.catalog import load_table


@contextlib.contextmanager
def iter_loop_conf(
    spark: SparkSession,
    n_rows: int = 0,
    rows_per_partition: int = 262144,
    parts: int | None = None,
):
    """Session conf scoped to the BODY of an iterative round loop
    (connected components, pagerank, label propagation, k-core):
    suspends AQE and sets shuffle partitions derived from the
    MEASURED size of the relation the rounds iterate over; restores
    both on exit.  Yields the derived partition count.

    Why (r17, guide §1.2/§2): the job-count profile showed every
    AQE exchange inside a round becoming its own query-stage job
    with a driver replanning barrier — q_multimodal_dedup ran 121
    jobs, ~9 per round — and PERF_r16's scaling block (8 cores ~=
    32 cores) proves these queries are job-overhead-bound, not
    data-bound.  With AQE off a lazily-checkpointed round compiles
    to a plain physical plan whose RDD materializes inside the
    CALLER's single action (AQE's doExecute would instead submit
    every stage eagerly, even for a lazy checkpoint).  What AQE was
    contributing — post-shuffle sizing — is replaced by deriving
    the partition count from the row count the setup action already
    measured (~256k rows per partition, a few MB of fixed-width
    rows), floored at 1 and capped at the session's configured
    width so a small graph never over-fans relative to the
    deployment's own setting: sf0.1 runs 1-partition rounds, a
    100 TB corpus gets the full configured width.  The per-round
    joins key on unique node ids and the aggregates are map-side
    combined, so AQE's skew split has nothing to split inside these
    loops.  Set OSMDW_ITER_AQE=true to keep AQE on instead (e.g. a
    deployment that wants runtime skew handling in the rounds).

    Pass ``parts`` to pin the width directly instead of deriving it
    from a row count — e.g. to the materialized partition count of a
    checkpointed edge list whose partitioning the rounds reuse (AQE
    already sized that one from the data)."""
    keep_aqe = os.environ.get("OSMDW_ITER_AQE", "").lower() in ("1", "true")
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    sp_before = spark.conf.get("spark.sql.shuffle.partitions", "200")
    if parts is not None:
        loop_sp = max(1, int(parts))
    else:
        loop_sp = max(1, -(-int(n_rows) // rows_per_partition))
        loop_sp = min(loop_sp, max(int(sp_before), 1))
    if not keep_aqe:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", str(loop_sp))
    try:
        yield loop_sp
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.shuffle.partitions", sp_before)


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-phase count per key. Phase 1 groups on (key, salt) —
    partial counts spread a hot key over n_salts reducers; phase 2
    recombines per key. Identical result to groupBy(key).count() for
    any input; strictly more shuffle rows (n_salts per key), which is
    the price of flattening the skew."""
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("__salt")
    partial = df.select(F.col(key), salt).groupBy(key, "__salt").agg(
        F.count("*").alias("__partial")
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("cnt"))


def salted_sum(df: DataFrame, key: str, value: str, n_salts: int = 16) -> DataFrame:
    """Two-phase sum per key (same shape as salted_count)."""
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("__salt")
    partial = df.select(F.col(key), F.col(value), salt).groupBy(key, "__salt").agg(
        F.sum(value).alias("__partial")
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias(f"sum_{value}"))


def salted_join(
    fact: DataFrame, dim: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Skew-resistant equi-join: fact rows get a random salt; the dim
    side is exploded once per salt value, so a hot fact key's rows
    land on n_salts different tasks instead of one. Equivalent to
    fact.join(dim, key) for any input. AQE's skew-join split covers
    moderate skew automatically; explicit salting is for the
    pathological keys AQE cannot subdivide (a single key larger than
    a task)."""
    fact_s = fact.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return fact_s.join(dim_s, [key, "__salt"]).drop("__salt")


@query(
    "q_salted_join",
    oracle="""
        SELECT c_mktsegment, count(*) AS n_events,
               round(sum(value), 2) AS sum_value,
               count(DISTINCT user_id) AS n_users
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
    """,
    tags=("scale", "join", "skew"),
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted skew join wired into a real query: events (fact,
    skewed user_id) joined to customer (dim) through salted_join, then
    aggregated per market segment. The oracle is the PLAIN join — the
    salt must be semantically invisible, which is exactly what this
    row hash-verifies. At 100 TB the fact side's hot user spreads over
    n_salts tasks instead of stalling one reducer; the dim side pays
    an n_salts× row duplication, fine for dimension-sized tables."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(events, customer, "user_id", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def plain_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_salted_join WITHOUT the salt — the events⋈customer aggregate
    as a plain equi-join, relying on AQE's skew-join split instead of
    explicit salting.  Not registered (its SQL twin IS q_salted_join's
    oracle); bench.py times it against the salted form every round so
    the salting overhead at fixture scale (the dim side's n_salts× row
    duplication) stays measured, not assumed — the AQE-mechanism demo
    in tests/test_scale_patterns.py proves the split fires, this row
    tracks what it costs to opt out of it."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return events.join(customer, "user_id").groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def two_phase_distinct_count(df: DataFrame, key: str, value: str) -> DataFrame:
    """Exact distinct-count per key without a monolithic distinct
    stage: dedup (key, value) pairs first (map-side partial distinct
    applies), then count per key. Same result as
    groupBy(key).agg(countDistinct(value))."""
    return (
        df.select(key, value)
        .dropDuplicates([key, value])
        .groupBy(key)
        .agg(F.count("*").alias(f"n_distinct_{value}"))
    )


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain text as a string (plan-assertion helper)."""
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def quantile_buckets(
    df: DataFrame, value: str, n_buckets: int = 4, accuracy: int = 10000
) -> DataFrame:
    """The scale path for q_ntile's global-sort quartiles: compute
    approximate cutpoints with a fixed-memory sketch (one pass, no
    global sort), then assign buckets via a broadcast range join.
    Bucket sizes are approximately equal (sketch accuracy), which is
    what a 100 TB percentile-bucketing job actually wants — ntile's
    exact equal-splitting requires a total order that cannot scale.

    NULL and NaN values cannot be range-assigned (NaN sorts above
    +inf in Spark), so they land in an explicit overflow bucket 0
    rather than silently vanishing from the output."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.select(
        F.approx_percentile(value, probs, accuracy).alias("cuts")
    ).first()["cuts"]
    bounds = [float("-inf"), *cuts, float("inf")]
    ranges = df.sparkSession.createDataFrame(
        [(i + 1, bounds[i], bounds[i + 1]) for i in range(n_buckets)],
        "bucket int, lo double, hi double",
    )
    v = F.col(value)
    return (
        df.join(F.broadcast(ranges), (v > F.col("lo")) & (v <= F.col("hi")), "left")
        .withColumn("bucket", F.coalesce("bucket", F.lit(0)))
        .drop("lo", "hi")
    )


@query(
    "q_skew_stats",
    oracle="""
        WITH c AS (
            SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
        top10 AS (
            SELECT cnt FROM c ORDER BY cnt DESC, user_id ASC LIMIT 10),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(sum(cnt) AS BIGINT) AS n_rows,
                   CAST(max(cnt) AS BIGINT) AS max_key_rows
            FROM c)
        SELECT n_rows, n_keys, max_key_rows,
               CAST(n_rows // n_keys AS BIGINT) AS avg_key_rows,
               CAST(10000 * max_key_rows // n_rows AS BIGINT) AS top1_x10k,
               CAST((SELECT sum(cnt) FROM top10) AS BIGINT) AS top10_rows,
               CAST(10000 * (SELECT sum(cnt) FROM top10) // n_rows
                    AS BIGINT) AS top10_x10k
        FROM tot
    """,
    tags=("scale", "skew", "diagnostics"),
)
def q_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics — the measurement you run BEFORE choosing
    a skew mitigation (salt? AQE skew-join? broadcast?): per-key row
    counts reduced to max / average / top-1 and top-10 concentration
    shares. One map-side-partial groupBy on the key, then a 10-row
    TakeOrderedAndProject and a scalar aggregate — nothing larger
    than the distinct-key table ever moves. Reading the output:
    top1_x10k >> 10000/n_keys means a hot key; if top10_x10k is a
    large fraction of 10000, salting the top-k keys specifically
    (not all keys) is the cheapest fix."""
    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("user_id").agg(F.count("*").alias("cnt"))
    tot = c.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_key_rows"),
    )
    top10 = (
        c.orderBy(F.desc("cnt"), F.asc("user_id"))
        .limit(10)
        .agg(F.sum("cnt").alias("top10_rows"))
    )
    return (
        tot.crossJoin(F.broadcast(top10))
        .select(
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_keys").cast("bigint").alias("n_keys"),
            F.col("max_key_rows").cast("bigint").alias("max_key_rows"),
            F.expr("CAST(n_rows div n_keys AS BIGINT)").alias("avg_key_rows"),
            F.expr("CAST(10000 * max_key_rows div n_rows AS BIGINT)").alias("top1_x10k"),
            F.col("top10_rows").cast("bigint").alias("top10_rows"),
            F.expr("CAST(10000 * top10_rows div n_rows AS BIGINT)").alias("top10_x10k"),
        )
    )
