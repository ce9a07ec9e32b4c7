"""Statistical & analytic breadth operators.

Beyond the reference's min/max/avg report stats (§2.4 A8): exact
percentiles, correlation/variance, ntile bucketing, first/last
values per group, and conditional-expression coverage. All rounded at
non-boundary precision so the two engines' last-ulp differences in
Welford-style accumulators cannot flip a digit (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.catalog import load_table


@query(
    "q_percentiles",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90,
               round(quantile_cont(value, 0.99), 4) AS p99
        FROM events GROUP BY event_type
    """,
    tags=("stats", "agg"),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ≡
    DuckDB `quantile_cont`). At 100 TB the exact form needs a per-group
    sort; `approx_percentile` (t-digest sketch, fixed memory) is the
    scale path — shown rows-only in q_approx_percentiles."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


@query("q_approx_percentiles", oracle=None, tags=("stats", "sketch"))
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (fixed-memory per group) — the 100 TB
    counterpart of q_percentiles; no exact SQL twin, rows-only."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_percentile("value", 0.5, 10000).alias("p50_approx"),
        F.approx_percentile("value", 0.9, 10000).alias("p90_approx"),
    )


@query(
    "q_corr_stats",
    oracle="""
        SELECT o_orderstatus,
               round(corr(o_totalprice, epoch_us(CAST(o_orderdate AS TIMESTAMP)) / 1e15), 6)
                 AS price_time_corr,
               round(stddev_samp(o_totalprice), 2) AS price_sd,
               round(var_samp(o_totalprice) / 1e6, 4) AS price_var_m,
               count(*) AS cnt
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("stats", "agg"),
)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / stddev / variance per group — the reference's
    report never computes these; a data-quality pipeline does."""
    orders = load_table(spark, sf_dir, "orders")
    t = F.unix_micros(F.col("o_orderdate").cast("timestamp")) / F.lit(1e15)
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.corr(F.col("o_totalprice"), t), 6).alias("price_time_corr"),
        F.round(F.stddev_samp("o_totalprice"), 2).alias("price_sd"),
        F.round(F.var_samp("o_totalprice") / 1e6, 4).alias("price_var_m"),
        F.count("*").alias("cnt"),
    )


@query(
    "q_ntile",
    oracle="""
        SELECT quartile, count(*) AS cnt, round(min(o_totalprice), 2) AS lo,
               round(max(o_totalprice), 2) AS hi
        FROM (
            SELECT o_totalprice,
                   CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
            FROM orders)
        GROUP BY quartile
    """,
    tags=("stats", "window"),
)
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartile bucketing over a global order — WITHOUT the
    single-partition global sort ntile() implies.  Distributed exact
    ranking: (1) approx-percentile cutpoints split the price domain
    into ~32 range buckets (cutpoint *placement* is approximate;
    correctness never depends on it — only bucket-size balance does);
    (2) rows land in buckets via a 33-row broadcast range join;
    (3) one hash exchange on the bucket id gives within-bucket
    row_number over (price, orderkey); (4) a second columnar scan
    with map-side partial counts yields per-bucket sizes, whose
    cumulative offsets (a 32-row table — the only SinglePartition
    exchange, post-aggregation) convert local ranks to exact global
    ranks; (5) ANSI ntile arithmetic on (rank, n) reproduces
    ntile(4)'s tie-splitting bit-for-bit.  The fact table is never
    globally sorted at any scale."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    n_buckets = 32
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = orders.agg(
        F.percentile_approx("o_totalprice", fracs, 10000).alias("cuts")
    )
    inf = float("inf")
    ranges = cuts.select(
        F.posexplode(
            F.arrays_zip(
                F.concat(F.array(F.lit(-inf)), F.col("cuts")).alias("lo"),
                F.concat(F.col("cuts"), F.array(F.lit(inf))).alias("hi"),
            )
        ).alias("bid", "r")
    ).select("bid", F.col("r.lo").alias("lo"), F.col("r.hi").alias("hi"))
    # materialize the 33-row cutpoint table once: every downstream
    # consumer would otherwise REPLAY the percentile pass over orders
    # (only Exchange nodes are AQE-reusable, not arbitrary subtrees)
    ranges = ranges.localCheckpoint()
    bucketed = orders.join(
        F.broadcast(ranges),
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
    ).select("o_totalprice", "o_orderkey", "bid")
    wb = W.partitionBy("bid").orderBy("o_totalprice", "o_orderkey")
    ranked = bucketed.select(
        "o_totalprice", "bid", F.row_number().over(wb).alias("rk")
    )
    sizes = (
        orders.join(
            F.broadcast(ranges),
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("bid")
        .agg(F.count("*").alias("cnt"))
    ).localCheckpoint()  # 32 rows; three consumers below (a, b, total)
    # cumulative offsets via a triangular broadcast self-join over the
    # 32-row sizes table (no WindowExec at all — a global-order window
    # here would be correct but spray "No Partition Defined" warnings)
    a, b = sizes.alias("a"), sizes.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b.bid") <= F.col("a.bid"))
        .groupBy(F.col("a.bid").alias("bid"), F.col("a.cnt").alias("cnt"))
        .agg(F.sum("b.cnt").alias("cum"))
        .select(
            "bid",
            (F.col("cum") - F.col("cnt")).alias("off"),
        )
        .crossJoin(F.broadcast(sizes.agg(F.sum("cnt").alias("n"))))
    )
    r = F.col("off") + F.col("rk")
    base = F.expr("n div 4")
    rem = F.col("n") % 4
    cut = (base + 1) * rem
    quartile = F.when(
        r <= cut, F.expr("(off + rk - 1) div ((n div 4) + 1)") + 1
    ).otherwise(rem + F.expr("(off + rk - ((n div 4) + 1) * (n % 4) - 1) div (n div 4)") + 1)
    return (
        ranked.join(F.broadcast(offsets), "bid")
        .select("o_totalprice", quartile.cast("int").alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "q_first_last",
    oracle="""
        SELECT user_id,
               min_by(event_type, ts_k) AS first_type,
               max_by(event_type, ts_k) AS last_type,
               count(*) AS cnt
        FROM (SELECT user_id, event_type,
                     CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS HUGEINT) * 4294967296
                       + event_id AS ts_k
              FROM events)
        GROUP BY user_id
    """,
    tags=("stats", "agg"),
)
def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event type per user via min_by/max_by over a
    composite (ts, event_id) key — the shuffle-light alternative to a
    window + row_number for endpoint extraction. Spark orders a native
    struct (µs, event_id) — no arithmetic packing, so no int64
    overflow regardless of the fixture's time span; the oracle packs
    the same pair into a HUGEINT (128-bit, overflow-free), which
    preserves the identical lexicographic order while event_id < 2^32."""
    events = load_table(spark, sf_dir, "events")
    ts_k = F.struct(F.unix_micros("ts").alias("us"), F.col("event_id")).alias("ts_k")
    return (
        events.select("user_id", "event_type", ts_k)
        .groupBy("user_id")
        .agg(
            F.min_by("event_type", "ts_k").alias("first_type"),
            F.max_by("event_type", "ts_k").alias("last_type"),
            F.count("*").alias("cnt"),
        )
    )


@query(
    "q_conditional",
    oracle="""
        SELECT event_id,
               coalesce(nullif(event_type, 'view'), 'hidden') AS vis_type,
               CASE WHEN value >= 75 THEN 'high' WHEN value >= 25 THEN 'mid'
                    ELSE 'low' END AS band,
               ifnull(TRY_CAST(json_extract_string(props, '$.missing') AS INTEGER), -1)
                 AS missing_default,
               greatest(value, 50.0) AS v_floor50,
               least(value, 50.0) AS v_cap50
        FROM events
    """,
    tags=("stats", "conditional"),
)
def q_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-expression family (§2.8): when/otherwise chains,
    coalesce, nullif, ifnull, greatest/least — the shape_element
    if/elif ladder as vectorized expressions."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("view")), F.lit("hidden")).alias(
            "vis_type"
        ),
        F.when(F.col("value") >= 75, "high")
        .when(F.col("value") >= 25, "mid")
        .otherwise("low")
        .alias("band"),
        F.ifnull(
            F.expr("try_cast(get_json_object(props, '$.missing') AS int)"), F.lit(-1)
        ).alias("missing_default"),
        F.greatest("value", F.lit(50.0)).alias("v_floor50"),
        F.least("value", F.lit(50.0)).alias("v_cap50"),
    )


@query(
    "q_profile",
    oracle="""
        SELECT 'event_type' AS col, count(*) AS n_rows,
               count(*) - count(event_type) AS n_null,
               count(DISTINCT event_type) AS n_distinct,
               min(CAST(event_type AS VARCHAR)) AS min_str,
               max(CAST(event_type AS VARCHAR)) AS max_str
        FROM events
        UNION ALL
        SELECT 'user_id', count(*), count(*) - count(user_id),
               count(DISTINCT user_id),
               CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
        FROM events
        UNION ALL
        SELECT 'value', count(*), count(*) - count(value),
               count(DISTINCT value),
               CAST(min(value) AS VARCHAR), CAST(max(value) AS VARCHAR)
        FROM events
    """,
    tags=("stats", "profile"),
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler — the reference's audit pass generalized: one
    row per column with null count, distinct count, and min/max
    (stringified so heterogenous column types share a schema). One
    scan per column here for oracle clarity; the production form
    computes all columns in a single pass with one agg of struct
    expressions."""
    events = load_table(spark, sf_dir, "events")

    def profile(col: str) -> DataFrame:
        c = F.col(col)
        return events.agg(
            F.lit(col).alias("col"),
            F.count("*").alias("n_rows"),
            (F.count("*") - F.count(c)).alias("n_null"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c.cast("string")).alias("min_str") if col == "event_type"
            else F.min(c).cast("string").alias("min_str"),
            F.max(c.cast("string")).alias("max_str") if col == "event_type"
            else F.max(c).cast("string").alias("max_str"),
        )

    out = profile("event_type")
    for col in ("user_id", "value"):
        out = out.unionByName(profile(col))
    return out


@query(
    "q_funnel",
    oracle="""
        WITH su AS (
            SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS signup_us
            FROM events WHERE event_type = 'signup' GROUP BY user_id),
        pu AS (
            SELECT e.user_id,
                   min(epoch_us(CAST(e.ts AS TIMESTAMP))) AS first_purchase_us
            FROM events e JOIN su ON e.user_id = su.user_id
            WHERE e.event_type = 'purchase'
              AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= su.signup_us
            GROUP BY e.user_id)
        SELECT su.user_id, su.signup_us, pu.first_purchase_us,
               pu.first_purchase_us IS NOT NULL AS converted
        FROM su LEFT JOIN pu ON su.user_id = pu.user_id
    """,
    tags=("stats", "funnel"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (batch twin of the stream-stream correlation in
    streaming/jobs.py): per user, first signup and first purchase at
    or after it — sequence-constrained conversion, all integer
    epoch-µs arithmetic. Two aggregates + one equi-join; no window
    sort needed."""
    events = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros("ts")
    su = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(ts_us).alias("signup_us"))
    )
    pu = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", ts_us.alias("p_us"))
        .join(su, "user_id")
        .filter(F.col("p_us") >= F.col("signup_us"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("first_purchase_us"))
    )
    return su.join(pu, "user_id", "left").select(
        "user_id",
        "signup_us",
        "first_purchase_us",
        F.col("first_purchase_us").isNotNull().alias("converted"),
    )


@query(
    "q_histogram",
    oracle="""
        SELECT CASE WHEN value < 0.0 THEN 0
                    WHEN value >= 100.0 THEN 11
                    ELSE CAST(floor(value / 10.0) AS INT) + 1 END AS bucket,
               count(*) AS n,
               round(min(value), 2) AS lo,
               round(max(value), 2) AS hi
        FROM events
        GROUP BY bucket
    """,
    tags=("stats", "agg"),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of events.value via width_bucket (10
    buckets over [0,100), out-of-range to 0/11 per SQL semantics) —
    the one-pass distribution profile; bucket assignment is a rowwise
    JVM expression, the agg is partial+final, so the histogram costs
    one scan at any scale."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            F.width_bucket("value", F.lit(0.0), F.lit(100.0), F.lit(10))
            .cast("int")
            .alias("bucket"),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


@query(
    "q_decimal_money",
    oracle="""
        SELECT o_orderstatus,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18, 2))), 2)
                    AS DOUBLE) AS total_money,
               CAST(round(avg(CAST(o_totalprice AS DECIMAL(18, 2))), 2)
                    AS DOUBLE) AS avg_money
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("stats", "agg", "decimal"),
)
def q_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money math in DECIMAL, not DOUBLE: order totals summed as
    DECIMAL(18,2) — exact, order-independent, and bit-identical across
    engines (float sums differ in the last ulp depending on reduction
    order; decimals cannot). The engine rule this query pins: cast
    monetary doubles to decimal AT THE SCAN and aggregate in decimal.
    The decimal stays *internal*: the emitted columns are the rounded
    aggregates cast to DOUBLE, because Decimal objects survive the
    drivers' canonicalizers differently (Spark→Decimal('…0.00') vs
    DuckDB's pandas bridge→float64) and break value hashing even when
    the cents agree — the representation lesson of rounds 2–3
    (array<bigint>, then DECIMAL).  Rounding happens AFTER the exact
    decimal aggregation, so cross-engine determinism is preserved."""
    orders = load_table(spark, sf_dir, "orders")
    money = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        orders.select("o_orderstatus", money.alias("m"))
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.sum("m"), 2).cast("double").alias("total_money"),
            F.round(F.avg("m"), 2).cast("double").alias("avg_money"),
        )
    )


@query(
    "q_sequence_gaps",
    oracle="""
        SELECT event_id AS gap_after, next_id,
               CAST(next_id - event_id - 1 AS BIGINT) AS n_missing
        FROM (
            SELECT event_id,
                   lead(event_id) OVER (ORDER BY event_id) AS next_id
            FROM events WHERE event_id % 7 <> 3)
        WHERE next_id - event_id > 1
    """,
    tags=("stats", "quality", "window"),
)
def q_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap detection — the completeness check for
    monotonically-keyed feeds (did the ingest drop ids?), in the
    block-partitioned form that scales: ids hash into fixed-width
    blocks (event_id div 1024), lead() runs *within* each block (one
    hash exchange, thousands of independent partitions at 100 TB —
    never a global sort), and block-boundary gaps come from a tiny
    per-block (min, max) aggregate with lead() over the block table
    (the only single-partition window, over n/1024 aggregated rows).
    Empty blocks are handled for free: the aggregate only emits
    non-empty blocks, so a block-summary lead() spans them.  The
    union of within-block and boundary gaps is exactly the global
    lead() result.  The fixture's event_id is dense, so the probe
    filters out id%7==3 to manufacture known gaps; production drops
    the filter."""
    from pyspark.sql import Window as W

    block = 1024
    ids = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 7 != 3)
        .select("event_id", F.expr(f"event_id div {block}").alias("blk"))
    )
    wb = W.partitionBy("blk").orderBy("event_id")
    within = ids.select(
        "event_id", F.lead("event_id").over(wb).alias("next_id")
    ).filter(F.col("next_id") - F.col("event_id") > 1)
    summ = ids.groupBy("blk").agg(
        F.min("event_id").alias("mn"), F.max("event_id").alias("mx")
    )
    # blk % 1 ≡ 0: an *explicitly declared* one-task window over the
    # n/1024-row block summary.  A bare lit(0) gets constant-folded
    # back to an empty partition spec (re-triggering Spark's
    # unintended-global-window warning); an attribute expression
    # survives the optimizer, so the plan records a deliberate
    # hashpartitioning((blk % 1)) exchange instead
    ws = W.partitionBy(F.col("blk") % F.lit(1)).orderBy("blk")
    boundary = summ.select(
        F.col("mx").alias("event_id"), F.lead("mn").over(ws).alias("next_id")
    ).filter(F.col("next_id") - F.col("event_id") > 1)
    return (
        within.select("event_id", "next_id")
        .unionAll(boundary)
        .select(
            F.col("event_id").alias("gap_after"),
            "next_id",
            (F.col("next_id") - F.col("event_id") - 1).alias("n_missing"),
        )
    )


@query(
    "q_table_checksum",
    oracle="""
        SELECT count(*) AS n_rows,
               CAST(sum(h % 1000000007) % 1000000007 AS BIGINT) AS modsum,
               bit_xor(h) AS xorsum
        FROM (
            SELECT TRY_CAST(concat('0x', substring(md5(
                       concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
                                 o_orderpriority,
                                 epoch_us(CAST(o_orderdate AS TIMESTAMP)))),
                       1, 14)) AS BIGINT) AS h
            FROM orders)
    """,
    tags=("stats", "quality", "agg"),
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum — THE migration-validation
    primitive for an engine swap: per-row md5 over a canonical
    column serialization, folded with commutative aggregates (modular
    sum + bit_xor), so any two engines that hold the same rows in any
    order and any partitioning produce the same triple. 56-bit row
    hashes (14 hex chars) keep the xor/mod math in int64; doubles are
    deliberately excluded from the serialization (float formatting is
    not engine-portable — SURVEY.md §5.2). One scan, partial+final
    agg, no shuffle of data rows at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    "o_orderkey",
                    "o_custkey",
                    "o_orderstatus",
                    "o_orderpriority",
                    F.unix_micros(F.col("o_orderdate").cast("timestamp")),
                )
            ),
            1,
            14,
        ),
        16,
        10,
    ).cast("bigint")
    # modsum is reduced mod p at the end too: the per-term residues are
    # < 1e9, and the running sum is carried in DECIMAL(38,0) (overflow-
    # free to ~1e29 rows) before the final % p brings it back to int64.
    # DuckDB promotes the sum to HUGEINT, so both engines agree exactly.
    return orders.select(h.alias("h")).agg(
        F.count("*").alias("n_rows"),
        (F.sum((F.col("h") % 1000000007).cast("decimal(38,0)")) % 1000000007)
        .cast("bigint")
        .alias("modsum"),
        F.expr("bit_xor(h)").alias("xorsum"),
    )


@query(
    "q_equidepth",
    oracle="""
        WITH q AS (
            SELECT event_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS qv
            FROM events),
        bounds AS (
            SELECT quantile_cont(qv, 0.25) AS q1,
                   quantile_cont(qv, 0.50) AS q2,
                   quantile_cont(qv, 0.75) AS q3
            FROM q)
        SELECT event_type,
               CASE WHEN qv <= q1 THEN 0
                    WHEN qv <= q2 THEN 1
                    WHEN qv <= q3 THEN 2 ELSE 3 END AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(qv) AS BIGINT) AS lo_x100,
               CAST(max(qv) AS BIGINT) AS hi_x100
        FROM q CROSS JOIN bounds
        GROUP BY event_type, 2
    """,
    tags=("stats", "histogram", "quantile"),
)
def q_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quartile) histogram: EXACT global quantile
    boundaries, then per-(type, bucket) occupancy — the profiling
    step behind range partitioning and skew detection. Values are
    quantized to x100 bigints first; quartile positions p*(n-1) for
    quarter fractions are exact in binary and interpolation between
    two sub-2^53 integers is exact in a double, so both engines
    compute bit-identical boundaries — the reason this can be an
    oracle-checked query at all (general float percentiles cannot).
    The 1-row boundary aggregate broadcasts (crossJoin of a scalar);
    the corpus-sized work is one map-side-partial groupBy."""
    events = load_table(spark, sf_dir, "events")
    q = events.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("qv")
    )
    bounds = q.agg(
        F.expr("percentile(qv, 0.25)").alias("q1"),
        F.expr("percentile(qv, 0.50)").alias("q2"),
        F.expr("percentile(qv, 0.75)").alias("q3"),
    )
    bucket = (
        F.when(F.col("qv") <= F.col("q1"), 0)
        .when(F.col("qv") <= F.col("q2"), 1)
        .when(F.col("qv") <= F.col("q3"), 2)
        .otherwise(3)
    )
    return (
        q.crossJoin(F.broadcast(bounds))
        .groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("qv").alias("lo_x100"),
            F.max("qv").alias("hi_x100"),
        )
    )


@query(
    "q_winsorize",
    oracle="""
        WITH cuts AS (
            SELECT event_type,
                   quantile_cont(value, 0.05) AS lo,
                   quantile_cont(value, 0.95) AS hi
            FROM events GROUP BY event_type)
        SELECT e.event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(e.value), 2) AS sum_raw,
               round(sum(CASE WHEN e.value < c.lo THEN c.lo
                              WHEN e.value > c.hi THEN c.hi
                              ELSE e.value END), 2) AS sum_winsorized,
               CAST(sum(CASE WHEN e.value < c.lo THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clipped_low,
               CAST(sum(CASE WHEN e.value > c.hi THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clipped_high
        FROM events e JOIN cuts c USING (event_type)
        GROUP BY e.event_type
    """,
    tags=("stats", "pipeline", "quality"),
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clipping): per-group p05/p95 cutpoints,
    values clamped into the band, before/after sums and clip counts —
    the numeric-feature robustness step a training pipeline applies
    before normalization.  Two passes over the fact: one exact-
    percentile aggregate (Spark `percentile` ≡ DuckDB quantile_cont,
    the q_percentiles equivalence) whose per-group output broadcasts
    back onto the scan, then one clamp + aggregate — the cutpoint
    table is O(groups) rows, so the fact never joins anything its
    own size."""
    events = load_table(spark, sf_dir, "events")
    cuts = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clipped = F.when(F.col("value") < F.col("lo"), F.col("lo")).when(
        F.col("value") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("value"))
    return (
        events.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_raw"),
            F.round(F.sum(clipped), 2).alias("sum_winsorized"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_high"),
        )
    )


@query(
    "q_zscore_outliers",
    oracle="""
        WITH cents AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS c
            FROM events),
        moments AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(c) AS BIGINT) AS sum_c,
                   CAST(sum(c * c) AS BIGINT) AS sumsq_c
            FROM cents GROUP BY event_type),
        stats AS (
            SELECT event_type, n, sum_c, sumsq_c,
                   (CAST(sum_c AS DOUBLE) / 100.0) / CAST(n AS DOUBLE) AS mu,
                   sqrt((CAST(sumsq_c AS DOUBLE) / 10000.0
                         - CAST(n AS DOUBLE)
                           * ((CAST(sum_c AS DOUBLE) / 100.0) / CAST(n AS DOUBLE))
                           * ((CAST(sum_c AS DOUBLE) / 100.0) / CAST(n AS DOUBLE)))
                        / CAST(n AS DOUBLE)) AS sigma
            FROM moments)
        SELECT c.event_type,
               s.n,
               round(s.mu, 4) AS mean_val,
               round(s.sigma, 4) AS std_val,
               CAST(sum(CASE WHEN CAST(c.c AS DOUBLE) / 100.0 - s.mu
                                  > 2.0 * s.sigma THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_high_outliers,
               CAST(sum(CASE WHEN CAST(c.c AS DOUBLE) / 100.0 - s.mu
                                  < -2.0 * s.sigma THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_low_outliers
        FROM cents c JOIN stats s USING (event_type)
        GROUP BY c.event_type, s.n, s.mu, s.sigma
    """,
    tags=("stats", "pipeline", "quality"),
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score normalization audit: per-group mean/std derived from
    EXACT integer moments (values are 2-dp fixture doubles, so cents
    sums and sums-of-squares are lossless bigints; mu/sigma then come
    from ONE double expression spelled identically in both engines —
    no Welford drift, no summation-order dependence), plus the |z|>2
    outlier counts a feature-normalization pass reports.  Two passes
    like q_winsorize: an O(groups) moment table broadcast back onto
    the scan."""
    events = load_table(spark, sf_dir, "events")
    cents = events.select(
        "event_type", F.expr("CAST(round(value * 100) AS BIGINT)").alias("c")
    )
    moments = cents.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sum_c"),
        F.sum(F.expr("c * c")).cast("bigint").alias("sumsq_c"),
    )
    mu = "(CAST(sum_c AS DOUBLE) / 100.0) / CAST(n AS DOUBLE)"
    sigma = (
        f"sqrt((CAST(sumsq_c AS DOUBLE) / 10000.0 - CAST(n AS DOUBLE) * ({mu}) * ({mu}))"
        " / CAST(n AS DOUBLE))"
    )
    stats = moments.selectExpr(
        "event_type", "n", f"{mu} AS mu", f"{sigma} AS sigma"
    )
    return (
        cents.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "n", "mu", "sigma")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN CAST(c AS DOUBLE) / 100.0 - mu > 2.0 * sigma THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_high_outliers"),
            F.sum(
                F.expr(
                    "CASE WHEN CAST(c AS DOUBLE) / 100.0 - mu < -2.0 * sigma THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_low_outliers"),
        )
        .select(
            "event_type",
            "n",
            F.round("mu", 4).alias("mean_val"),
            F.round("sigma", 4).alias("std_val"),
            "n_high_outliers",
            "n_low_outliers",
        )
    )


@query(
    "q_impute",
    oracle="""
        WITH holed AS (
            SELECT event_type,
                   CASE WHEN event_id % 97 = 0 THEN NULL ELSE value END AS v
            FROM events),
        means AS (
            SELECT event_type, avg(v) AS mean_v
            FROM holed WHERE v IS NOT NULL GROUP BY event_type)
        SELECT h.event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN h.v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_imputed,
               round(sum(coalesce(h.v, m.mean_v)), 2) AS sum_imputed
        FROM holed h JOIN means m USING (event_type)
        GROUP BY h.event_type
    """,
    tags=("stats", "pipeline", "cleaning"),
)
def q_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-mean imputation: nulls (synthesized deterministically —
    every 97th event id, since the fixtures ship complete) fill with
    their group's non-null mean.  The mean table is O(groups) and
    broadcasts back onto the scan — the imputation itself is a
    rowwise coalesce, so the op costs one aggregate plus one pass no
    matter the scale.  Imputed sums round at 2dp on both engines;
    the group means divide identical integer-sum/count pairs, so the
    coalesced doubles match bit-for-bit."""
    events = load_table(spark, sf_dir, "events")
    holed = events.selectExpr(
        "event_type",
        "CASE WHEN event_id % 97 = 0 THEN NULL ELSE value END AS v",
    )
    means = holed.filter("v IS NOT NULL").groupBy("event_type").agg(
        F.avg("v").alias("mean_v")
    )
    return (
        holed.join(F.broadcast(means), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_imputed"),
            F.round(F.sum(F.coalesce("v", "mean_v")), 2).alias("sum_imputed"),
        )
    )


@query(
    "q_mad",
    oracle="""
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS m
            FROM events GROUP BY event_type)
        SELECT e.event_type,
               round(m.m, 4) AS median_val,
               round(quantile_cont(abs(e.value - m.m), 0.5), 4) AS mad
        FROM events e JOIN med m USING (event_type)
        GROUP BY e.event_type, m.m
    """,
    tags=("stats", "robust"),
)
def q_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust scale metric
    that pairs with q_winsorize/q_zscore_outliers (a heavy-tailed
    feature breaks sigma; MAD does not).  Two exact-percentile
    passes (the q_percentiles Spark-percentile ≡ quantile_cont
    equivalence), the O(groups) median table broadcast between them
    — same two-pass posture as winsorize."""
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    return (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "m")
        .agg(
            F.expr("round(percentile(abs(value - m), 0.5), 4)").alias("mad")
        )
        .select(
            "event_type", F.round("m", 4).alias("median_val"), "mad"
        )
    )


# first-significant-digit expectation, basis points:
# floor(10000 * log10(1 + 1/d)) — precomputed so neither engine
# evaluates log10 at query time (float libm differences)
_BENFORD_BP = {1: 3010, 2: 1760, 3: 1249, 4: 969, 5: 791,
               6: 669, 7: 579, 8: 511, 9: 457}
_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {bp}" for d, bp in _BENFORD_BP.items())
    + " END"
)


@query(
    "q_benford",
    oracle=f"""
        WITH c AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS cents
            FROM events),
        d AS (
            SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1)
                        AS INTEGER) AS digit
            FROM c WHERE cents > 0),
        t AS (SELECT count(*) AS tot FROM d)
        SELECT CAST(digit AS INT) AS digit,
               CAST(count(*) AS BIGINT) AS n_vals,
               CAST(10000 * count(*) // tot AS BIGINT) AS share_bp,
               CAST({_BENFORD_CASE} AS BIGINT) AS benford_bp,
               CAST(abs(10000 * count(*) // tot
                        - ({_BENFORD_CASE})) AS BIGINT) AS dev_bp
        FROM d, t
        GROUP BY digit, tot
        ORDER BY digit
    """,
    tags=("stats", "quality", "events", "extension"),
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit (X133) — the classic anomaly screen
    for a numeric measure column: the distribution of first
    significant digits of event values against Benford's law
    expectation, per digit, with the deviation in basis points.
    Synthetic, truncated, or unit-mixed value columns drift from the
    log-uniform staircase; a large dev_bp on a production feed is a
    cheap tripwire before the values reach training.

    Determinism: the digit comes from the DECIMAL STRING of the
    integer cents (round(value·100) — both engines print BIGINTs
    identically), never from float log10; the Benford expectations
    are precomputed integer literals; shares are integer basis
    points.  Engine side: ONE scan (never a second pass for the
    total — the grand total is a window over the ALREADY-GROUPED
    ≤ 9-row relation, bounded by construction, not by data), the
    cents/digit expressions inside the scan's codegen span, a 9-key
    groupBy with map-side partials — shuffle traffic is 9 rows at
    any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(
            F.round(F.col("value") * 100).cast("bigint").alias("cents")
        )
        .filter("cents > 0")
        .select(
            F.expr(
                "CAST(substring(CAST(cents AS STRING), 1, 1) AS INT)"
            ).alias("digit")
        )
    )
    return (
        d.groupBy("digit")
        .agg(F.count("*").alias("n_vals"))
        .withColumn("tot", F.sum("n_vals").over(W.partitionBy()))
        .select(
            F.col("digit").cast("int").alias("digit"),
            "n_vals",
            F.expr("CAST(10000 * n_vals div tot AS BIGINT)").alias(
                "share_bp"
            ),
            F.expr(f"CAST({_BENFORD_CASE} AS BIGINT)").alias("benford_bp"),
            F.expr(
                f"CAST(abs(10000 * n_vals div tot - ({_BENFORD_CASE}))"
                " AS BIGINT)"
            ).alias("dev_bp"),
        )
        .orderBy("digit")
    )


@query(
    "q_gini",
    oracle="""
        WITH per_user AS (
            SELECT user_id, count(*) AS cnt
            FROM events WHERE user_id IS NOT NULL
            GROUP BY user_id),
        by_v AS (
            SELECT cnt AS v, count(*) AS m FROM per_user GROUP BY cnt),
        pf AS (
            SELECT v, m,
                   coalesce(sum(m) OVER (
                       ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS r
            FROM by_v),
        tot AS (
            SELECT sum(m) AS n, sum(v * m) AS t,
                   sum(v * (m * r + m * (m + 1) // 2)) AS s
            FROM pf)
        SELECT CAST(n AS BIGINT) AS n_users,
               CAST(t AS BIGINT) AS n_events,
               CAST((10000 * (2 * s - (n + 1) * t)) // (n * t)
                    AS BIGINT) AS gini_bp
        FROM tot WHERE n IS NOT NULL AND n * t > 0
    """,
    tags=("stats", "quality", "events", "extension", "prefix-sum"),
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of per-user contribution volume (X134) —
    the inequality audit for any keyed activity column: gini_bp = 0
    means uniform contribution, 10000 means one user owns the
    corpus.  A rising Gini on an ingest feed flags bot floods or a
    collapsed source mix the same way q_domain_mix's shares do, in
    one number.  Exact integers end to end: with users ranked by
    (count, user_id), ranks within one count value are CONSECUTIVE,
    so Σ rank·x folds per DISTINCT count value — v·(m·r + m(m+1)/2)
    with r = users below the value — and Gini's classic form
    (2S − (n+1)T) / (nT) scales to basis points with truncating
    division (terms bounded by n·T < 2^63 — beyond that the cast
    widens to DECIMAL(38,0), same plan).

    Engine side: events collapse to the per-user aggregate, then to
    the per-DISTINCT-COUNT relation (≤ √(2T) rows by the partition
    bound — ~1.4M at a trillion events), whose prefix is the
    range-bucketed two-pass rank: `length(bin(v))` (integer
    floor(log2)+1 — monotone in v, so bucket order refines value
    order) splits the values into ≤ 64 ORDERED buckets, per-bucket
    running sums window on hashpartitioning(bkt), offsets come from
    the ≤ 64-row bucket-total collect prefix-summed driver-side.
    NO single-partition exchange at any width; the oracle replays
    the prefix with one plain window over the grouped relation."""
    ev = load_table(spark, sf_dir, "events")
    by_v = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .groupBy(F.col("cnt").alias("v"))
        .agg(F.count("*").alias("m"))
        .withColumn("bkt", F.expr("length(bin(v))").cast("int"))
    )
    ddl = "n_users BIGINT, n_events BIGINT, gini_bp BIGINT"
    btot = {
        int(r["bkt"]): int(r["s"])
        for r in by_v.groupBy("bkt").agg(F.sum("m").alias("s")).collect()
    }
    if not btot:
        return spark.createDataFrame([], ddl)
    offs, acc = {}, 0
    for b in sorted(btot):
        offs[b] = acc
        acc += btot[b]
    off_expr = (
        "CASE bkt "
        + " ".join(f"WHEN {b} THEN {offs[b]}L" for b in sorted(offs))
        + " ELSE 0L END"
    )
    w = (
        W.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        by_v.withColumn(
            "r",
            F.expr(off_expr)
            + F.coalesce(F.sum("m").over(w), F.lit(0)),
        )
        .agg(
            F.sum("m").alias("n"),
            F.expr("sum(v * m)").alias("t"),
            F.expr("sum(v * (m * r + m * (m + 1) div 2))").alias("s"),
        )
        .filter("n IS NOT NULL AND n * t > 0")
        .select(
            F.col("n").cast("bigint").alias("n_users"),
            F.col("t").cast("bigint").alias("n_events"),
            F.expr(
                "CAST((10000 * (2 * s - (n + 1) * t)) div (n * t)"
                " AS BIGINT)"
            ).alias("gini_bp"),
        )
    )


@query(
    "q_gini_by_source",
    oracle="""
        WITH per_doc AS (
            SELECT source, length(text) AS x
            FROM documents
            WHERE text IS NOT NULL AND source IS NOT NULL),
        by_v AS (
            SELECT source, x AS v, count(*) AS m
            FROM per_doc GROUP BY source, x),
        pf AS (
            SELECT source, v, m,
                   coalesce(sum(m) OVER (
                       PARTITION BY source ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS r
            FROM by_v),
        tot AS (
            SELECT source, sum(m) AS n, sum(v * m) AS t,
                   sum(v * (m * r + m * (m + 1) // 2)) AS s
            FROM pf GROUP BY source)
        SELECT source,
               CAST(n AS BIGINT) AS n_docs,
               CAST(t AS BIGINT) AS n_chars,
               CAST((10000 * (2 * s - (n + 1) * t)) // (n * t)
                    AS BIGINT) AS gini_bp
        FROM tot WHERE n * t > 0
        ORDER BY source
    """,
    tags=("stats", "quality", "pipeline", "extension", "prefix-sum"),
)
def q_gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gini of document volume (X137) — q_gini's grouped
    form over the corpus: how unequally is each source's character
    volume spread over its documents?  A source whose volume
    concentrates in a handful of giant documents behaves differently
    under dedup, chunking, and token budgets than one with the same
    byte count spread evenly — this is the per-source audit column
    q_datasheet's volume numbers don't show.

    Same per-DISTINCT-value fold as q_gini (ranks within one length
    value are consecutive), but here the prefix never needs a driver
    fold at all: document lengths are VALUE-BOUNDED by the maximum
    document size, so the per-(source, length) relation is compact
    by construction and the strictly-below prefix is one window
    hashpartitioned on source — grouped Gini in two aggregates and
    a window, no corpus-order anything, |sources| rows out."""
    docs = load_table(spark, sf_dir, "documents")
    by_v = (
        docs.filter(
            F.col("text").isNotNull() & F.col("source").isNotNull()
        )
        .select("source", F.length("text").cast("bigint").alias("v"))
        .groupBy("source", "v")
        .agg(F.count("*").alias("m"))
    )
    w = (
        W.partitionBy("source")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        by_v.withColumn(
            "r", F.coalesce(F.sum("m").over(w), F.lit(0))
        )
        .groupBy("source")
        .agg(
            F.sum("m").alias("n"),
            F.expr("sum(v * m)").alias("t"),
            F.expr("sum(v * (m * r + m * (m + 1) div 2))").alias("s"),
        )
        .filter("n * t > 0")
        .select(
            "source",
            F.col("n").cast("bigint").alias("n_docs"),
            F.col("t").cast("bigint").alias("n_chars"),
            F.expr(
                "CAST((10000 * (2 * s - (n + 1) * t)) div (n * t)"
                " AS BIGINT)"
            ).alias("gini_bp"),
        )
        .orderBy("source")
    )


@query(
    "q_ks_drift",
    oracle="""
        WITH c AS (
            SELECT event_id % 2 AS wave,
                   CAST(round(value * 100) AS BIGINT) AS v
            FROM events WHERE value IS NOT NULL),
        by_v AS (
            SELECT v,
                   sum(CASE WHEN wave = 0 THEN 1 ELSE 0 END) AS a,
                   sum(CASE WHEN wave = 1 THEN 1 ELSE 0 END) AS b
            FROM c GROUP BY v),
        cum AS (
            SELECT v,
                   sum(a) OVER (ORDER BY v) AS ca,
                   sum(b) OVER (ORDER BY v) AS cb
            FROM by_v),
        tot AS (SELECT sum(a) AS na, sum(b) AS nb FROM by_v)
        SELECT CAST(na AS BIGINT) AS n_a,
               CAST(nb AS BIGINT) AS n_b,
               CAST(10000 * max(abs(ca * nb - cb * na)) // (na * nb)
                    AS BIGINT) AS ks_x10k
        FROM cum, tot
        GROUP BY na, nb
        HAVING na > 0 AND nb > 0
    """,
    tags=("stats", "quality", "events", "extension", "prefix-sum"),
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift (X138) — the numeric-
    distribution monitor completing the drift family (X40 quality
    scores, X132 embedding dims): did the VALUE DISTRIBUTION of the
    measure column shift between two ingest waves (event_id parity —
    the ingest-batch column at deployment)?  KS = max CDF gap, exact
    in integers: values quantize to cents, the gap is
    |cumA·nB − cumB·nA| (cross-multiplied so no ratios exist until
    the final basis-point division) — no libm, no float CDFs,
    hash-identical cross-engine.

    Engine side: one events scan collapses to the per-DISTINCT-cent
    relation (VALUE-BOUNDED: |distinct cents| ≤ the measure's
    quantized range, independent of event count), the inclusive CDF
    prefix is the range-bucketed two-pass rank (per-bucket running
    sums hashpartitioned on the integer log2 bucket, offsets from
    the ≤64-row bucket-total collect — the q_gini machinery), and
    the KS max is one scalar aggregate.  The oracle replays the
    prefix with one plain window over the grouped relation."""
    ev = load_table(spark, sf_dir, "events")
    by_v = (
        ev.filter(F.col("value").isNotNull())
        .select(
            (F.col("event_id") % 2).alias("wave"),
            F.round(F.col("value") * 100).cast("bigint").alias("v"),
        )
        .groupBy("v")
        .agg(
            F.expr("sum(CASE WHEN wave = 0 THEN 1 ELSE 0 END)").alias("a"),
            F.expr("sum(CASE WHEN wave = 1 THEN 1 ELSE 0 END)").alias("b"),
        )
        .withColumn("bkt", F.expr("length(bin(v))").cast("int"))
    )
    ddl = "n_a BIGINT, n_b BIGINT, ks_x10k BIGINT"
    btot = {
        int(r["bkt"]): (int(r["sa"]), int(r["sb"]))
        for r in by_v.groupBy("bkt")
        .agg(F.sum("a").alias("sa"), F.sum("b").alias("sb"))
        .collect()
    }
    n_a = sum(sa for sa, _ in btot.values())
    n_b = sum(sb for _, sb in btot.values())
    if n_a == 0 or n_b == 0:
        return spark.createDataFrame([], ddl)
    offs, acc_a, acc_b = {}, 0, 0
    for bkt in sorted(btot):
        offs[bkt] = (acc_a, acc_b)
        acc_a += btot[bkt][0]
        acc_b += btot[bkt][1]
    off_a = (
        "CASE bkt "
        + " ".join(f"WHEN {bkt} THEN {offs[bkt][0]}L" for bkt in sorted(offs))
        + " ELSE 0L END"
    )
    off_b = (
        "CASE bkt "
        + " ".join(f"WHEN {bkt} THEN {offs[bkt][1]}L" for bkt in sorted(offs))
        + " ELSE 0L END"
    )
    w = (
        W.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        by_v.withColumn("ca", F.expr(off_a) + F.sum("a").over(w))
        .withColumn("cb", F.expr(off_b) + F.sum("b").over(w))
        .agg(
            F.expr(f"max(abs(ca * {n_b}L - cb * {n_a}L))").alias("gap")
        )
        .select(
            F.lit(n_a).cast("bigint").alias("n_a"),
            F.lit(n_b).cast("bigint").alias("n_b"),
            F.expr(
                f"CAST(10000 * gap div ({n_a}L * {n_b}L) AS BIGINT)"
            ).alias("ks_x10k"),
        )
    )
