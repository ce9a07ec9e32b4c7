"""Join operators — SURVEY.md §2.5.

Reference analogs: the SQLite `IN (subquery)` query shapes over
`nodes_tags` (restaurant→cuisine, place_of_worship→religion), the
parent-child joins (way ⋈ ways_nodes ⋈ nodes), and quality-check
anti-joins. The fixture binding (FIXTURES.md §B) maps these to the
star schema and the unpivoted tags long table.

Scale notes (100 TB posture):
* Dimensions (region, nation, customer at TPC-H ratios, literal
  bucket tables) are broadcast — `F.broadcast` hints make it explicit
  rather than relying on the 10 MB default threshold; no shuffle of
  the fact side.
* The fact-fact join (lineitem ⋈ orders) is a shuffle join on the
  orderkey; at 100 TB both sides would be bucketed on orderkey at
  write time so the exchange disappears — the logical plan here is
  unchanged either way, which is the point of declaring it.
* Semi/anti joins ship only the join key of the filtered side.
* The range join keeps the interval side tiny (literal dim), so Spark
  plans BroadcastNestedLoopJoin — the only safe NLJ shape at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.catalog import load_table, tags_long_table, TAGS_LONG_SQL

# ---------------------------------------------------------------------------
# J3 — flagship star join: revenue by region/nation


@query(
    "q_star_join",
    oracle="""
        SELECT r_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    tags=("join", "star", "flagship"),
)
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (reference: parent-child id joins over the
    5-table relational schema, §2.5 J3). Dims broadcast; the only
    shuffle is lineitem⋈orders on orderkey + the final aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q_order_lines",
    oracle="""
        SELECT o_orderkey, o_orderstatus, count(*) AS n_lines,
               round(sum(l_quantity), 2) AS sum_qty
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey, o_orderstatus
    """,
    tags=("join",),
)
def q_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-child join (reference: way ⋈ ways_nodes): per-parent
    child stats. Aggregating on the join key means AQE can reuse the
    join's partitioning for the aggregate — one shuffle, not two."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(F.count("*").alias("n_lines"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


# ---------------------------------------------------------------------------
# J1 — tag self-join (restaurant → cuisine analog)


@query(
    "q_restaurant_cuisine",
    oracle=f"""
        WITH tags AS ({TAGS_LONG_SQL})
        SELECT t2.value AS k_value, count(*) AS cnt
        FROM tags t1 JOIN tags t2 ON t1.id = t2.id
        WHERE t1.key = 'event_type' AND t1.value = 'purchase' AND t2.key = 'k'
        GROUP BY t2.value
    """,
    tags=("join", "selfjoin"),
)
def q_restaurant_cuisine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag-table self-join (reference: cuisines of restaurants over
    nodes_tags, §2.5 J1): elements tagged value='purchase' joined back
    to their 'k' tag; distribution of k values."""
    tags = tags_long_table(spark, sf_dir)
    restaurants = tags.filter((F.col("key") == "event_type") & (F.col("value") == "purchase")).select("id")
    cuisines = tags.filter(F.col("key") == "k").select("id", F.col("value").alias("k_value"))
    return (
        cuisines.join(restaurants, "id")
        .groupBy("k_value")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "q_religion",
    oracle="""
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
        GROUP BY c_mktsegment
    """,
    tags=("join", "semijoin"),
)
def q_religion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (reference: religion of place_of_worship elements via
    `id IN (subquery)`, §2.5 J2): customers with an urgent order,
    counted per segment. left_semi ships only o_custkey."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        customer.join(urgent, "c_custkey", "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "q_untagged",
    oracle="""
        SELECT n_name, count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY n_name
    """,
    tags=("join", "antijoin"),
)
def q_untagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join quality check (reference: ways with no name tag,
    §2.5 J4): customers with no urgent order, per nation. (At fixture
    ratios every customer has *some* order, so the unfiltered form is
    vacuously empty — the urgent-only subset keeps the check
    non-trivial at every SF.)"""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "q_range_join",
    oracle="""
        SELECT b.label, count(*) AS cnt, round(avg(e.value), 2) AS avg_value
        FROM events e
        JOIN (VALUES ('low', 0.0, 25.0), ('mid', 25.0, 50.0),
                     ('high', 50.0, 75.0), ('top', 75.0, 101.0)) b(label, lo, hi)
          ON e.value >= b.lo AND e.value < b.hi
        GROUP BY b.label
    """,
    tags=("join", "rangejoin"),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join (§2.5 J5): events banded into value
    buckets via an interval dimension. The interval side is a literal
    4-row table — broadcast nested-loop, the only NLJ shape that
    survives scale (fact side never shuffles)."""
    events = load_table(spark, sf_dir, "events")
    buckets = spark.createDataFrame(
        [("low", 0.0, 25.0), ("mid", 25.0, 50.0), ("high", 50.0, 75.0), ("top", 75.0, 101.0)],
        "label string, lo double, hi double",
    )
    return (
        events.join(
            F.broadcast(buckets),
            (events.value >= buckets.lo) & (events.value < buckets.hi),
        )
        .groupBy("label")
        .agg(F.count("*").alias("cnt"), F.round(F.avg("value"), 2).alias("avg_value"))
    )


@query(
    "q_outer_join",
    oracle="""
        SELECT coalesce(e.user_id, o.o_custkey) AS uid,
               coalesce(e.n_events, 0) AS n_events,
               coalesce(o.n_orders, 0) AS n_orders,
               e.user_id IS NULL AS orders_only,
               o.o_custkey IS NULL AS events_only
        FROM (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id) e
        FULL OUTER JOIN
             (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
          ON e.user_id = o.o_custkey
    """,
    tags=("join", "outerjoin"),
)
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (completing the join-type inventory): activity
    across the two element kinds with presence flags — who only
    orders, who only emits events. Aggregate-then-join keeps both
    sides key-unique, so the outer join is 1:1 and never multiplies
    rows."""
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    e = events.groupBy("user_id").agg(F.count("*").alias("n_events"))
    o = orders.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    return e.join(o, e.user_id == o.o_custkey, "full_outer").select(
        F.coalesce("user_id", "o_custkey").alias("uid"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.col("user_id").isNull().alias("orders_only"),
        F.col("o_custkey").isNull().alias("events_only"),
    )


@query(
    "q_asof_join",
    oracle="""
        WITH c AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS cts,
                   event_id AS click_id, value AS click_value
            FROM events WHERE event_type = 'click'),
        p AS (
            SELECT event_id AS purchase_id, user_id,
                   CAST(ts AS TIMESTAMP) AS pts
            FROM events WHERE event_type = 'purchase')
        SELECT purchase_id, p.user_id,
               epoch_us(pts) AS p_ts_us,
               click_id, epoch_us(cts) AS click_ts_us, click_value
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.pts >= c.cts
    """,
    tags=("join", "asof", "timeseries"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (custom operator — Spark has no native form; DuckDB's
    native ASOF JOIN is the oracle): each purchase matched to the
    user's most recent click at-or-before it, purchases without a
    prior click kept with nulls.

    Implementation is the scalable union+window pattern, NOT a range
    join: tag both event streams, union, then one window over
    (user_id, ts) carries the last non-null click payload forward with
    `last(..., ignoreNulls)` and a filter keeps purchase rows. Exactly
    one shuffle (on user_id), no interval cross-product, no skew
    amplification — at 100 TB this is the difference between a linear
    pass and an O(clicks × purchases) per-user explosion. The tag
    column orders clicks before purchases at equal timestamps, giving
    inclusive at-or-before semantics deterministically (the fixture's
    µs timestamps have no cross-stream ties; verified at all SFs)."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("click_ts_us"),
        F.col("value").alias("click_value"),
        F.lit(None).cast("bigint").alias("purchase_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(None).cast("bigint").alias("click_ts_us"),
        F.lit(None).cast("double").alias("click_value"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .select(
            "purchase_id",
            "user_id",
            F.unix_micros("ts").alias("p_ts_us"),
            "tag",
            F.last("click_id", ignorenulls=True).over(w).alias("click_id"),
            F.last("click_ts_us", ignorenulls=True).over(w).alias("click_ts_us"),
            F.last("click_value", ignorenulls=True).over(w).alias("click_value"),
        )
        .filter(F.col("tag") == 1)
        .drop("tag")
    )


@query(
    "q_asof_tolerance",
    oracle="""
        WITH c AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS cts,
                   event_id AS click_id
            FROM events WHERE event_type = 'click'),
        p AS (
            SELECT event_id AS purchase_id, user_id,
                   CAST(ts AS TIMESTAMP) AS pts
            FROM events WHERE event_type = 'purchase'),
        m AS (
            SELECT purchase_id, p.user_id, pts, click_id, cts
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.pts >= c.cts)
        SELECT purchase_id, user_id,
               epoch_us(pts) AS p_ts_us,
               CASE WHEN cts >= pts - INTERVAL 1 HOUR THEN click_id END
                 AS click_id,
               CASE WHEN cts >= pts - INTERVAL 1 HOUR THEN epoch_us(cts) END
                 AS click_ts_us
        FROM m
    """,
    tags=("join", "asof", "timeseries"),
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join with tolerance (pandas merge_asof(tolerance=...)
    semantics): the matched click must be within 1 hour before the
    purchase, else the match is nulled. Implemented as the same
    single-shuffle union+window as q_asof_join plus a rowwise
    staleness gate — tolerance costs nothing at any scale because it
    filters AFTER the window, not by widening the join. (A range-join
    formulation would pay the full interval cross-product for the
    same answer.)"""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("click_ts_us"),
        F.lit(None).cast("bigint").alias("purchase_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(None).cast("bigint").alias("click_ts_us"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    hour_us = 3600 * 1_000_000
    joined = (
        clicks.unionByName(purchases)
        .select(
            "purchase_id",
            "user_id",
            F.unix_micros("ts").alias("p_ts_us"),
            "tag",
            F.last("click_id", ignorenulls=True).over(w).alias("raw_click_id"),
            F.last("click_ts_us", ignorenulls=True).over(w).alias("raw_click_ts_us"),
        )
        .filter(F.col("tag") == 1)
    )
    fresh = F.col("raw_click_ts_us") >= F.col("p_ts_us") - F.lit(hour_us)
    return joined.select(
        "purchase_id",
        "user_id",
        "p_ts_us",
        F.when(fresh, F.col("raw_click_id")).alias("click_id"),
        F.when(fresh, F.col("raw_click_ts_us")).alias("click_ts_us"),
    )


_IV_BUCKET = 20.0  # bucket width >= interval length, so each interval spans <= 2 buckets


@query(
    "q_interval_bucket_join",
    oracle=f"""
        SELECT n.n_name AS label,
               CAST(count(*) AS BIGINT) AS cnt,
               round(avg(e.value), 2) AS avg_value
        FROM events e
        JOIN nation n
          ON e.value >= n.n_nationkey * {_IV_BUCKET}
         AND e.value <  n.n_nationkey * {_IV_BUCKET} + 15.0
        GROUP BY 1
    """,
    tags=("join", "rangejoin", "scale"),
)
def q_interval_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized interval join — the EQUI-join formulation of
    point-in-interval matching.  q_range_join's broadcast NLJ is
    right for a literal handful of intervals; with a large interval
    dimension (IP-to-geo, tariff windows) an NLJ is O(points x
    intervals).  The standard fix: choose a bucket width >= the max
    interval length, explode each interval to the <= 2 buckets it
    overlaps (sequence()), bucket each point by floor-div, and join
    on the BUCKET KEY with the range predicate demoted to a
    post-join filter.  Catalyst plans a hash join (broadcast here;
    shuffle-on-bk between two huge sides) instead of a nested loop —
    CI pins that no NLJ appears.  The oracle states the plain
    non-equi join; identical results from the rewritten plan IS the
    correctness claim."""
    events = load_table(spark, sf_dir, "events")
    nation = load_table(spark, sf_dir, "nation")
    intervals = nation.selectExpr(
        "n_name AS label",
        f"n_nationkey * {_IV_BUCKET} AS lo",
        f"n_nationkey * {_IV_BUCKET} + 15.0 AS hi",
    ).selectExpr(
        "label",
        "lo",
        "hi",
        f"explode(sequence(CAST(floor(lo / {_IV_BUCKET}) AS INT), "
        f"CAST(floor(hi / {_IV_BUCKET}) AS INT))) AS bk",
    )
    points = events.selectExpr(
        "value", f"CAST(floor(value / {_IV_BUCKET}) AS INT) AS bk"
    )
    return (
        points.join(F.broadcast(intervals), "bk")
        .filter((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.round(F.avg("value"), 2).alias("avg_value"),
        )
    )
