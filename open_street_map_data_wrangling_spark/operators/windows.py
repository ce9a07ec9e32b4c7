"""Window-function operators — SURVEY.md §2.6.

Reference analogs: `ways_nodes.position` (the ordinal the parse loop
assigns with enumerate) and the implicit ranking in "top contributors"
reporting; analytic frames (lag/lead/moving aggregates) extend the
surface over the driver's `events` stream table.

Scale notes: a window over `partitionBy(k).orderBy(o)` is one shuffle
on k plus a per-partition sort — same cost shape as a groupBy, and
skew in k is the thing to watch (AQE skew handling does not apply to
window exchanges, so a hot user_id would need salting + two-phase
reassembly; fixture keys are uniform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.catalog import load_table


@query(
    "q_ordinal",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS INTEGER) AS pos
        FROM lineitem
    """,
    tags=("window",),
)
def q_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal reconstruction (reference: ways_nodes.position assigned
    by enumerate during parse, §2.6 W1)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select("l_orderkey", "l_linenumber", F.row_number().over(w).alias("pos"))


@query(
    "q_rank_users",
    oracle="""
        SELECT user_id, cnt, CAST(dense_rank() OVER (ORDER BY cnt DESC) AS INTEGER) AS rnk
        FROM (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
        QUALIFY rnk <= 5
    """,
    tags=("window", "rank"),
)
def q_rank_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contributor ranking (§2.6 W2): dense_rank over contribution
    counts, top 5 ranks (ties all kept — rank filter is deterministic
    where LIMIT would not be)."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count("*").alias("cnt"))
    w = W.orderBy(F.desc("cnt"))
    return counts.withColumn("rnk", F.dense_rank().over(w)).filter(F.col("rnk") <= 5)


@query(
    "q_moving_avg",
    oracle="""
        SELECT event_id, user_id,
               round(avg(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mavg
        FROM events
    """,
    tags=("window", "frame"),
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over the last 4 events per user (§2.6 W3).
    event_id tiebreak keeps the frame deterministic across engines.
    Rounded to 4 decimals: values are 2-decimal, so ≤4-row averages
    are multiples of 0.0025 — rounding at 2 decimals would sit exactly
    on the half boundary and tip differently per engine."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return events.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 4).alias("mavg")
    )


@query(
    "q_lag_lead",
    oracle="""
        SELECT event_id, user_id,
               epoch_us(CAST(ts AS TIMESTAMP))
                 - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us,
               lead(event_type) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "frame"),
)
def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics (§2.6 W3): inter-event gap per user and the
    next event's type."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return events.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "q_running_total",
    oracle="""
        SELECT event_id, user_id,
               round(sum(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        FROM events
    """,
    tags=("window", "frame"),
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) total per user — the classic prefix
    aggregation frame."""
    events = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return events.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("running")
    )


@query(
    "q_percent_rank",
    oracle="""
        SELECT o_orderkey,
               percent_rank() OVER w AS prank,
               cume_dist() OVER w AS cdist
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window", "rank"),
)
def q_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist (§2.6 W2 family): relative standing of
    each order's price within its status group. Both are exact
    rationals of row positions — a single division, bit-identical
    across engines (no rounding needed); the o_orderkey tiebreak makes
    positions deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "q_latest_per_key",
    oracle="""
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
        FROM (
            SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                   value,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
                   ) AS rn
            FROM events)
        WHERE rn = 1
    """,
    tags=("window", "dedup", "pipeline"),
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key — the upsert/compaction primitive every
    CDC and feature-store pipeline runs: each user's most recent event,
    event_id as the deterministic tiebreaker. row_number keeps the
    whole row without a self-join.

    Scale note: row_number needs a per-key sort after the shuffle. When
    only specific columns are needed, `max_by(col, struct(ts, id))`
    (or a struct-max) replaces sort with a partial+final aggregate —
    map-side combining shrinks the shuffle to one row per (task, key).
    The sort form is kept here because it preserves arbitrary width
    and is the shape Spark's own dropDuplicates-by-ordering lowers to."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
            "value",
        )
    )


@query(
    "q_range_frame",
    oracle="""
        SELECT user_id, event_id,
               ts_us,
               CAST(count(*) OVER w AS BIGINT) AS n_30m,
               round(sum(value) OVER w, 2) AS sum_30m
        FROM (
            SELECT user_id, event_id, value,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
            FROM events WHERE event_type = 'error')
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts_us
            RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "timeseries"),
)
def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (vs the ROWS frames of q_moving_avg):
    per user, the count and sum of error values in the TRAILING 30
    REAL MINUTES — a value-based frame boundary, so sparse and bursty
    users get correct physics (a ROWS frame would span hours for a
    quiet user). Spark's rangeBetween needs a numeric ordering column;
    epoch-µs is the idiom — 30 min = 1.8e9 µs. Same sliding-alarm
    shape as monitoring's 'errors in the last N minutes per entity'."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    half_hour_us = 30 * 60 * 1_000_000
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-half_hour_us, 0)
    )
    return (
        events.filter(F.col("event_type") == "error")
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            F.count("*").over(w).alias("n_30m"),
            F.round(F.sum("value").over(w), 2).alias("sum_30m"),
        )
    )


@query(
    "q_topk_per_group",
    oracle="""
        SELECT n_name, c_custkey, round(c_acctbal, 2) AS acctbal, rnk
        FROM (
            SELECT n_name, c_custkey, c_acctbal,
                   CAST(row_number() OVER (
                       PARTITION BY n_name
                       ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS rnk
            FROM customer JOIN nation ON c_nationkey = n_nationkey)
        WHERE rnk <= 3
    """,
    tags=("window", "topk"),
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation — top-k PER GROUP, the
    shape global TakeOrderedAndProject can't express. Spark plans
    WindowGroupLimit Partial before the exchange: each map task keeps
    only its local top-3 per nation, so the shuffle carries ≤3·tasks
    rows per group instead of every customer — the same pruning that
    makes this viable at 100 TB. c_custkey tiebreaks for determinism."""
    from pyspark.sql import Window as W

    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .select("n_name", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"), "rnk")
    )


@query(
    "q_mode_per_group",
    oracle="""
        SELECT user_id, event_type AS mode_type, cnt
        FROM (
            SELECT user_id, event_type, cnt,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY cnt DESC, event_type ASC) AS rn
            FROM (
                SELECT user_id, event_type, count(*) AS cnt
                FROM events GROUP BY user_id, event_type))
        WHERE rn = 1
    """,
    tags=("window", "agg"),
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent event_type per user — mode as aggregate-then-
    argmax. Built-in `mode()` exists in both engines but neither
    documents tie order, so this spells the deterministic form:
    count, then row_number with an alphabetical tiebreak. The count
    aggregate shrinks the window input to (users × types) rows first."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    w = W.partitionBy("user_id").orderBy(F.desc("cnt"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "cnt")
    )


@query(
    "q_share_of_total",
    oracle="""
        SELECT n_name,
               round(rev, 2) AS revenue,
               round(rev / sum(rev) OVER (), 6) AS share,
               CAST(rank() OVER (ORDER BY rev DESC, n_name ASC) AS INT) AS rnk
        FROM (
            SELECT n_name, sum(o_totalprice) AS rev
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name)
    """,
    tags=("window", "agg"),
)
def q_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total (ratio_to_report): per-nation revenue as a
    fraction of the grand total — a window OVER an aggregate. The
    empty-frame sum runs on the 25-row aggregate output, not the fact
    table, so the 'global' window is trivially cheap at any scale; the
    unrounded rev feeds both the ratio and the rank so the two engines
    divide identical doubles (their aggregate sums already hash-match),
    and rounding happens only at the output edge."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    agg = (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w_all = W.partitionBy()
    w_rank = W.orderBy(F.desc("rev"), F.asc("n_name"))
    return agg.select(
        "n_name",
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") / F.sum("rev").over(w_all), 6).alias("share"),
        F.rank().over(w_rank).alias("rnk"),
    )


@query(
    "q_resample_ffill",
    oracle="""
        WITH b AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   CAST(count(*) AS BIGINT) AS c,
                   sum(CAST(round(value * 100) AS BIGINT)) AS qs
            FROM events GROUP BY event_type, date_trunc('hour', ts)),
        r AS (
            SELECT event_type, min(h) AS mn, max(h) AS mx
            FROM b GROUP BY event_type),
        spine AS (
            SELECT event_type,
                   unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
            FROM r),
        j AS (
            SELECT s.event_type, s.h, b.c,
                   CASE WHEN b.c IS NULL THEN NULL
                        ELSE CAST(b.qs // b.c AS BIGINT) END AS a
            FROM spine s LEFT JOIN b
              ON b.event_type = s.event_type AND b.h = s.h)
        SELECT event_type,
               CAST(epoch_us(h) AS BIGINT) AS hour_us,
               CAST(coalesce(c, 0) AS BIGINT) AS n_events,
               CAST(last_value(a IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY h
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS filled_avg_x100
        FROM j
    """,
    tags=("window", "timeseries", "resample", "extension"),
)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward fill: hourly per-type averages
    on a DENSE hour spine (gaps materialized, then carried forward
    with last-ignoreNulls) — the gap-filling operator every metrics /
    sensor pipeline needs and SQL engines make you assemble by hand.

    Scale shape: the fact table collapses FIRST (one map-side-partial
    groupBy to (type, hour) — the only corpus-sized stage); the spine
    is generated from the per-type min/max as sequence+explode, sized
    hours x types regardless of corpus size, so the left join and the
    forward-fill window run on the aggregate, never the raw events.
    Per-row quantization (round(value*100) before sum) keeps the
    hourly sums associative → identical across engines and
    partitionings."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    b = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count("*").alias("c"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("qs"),
    )
    r = b.groupBy("event_type").agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = r.select(
        "event_type",
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    j = spine.join(b, ["event_type", "h"], "left").withColumn(
        "a",
        F.when(F.col("c").isNotNull(), F.expr("CAST(qs div c AS BIGINT)")),
    )
    w = W.partitionBy("event_type").orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    return j.select(
        "event_type",
        F.unix_micros("h").alias("hour_us"),
        F.coalesce("c", F.lit(0)).cast("bigint").alias("n_events"),
        F.last("a", ignorenulls=True).over(w).cast("bigint").alias("filled_avg_x100"),
    )


@query(
    "q_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS next_type
            FROM events)
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(count(*) AS BIGINT) AS n_transitions
        FROM seq
        WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    """,
    tags=("window", "pipeline", "sequence"),
)
def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition matrix (sequence-modeling prep): per-user
    chronological lead() pairs each event with its successor, then
    one aggregate counts (from, to) edges — the empirical Markov
    transitions behind next-action models and anomalous-flow
    detection.  One keyed exchange (user_id) for the window, then a
    |event_types|^2-key aggregate with map-side partials; the fact
    never moves again.  event_id tiebreaks keep successor choice
    deterministic under timestamp ties."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("bigint").alias("n_transitions"))
    )


@query(
    "q_cohort_retention",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   min(date_trunc('week', CAST(ts AS TIMESTAMP))) AS cohort_week
            FROM events GROUP BY user_id),
        activity AS (
            SELECT DISTINCT e.user_id,
                   date_trunc('week', CAST(e.ts AS TIMESTAMP)) AS activity_week
            FROM events e)
        SELECT epoch_us(f.cohort_week) AS cohort_week_us,
               CAST(date_diff('week', f.cohort_week, a.activity_week) AS BIGINT)
                   AS weeks_since,
               CAST(count(*) AS BIGINT) AS n_users
        FROM activity a JOIN firsts f USING (user_id)
        GROUP BY 1, 2
    """,
    tags=("window", "pipeline", "cohort"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohorts: users bucketed by first-seen week, counted
    in each later activity week — the (cohort, weeks-since) retention
    triangle.  Two aggregates over the fact (first-seen per user;
    distinct user-week activity) joined on user_id: the cohort table
    is O(users), so at scale this is one fact scan + keyed exchanges
    on user_id only, never a fact-x-fact join.  Weeks are epoch-µs
    bigints at the boundary (driver canonicalizer contract —
    timestamps never leave a query raw)."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("activity_week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .select(
            F.unix_micros("cohort_week").alias("cohort_week_us"),
            (
                F.floor(
                    (F.unix_micros("activity_week") - F.unix_micros("cohort_week"))
                    / F.lit(7 * 24 * 3600 * 1000000)
                )
            )
            .cast("bigint")
            .alias("weeks_since"),
        )
        .groupBy("cohort_week_us", "weeks_since")
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )


@query(
    "q_wow_growth",
    oracle="""
        WITH weekly AS (
            SELECT date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2)
        SELECT epoch_us(wk) AS week_us, event_type, n,
               lag(n) OVER (PARTITION BY event_type ORDER BY wk) AS prev_n,
               CAST(CASE WHEN lag(n) OVER (PARTITION BY event_type ORDER BY wk)
                              IS NULL THEN NULL
                         ELSE 10000 * (n - lag(n) OVER (
                                  PARTITION BY event_type ORDER BY wk))
                              // lag(n) OVER (PARTITION BY event_type ORDER BY wk)
                    END AS BIGINT) AS wow_x10k
        FROM weekly
    """,
    tags=("window", "reporting"),
)
def q_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type — the window-over-
    AGGREGATE reporting shape: the fact collapses to O(weeks x
    types) rows FIRST, then lag() runs over that tiny table, so the
    window's sort never sees raw events (the same aggregate-first
    posture as q_share_of_total / q_resample_ffill).  Growth is an
    integer-scaled ratio; weeks leave as epoch-us bigints."""
    events = load_table(spark, sf_dir, "events")
    weekly = events.groupBy(
        F.date_trunc("week", F.col("ts")).alias("wk"), "event_type"
    ).agg(F.count("*").cast("bigint").alias("n"))
    w = W.partitionBy("event_type").orderBy("wk")
    return weekly.select(
        F.unix_micros("wk").alias("week_us"),
        "event_type",
        "n",
        F.lag("n").over(w).alias("prev_n"),
    ).selectExpr(
        "week_us",
        "event_type",
        "n",
        "prev_n",
        "CAST(CASE WHEN prev_n IS NULL THEN NULL "
        "ELSE 10000 * (n - prev_n) div prev_n END AS BIGINT) AS wow_x10k",
    )


@query(
    "q_funnel_steps",
    oracle="""
        WITH a AS (
            SELECT user_id, ts, event_id, event_type,
                   max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS s1
            FROM events),
        b AS (
            SELECT *, max(CASE WHEN event_type = 'click' AND s1 = 1
                               THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS s2
            FROM a),
        c AS (
            SELECT *, max(CASE WHEN event_type = 'purchase' AND s2 = 1
                               THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS s3
            FROM b),
        per_user AS (
            SELECT user_id, max(s1) AS s1, max(s2) AS s2, max(s3) AS s3
            FROM c GROUP BY user_id)
        SELECT CAST(sum(s1) AS BIGINT) AS users_view,
               CAST(sum(s2) AS BIGINT) AS users_view_click,
               CAST(sum(s3) AS BIGINT) AS users_view_click_purchase,
               CAST(10000 * sum(s2) // sum(s1) AS BIGINT) AS conv_click_x10k,
               CAST(10000 * sum(s3) // sum(s1) AS BIGINT) AS conv_purchase_x10k
        FROM per_user
    """,
    tags=("window", "sequence", "funnel", "extension"),
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: a user converts at step
    k only if the step-k event happens AFTER steps 1..k-1 were already
    satisfied (strict sequence matching, not mere co-occurrence — a
    purchase before the first view does not count).  Implemented as
    three stacked running-max flags over ONE (user_id, ts, event_id)
    window spec: same partitioning and ordering, so Spark plans a
    single exchange + single sort with three chained Window operators;
    the per-user reduction then rides the same partitioning (no second
    exchange) and the final global roll-up is a map-side-partial
    scalar aggregate.  The identical window text runs on both engines
    — ordering ties broken by event_id keep the flags deterministic.
    At 100 TB this is exactly one fact shuffle, the floor for any
    per-user sequence computation."""
    events = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    step = (
        events.withColumn(
            "s1",
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).over(w),
        )
        .withColumn(
            "s2",
            F.max(
                F.when(
                    (F.col("event_type") == "click") & (F.col("s1") == 1), 1
                ).otherwise(0)
            ).over(w),
        )
        .withColumn(
            "s3",
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("s2") == 1), 1
                ).otherwise(0)
            ).over(w),
        )
    )
    per_user = step.groupBy("user_id").agg(
        F.max("s1").alias("s1"), F.max("s2").alias("s2"), F.max("s3").alias("s3")
    )
    return per_user.agg(
        F.sum("s1").cast("bigint").alias("users_view"),
        F.sum("s2").cast("bigint").alias("users_view_click"),
        F.sum("s3").cast("bigint").alias("users_view_click_purchase"),
        F.expr("CAST(10000 * sum(s2) div sum(s1) AS BIGINT)").alias(
            "conv_click_x10k"
        ),
        F.expr("CAST(10000 * sum(s3) div sum(s1) AS BIGINT)").alias(
            "conv_purchase_x10k"
        ),
    )


@query(
    "q_resample_interp",
    oracle="""
        WITH b AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   CAST(count(*) AS BIGINT) AS c,
                   sum(CAST(round(value * 100) AS BIGINT)) AS qs
            FROM events GROUP BY event_type, date_trunc('hour', ts)),
        r AS (
            SELECT event_type, min(h) AS mn, max(h) AS mx
            FROM b GROUP BY event_type),
        spine AS (
            SELECT event_type,
                   unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
            FROM r),
        j AS (
            SELECT s.event_type, CAST(epoch_us(s.h) AS BIGINT) AS hour_us,
                   b.c,
                   CASE WHEN b.c IS NULL THEN NULL
                        ELSE CAST(b.qs // b.c AS BIGINT) END AS a
            FROM spine s LEFT JOIN b
              ON b.event_type = s.event_type AND b.h = s.h),
        k AS (
            SELECT event_type, hour_us, c, a,
                   last_value(a IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY hour_us
                       ROWS UNBOUNDED PRECEDING) AS pv,
                   last_value(CASE WHEN a IS NOT NULL THEN hour_us END
                              IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY hour_us
                       ROWS UNBOUNDED PRECEDING) AS ph,
                   first_value(a IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY hour_us
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                   first_value(CASE WHEN a IS NOT NULL THEN hour_us END
                               IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY hour_us
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
            FROM j)
        SELECT event_type, hour_us,
               CAST(coalesce(c, 0) AS BIGINT) AS n_events,
               CAST(CASE WHEN a IS NOT NULL THEN a
                         WHEN pv IS NULL THEN nv
                         WHEN nv IS NULL THEN pv
                         ELSE pv + (nv - pv) * (hour_us - ph) // (nh - ph)
                    END AS BIGINT) AS interp_avg_x100
        FROM k
    """,
    tags=("window", "timeseries", "resample", "extension"),
)
def q_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with LINEAR interpolation — q_resample_
    ffill's better-behaved sibling for sensor/metrics gap-filling:
    missing hours take the straight line between the surrounding
    known hourly averages (integer µs position arithmetic, truncating
    division — bit-identical across engines); hours before the first
    or after the last known point fall back to nearest-known.  Same
    scale shape as ffill: the corpus collapses in ONE map-side-partial
    aggregate, the spine is sequence+explode sized hours x types, and
    the four bracket lookups are two window specs (backward/forward)
    over the aggregate, never the raw events."""
    events = load_table(spark, sf_dir, "events")
    b = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count("*").alias("c"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("qs"),
    )
    r = b.groupBy("event_type").agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = r.select(
        "event_type",
        F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("h"),
    )
    j = spine.join(b, ["event_type", "h"], "left").select(
        "event_type",
        F.unix_micros("h").alias("hour_us"),
        "c",
        F.when(
            F.col("c").isNotNull(), F.expr("CAST(qs div c AS BIGINT)")
        ).alias("a"),
    )
    wb = (
        W.partitionBy("event_type")
        .orderBy("hour_us")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wf = (
        W.partitionBy("event_type")
        .orderBy("hour_us")
        .rowsBetween(0, W.unboundedFollowing)
    )
    known_h = F.when(F.col("a").isNotNull(), F.col("hour_us"))
    k = j.select(
        "event_type",
        "hour_us",
        "c",
        "a",
        F.last("a", ignorenulls=True).over(wb).alias("pv"),
        F.last(known_h, ignorenulls=True).over(wb).alias("ph"),
        F.first("a", ignorenulls=True).over(wf).alias("nv"),
        F.first(known_h, ignorenulls=True).over(wf).alias("nh"),
    )
    return k.select(
        "event_type",
        "hour_us",
        F.coalesce("c", F.lit(0)).cast("bigint").alias("n_events"),
        F.expr(
            "CAST(CASE WHEN a IS NOT NULL THEN a "
            "WHEN pv IS NULL THEN nv "
            "WHEN nv IS NULL THEN pv "
            "ELSE pv + (nv - pv) * (hour_us - ph) div (nh - ph) "
            "END AS BIGINT)"
        ).alias("interp_avg_x100"),
    )


@query(
    "q_funnel_window",
    oracle="""
        WITH e AS (
            SELECT user_id, event_type,
                   CAST(epoch_us(ts) AS BIGINT) AS us
            FROM events),
        s1 AS (
            SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
                          OVER (PARTITION BY user_id) AS t1
            FROM e),
        s2 AS (
            SELECT *, min(CASE WHEN event_type = 'click'
                                AND us >= t1
                                AND us <= t1 + 3600000000 THEN us END)
                          OVER (PARTITION BY user_id) AS t2
            FROM s1),
        s3 AS (
            SELECT *, min(CASE WHEN event_type = 'purchase'
                                AND us >= t2
                                AND us <= t2 + 3600000000 THEN us END)
                          OVER (PARTITION BY user_id) AS t3
            FROM s2),
        per_user AS (
            SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
            FROM s3 GROUP BY user_id)
        SELECT CAST(count(t1) AS BIGINT) AS users_view,
               CAST(count(t2) AS BIGINT) AS users_click_1h,
               CAST(count(t3) AS BIGINT) AS users_purchase_1h,
               CASE WHEN count(t1) = 0 THEN NULL ELSE
                   CAST(10000 * count(t2) // count(t1) AS BIGINT) END
                   AS conv_click_x10k,
               CASE WHEN count(t1) = 0 THEN NULL ELSE
                   CAST(10000 * count(t3) // count(t1) AS BIGINT) END
                   AS conv_purchase_x10k
        FROM per_user
    """,
    tags=("window", "sequence", "funnel", "extension"),
)
def q_funnel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel: first view, then a click within ONE HOUR
    of that view, then a purchase within one hour of that qualifying
    click — the conversion-attribution shape q_funnel_steps cannot
    express (its running-max flags accept any later step, however
    distant).  Three chained full-partition MIN windows over the SAME
    user partitioning: anchor t1 = earliest view, each later anchor
    is conditioned on the previous one, so the whole chain plans as
    one exchange on user_id with three Window operators and the
    per-user reduction riding the same partitioning — no sort is even
    required (unordered whole-partition frames).  All comparisons are
    integer epoch-microseconds, so the one-hour budget (3.6e9 µs) is
    engine-exact.  At 100 TB: identical posture to q_funnel_steps —
    the fact shuffles once on user_id, window state per user is three
    bigints."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    hour = 3600000000
    per_user = (
        events.select(
            "user_id", "event_type", F.unix_micros("ts").alias("us")
        )
        .withColumn(
            "t1",
            F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(w),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("us") >= F.col("t1"))
                    & (F.col("us") <= F.col("t1") + hour),
                    F.col("us"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") >= F.col("t2"))
                    & (F.col("us") <= F.col("t2") + hour),
                    F.col("us"),
                )
            ).over(w),
        )
        .groupBy("user_id")
        .agg(
            F.min("t1").alias("t1"),
            F.min("t2").alias("t2"),
            F.min("t3").alias("t3"),
        )
    )
    # conv ratios are undefined on an empty (or view-free) window —
    # NULL, not a DIVIDE_BY_ZERO crash (ANSI mode errors on div 0):
    # the empty-input contract of the registry (tests/test_empty_input)
    return per_user.agg(
        F.count("t1").cast("bigint").alias("users_view"),
        F.count("t2").cast("bigint").alias("users_click_1h"),
        F.count("t3").cast("bigint").alias("users_purchase_1h"),
        F.expr(
            "CASE WHEN count(t1) = 0 THEN NULL ELSE "
            "CAST(10000 * count(t2) div count(t1) AS BIGINT) END"
        ).alias("conv_click_x10k"),
        F.expr(
            "CASE WHEN count(t1) = 0 THEN NULL ELSE "
            "CAST(10000 * count(t3) div count(t1) AS BIGINT) END"
        ).alias("conv_purchase_x10k"),
    )
