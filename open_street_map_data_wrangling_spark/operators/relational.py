"""Core relational operators — SURVEY.md §2.2 (projections/filters),
§2.4 (aggregations), §2.7 (sorts/limits/set ops).

Reference analogs: the SQLite/Mongo query notebook (counts, distinct
users, top-k contributors, amenity distributions) and the element
filters inside `data.py::shape_element`. Every query here is pure
built-in Column expressions — no UDFs — so the whole plan stays inside
whole-stage codegen.

Scale notes (100 TB posture):
* groupBy+count/sum get map-side partial aggregation from Spark
  automatically — the shuffle carries one row per (partition, key).
* top-k (orderBy+limit) plans as TakeOrderedAndProject: each task
  keeps a k-row heap; no global sort.
* countDistinct over a high-cardinality key shuffles the distinct
  pairs; `q_approx_users` shows the HLL alternative that carries a
  fixed-size sketch instead.

Timestamp outputs are emitted as epoch-µs BIGINT (`unix_micros` /
DuckDB `epoch_us`) so the oracle compare never depends on engine
timestamp formatting (SURVEY.md §5.2 pitfalls).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.catalog import load_table, tags_long_table, TAGS_LONG_SQL

# ---------------------------------------------------------------------------
# §2.1 S2 — systematic sampler (reference: sample.py keeps every k-th element)


@query(
    "q_sample",
    oracle="""
        SELECT event_id, user_id, event_type, value, props,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        FROM events WHERE event_id % 20 = 0
    """,
    tags=("source", "sampler"),
)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic systematic sample: every 20th element by id.

    Reference: sample.py islice(..., k) [T]. A modulus on a stable key
    is fully parallel and reproducible at any scale (unlike head-N,
    which funnels through one task).
    """
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") % 20 == 0).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "props",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )


# ---------------------------------------------------------------------------
# §2.2 P1/P2 — filters and projections


@query(
    "q_filter",
    oracle="""
        SELECT event_id, user_id, event_type, value
        FROM events
        WHERE event_type IN ('signup', 'error') AND value > 50.0
    """,
    tags=("filter",),
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-type filter (reference: process only node/way) as a
    general predicate; Catalyst pushes both conjuncts into the parquet
    scan (PushedFilters)."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        F.col("event_type").isin("signup", "error") & (F.col("value") > 50.0)
    ).select("event_id", "user_id", "event_type", "value")


@query(
    "q_project",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
    tags=("project",),
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute projection (reference: NODE_FIELDS/WAY_FIELDS lists);
    column pruning reaches the scan's ReadSchema."""
    return load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# §2.4 — aggregations


@query(
    "q_count_tags",
    oracle="SELECT event_type AS tag, count(*) AS cnt FROM events GROUP BY event_type",
    tags=("agg",),
)
def q_count_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag-name histogram (reference: mapparser.py::count_tags dict
    increment) — hash aggregate with free partial/final split."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(F.col("event_type").alias("tag")).agg(F.count("*").alias("cnt"))


@query(
    "q_count",
    oracle="""
        SELECT 'events' AS tbl, count(*) AS cnt FROM events
        UNION ALL SELECT 'orders', count(*) FROM orders
        UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        UNION ALL SELECT 'customer', count(*) FROM customer
    """,
    tags=("agg",),
)
def q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row counts per table (reference: COUNT(*) nodes / ways)."""
    parts = []
    for tbl in ("events", "orders", "lineitem", "customer"):
        parts.append(
            load_table(spark, sf_dir, tbl).agg(
                F.lit(tbl).alias("tbl"), F.count("*").alias("cnt")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "q_distinct_users",
    oracle="""
        SELECT count(DISTINCT uid) AS n_users FROM (
            SELECT user_id AS uid FROM events
            UNION ALL
            SELECT o_custkey AS uid FROM orders
        )
    """,
    tags=("agg", "setop"),
)
def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct contributors across two element kinds (reference:
    users.py set() over nodes+ways; UNION ALL + COUNT DISTINCT)."""
    events = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("uid"))
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("uid"))
    return events.unionByName(orders).agg(F.countDistinct("uid").alias("n_users"))


@query("q_approx_users", oracle=None, tags=("agg", "sketch"))
def q_approx_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count — the 100 TB path for A3: carries a
    fixed-size sketch through the shuffle instead of every distinct
    key. Rows-only check (sketch estimate has no exact SQL twin)."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(F.approx_count_distinct("user_id", rsd=0.01).alias("n_users_approx"))


@query(
    "q_top_users",
    oracle="""
        SELECT user_id, count(*) AS cnt FROM events
        GROUP BY user_id ORDER BY cnt DESC, user_id ASC LIMIT 10
    """,
    tags=("agg", "topk"),
)
def q_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 contributors (reference: GROUP BY ... ORDER BY count DESC
    LIMIT 10). Spark plans TakeOrderedAndProject — per-task k-row heap,
    no global sort. user_id tiebreak keeps the LIMIT deterministic
    across engines (SURVEY.md §5.2)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("user_id"))
        .limit(10)
    )


@query(
    "q_onetime_users",
    oracle="""
        SELECT count(*) AS n_onetime FROM (
            SELECT user_id FROM events GROUP BY user_id HAVING count(*) = 1
        )
    """,
    tags=("agg",),
)
def q_onetime_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with exactly one contribution, then count them (nested
    aggregation / HAVING)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") == 1)
        .agg(F.count("*").alias("n_onetime"))
    )


@query(
    "q_top_amenities",
    oracle=f"""
        SELECT value, count(*) AS cnt FROM ({TAGS_LONG_SQL}) tags
        WHERE key = 'k' AND value IS NOT NULL
        GROUP BY value ORDER BY cnt DESC, value ASC LIMIT 10
    """,
    tags=("agg", "topk"),
)
def q_top_amenities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top tag values for one key (reference: amenity distribution over
    nodes_tags). Runs over the unpivoted tags long table."""
    tags = tags_long_table(spark, sf_dir)
    return (
        tags.filter((F.col("key") == "k") & F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("value"))
        .limit(10)
    )


@query(
    "q_stats",
    oracle="""
        SELECT epoch_us(CAST(min(ts) AS TIMESTAMP)) AS min_ts_us,
               epoch_us(CAST(max(ts) AS TIMESTAMP)) AS max_ts_us,
               round(avg(value), 2) AS avg_value,
               round(sum(value), 2) AS sum_value,
               count(*) AS cnt
        FROM events
    """,
    tags=("agg",),
)
def q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max/avg stats (reference: timestamp range, bounding box)."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.unix_micros(F.min("ts")).alias("min_ts_us"),
        F.unix_micros(F.max("ts")).alias("max_ts_us"),
        F.round(F.avg("value"), 2).alias("avg_value"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.count("*").alias("cnt"),
    )


# ---------------------------------------------------------------------------
# §2.7 — distinct / set ops / rollup-cube (A9, noted "free" in survey)


@query(
    "q_distinct",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("setop",),
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (reference: users.py set()); dropDuplicates on the key
    pair — a shuffle on the pair with map-side partial distinct."""
    return load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()


@query(
    "q_setops",
    oracle="""
        SELECT 'both' AS op, user_id FROM (
            SELECT user_id FROM events WHERE event_type = 'signup'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        )
        UNION ALL
        SELECT 'signup_only' AS op, user_id FROM (
            SELECT user_id FROM events WHERE event_type = 'signup'
            EXCEPT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        )
    """,
    tags=("setop",),
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT inventory row (§2.7 O5): signup-users vs
    purchase-users."""
    events = load_table(spark, sf_dir, "events")
    signup = events.filter(F.col("event_type") == "signup").select("user_id")
    purchase = events.filter(F.col("event_type") == "purchase").select("user_id")
    both = signup.intersect(purchase).select(F.lit("both").alias("op"), "user_id")
    only = signup.subtract(purchase).select(F.lit("signup_only").alias("op"), "user_id")
    return both.unionByName(only)


@query(
    "q_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (§2.4 A9 — free via Catalyst's Expand)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("cnt")
    )


@query(
    "q_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over order status x priority (§2.4 A9)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("cnt"))


@query(
    "q_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(grouping(l_returnflag) + 2 * grouping(l_linestatus) AS INTEGER) AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "groupingsets"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() indicators (§2.4 A9's
    third member beyond rollup/cube): per-flag totals, per-status
    totals, and the grand total in one Expand pass — the indicator
    distinguishes 'NULL because aggregated over' from a data NULL."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(grouping(l_returnflag) + 2 * grouping(l_linestatus) AS INT) AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_string_agg",
    oracle="""
        SELECT n_name,
               string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
               count(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    tags=("agg", "stringagg"),
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): distinct segments per
    nation, sorted then joined — collect_set + array_sort keeps the
    result deterministic where a bare listagg would depend on
    partition arrival order."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
            F.count("*").alias("n_customers"),
        )
    )


@query(
    "q_stratified_sample",
    oracle="""
        SELECT event_type,
               count(*) AS n_total,
               CAST(sum(CASE WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1)
                             <= '2' THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        FROM events
        GROUP BY event_type
    """,
    tags=("sample", "pipeline"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample audit: per event_type, total vs
    rows kept by the content-hash rule md5(event_id) first nibble ≤ '2'
    (3/16 ≈ 18.75% per stratum). Same rationale as q_split: a hash rule
    samples identically on any cluster layout and re-run, which
    `df.sampleBy(fractions, seed)` does not guarantee across
    repartitionings — and it needs no per-stratum fraction map shipped
    to executors. Rowwise expression + one hash agg; fully parallel."""
    events = load_table(spark, sf_dir, "events")
    keep = F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) <= "2"
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
    )


@query(
    "q_unpivot",
    oracle="""
        SELECT measure, count(*) AS n,
               round(sum(val), 2) AS total
        FROM (
            SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', l_extendedprice FROM lineitem
            UNION ALL
            SELECT 'l_discount', l_discount FROM lineitem
            UNION ALL
            SELECT 'l_tax', l_tax FROM lineitem)
        GROUP BY measure
    """,
    tags=("relational", "reshape"),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt via the native `df.unpivot` (the §2.3 reshape
    family's inverse of q_pivot): lineitem's four measures to
    (measure, val) rows, then per-measure stats. unpivot is a narrow
    zero-shuffle transform — the 4× row expansion happens inside the
    scan stage, never crossing an exchange until the final agg; the
    oracle spells it as the equivalent UNION ALL."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("measure").agg(
        F.count("*").alias("n"),
        F.round(F.sum("val"), 2).alias("total"),
    )


@query(
    "q_weighted_sample",
    oracle="""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0)
              * (SELECT max(n_chars) FROM documents) < n_chars
        ORDER BY doc_id
    """,
    tags=("sample", "pipeline"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sample: keep a document with probability
    proportional to its length (inclusion prob = n_chars / max).  The
    uniform draw is content-derived — the first 32 md5 bits of the key
    scaled to [0,1) — so the sample is identical on any cluster
    layout, partition count, or re-run, which `df.sample(fraction,
    seed)` does not guarantee (its Bernoulli draw is partition-indexed).
    The max is a scalar aggregate joined in by Catalyst as a 1-row
    broadcast; everything else is a rowwise predicate at the scan, so
    the op is one pass, zero shuffles of the corpus.  This is the
    quality-weighted corpus downsampling step LLM pipelines run
    (sample high-signal docs preferentially) in its simplest
    reproducible form."""
    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("n_chars").alias("__mx"))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(4294967296.0)
    )
    return (
        docs.crossJoin(F.broadcast(mx))
        .filter((u * F.col("__mx")) < F.col("n_chars"))
        .select("doc_id", "lang", "n_chars")
    )


@query(
    "q_reservoir_per_key",
    oracle="""
        SELECT lang, doc_id
        FROM (
            SELECT lang, doc_id,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM documents)
        WHERE rn <= 20
        ORDER BY lang, doc_id
    """,
    tags=("sample", "pipeline"),
)
def q_reservoir_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-key reservoir: 20 documents per language,
    chosen by md5 rank — a content-derived stand-in for `ORDER BY
    random() LIMIT 20` that re-runs identically anywhere.  Planned as
    row_number over (lang), which Spark executes with WindowGroupLimit
    partial pushdown: each map task keeps only its local top-20 per
    lang BEFORE the exchange, so the shuffle carries <= 20*tasks rows
    per key no matter how skewed the language distribution — the same
    bounded-shuffle property the q_topk_per_group family is CI-pinned
    for.  doc_id tiebreaks make the reservoir total-ordered and
    driver-hashable."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .select("lang", "doc_id")
    )


@query(
    "q_user_overlap",
    oracle="""
        WITH tu AS (
            SELECT DISTINCT event_type, user_id FROM events),
        sizes AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n
            FROM tu GROUP BY event_type),
        inter AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_both
            FROM tu a JOIN tu b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2)
        SELECT i.type_a, i.type_b, i.n_both,
               sa.n AS n_a, sb.n AS n_b,
               CAST(10000 * i.n_both // (sa.n + sb.n - i.n_both) AS BIGINT)
                   AS jaccard_x10k
        FROM inter i
        JOIN sizes sa ON sa.event_type = i.type_a
        JOIN sizes sb ON sb.event_type = i.type_b
    """,
    tags=("relational", "reporting", "setops"),
)
def q_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap: Jaccard of user sets for every event-type
    pair — the segment-intersection report behind "do purchasers also
    click" questions.  The intersection self-join runs on the
    DEDUPLICATED (type, user) table keyed by user_id, so its size is
    O(users x types), never O(events²); pair fan-out per user is
    bounded by the type count (5 here), and set sizes broadcast back
    onto the bounded pair table.  Integer-scaled Jaccard."""
    events = load_table(spark, sf_dir, "events")
    tu = events.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n"))
    a, b = tu.alias("a"), tu.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .selectExpr(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            "CAST(10000 * n_both div (n_a + n_b - n_both) AS BIGINT) AS jaccard_x10k",
        )
    )


@query(
    "q_seasonality",
    oracle="""
        SELECT CAST(dayofweek(CAST(ts AS TIMESTAMP)) AS INT) AS dow,
               CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hod,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("relational", "reporting", "datetime"),
)
def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day x day-of-week activity matrix — the seasonality
    fingerprint load forecasting and anomaly baselines start from.
    One aggregate with at most 168 keys; map-side partials collapse
    the fact before the exchange (the smallest shuffle a full-table
    report can have).  DuckDB's dayofweek is 0-6 Sunday-first while
    Spark's dayofweek is 1-7 Sunday-first — the Spark side subtracts
    1 so both emit the same 0-6 convention."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            (F.dayofweek("ts") - F.lit(1)).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hod"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
