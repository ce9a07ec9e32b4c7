"""Front-door parity operators — SURVEY.md §3.1 EP3.

The reference exposes its query suite through two doors: SQL text
(SQLite) and Mongo aggregation pipelines. Both map onto the same
Catalyst plans here; these queries prove each door end-to-end:

* q_sql_frontdoor — `spark.sql` over registered views (DataFrame
  builder and SQL text converge on identical plans)
* q_pipeline     — the Mongo-pipeline interpreter (plans/pipeline.py)
* q_pivot        — wide reshaping (the report tables the reference
  builds by hand in its notebook)
* q_udtf_shingles — Python UDTF (Spark 4 class API, §2.10) emitting
  shingles as a table function; the slow-path escape hatch shown
  oracle-checked against its pure-SQL twin
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import build_pipeline
from ..plans.registry import query
from ..sources.catalog import load_table, load_tables


@query(
    "q_sql_frontdoor",
    oracle="""
        SELECT n_name, count(DISTINCT c_custkey) AS n_customers,
               round(sum(o_totalprice), 2) AS total_spend
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    tags=("frontdoor", "sql"),
)
def q_sql_frontdoor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL front door: the same text a reference SQLite notebook would
    run, through spark.sql over registered views — Catalyst produces
    the identical plan the DataFrame builder would."""
    load_tables(spark, sf_dir, ("orders", "customer", "nation"))
    return spark.sql(
        """
        SELECT n_name, count(DISTINCT c_custkey) AS n_customers,
               round(sum(o_totalprice), 2) AS total_spend
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


@query(
    "q_pipeline",
    oracle="""
        SELECT event_type AS _id, count(*) AS n, round(avg(value), 2) AS avg_value
        FROM events
        WHERE event_type IN ('purchase', 'signup', 'error') AND value > 10.0
        GROUP BY event_type
        ORDER BY n DESC, _id ASC
        LIMIT 5
    """,
    tags=("frontdoor", "pipeline"),
)
def q_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo-pipeline front door: $match → $group → $sort → $limit
    interpreted onto Catalyst nodes (reference: pymongo aggregate()
    query suite)."""
    events = load_table(spark, sf_dir, "events")
    out = build_pipeline(
        events,
        [
            {"$match": {"event_type": {"$in": ["purchase", "signup", "error"]},
                        "value": {"$gt": 10.0}}},
            {"$group": {"_id": "$event_type",
                        "n": {"$sum": 1},
                        "avg_value": {"$avg": "$value"}}},
            {"$sort": {"n": -1, "_id": 1}},
            {"$limit": 5},
        ],
    )
    return out.withColumn("avg_value", F.round("avg_value", 2))


@query(
    "q_pivot",
    oracle="""
        SELECT l_returnflag,
               round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_O,
               round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_F
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("frontdoor", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide report tables the reference writes by hand):
    explicit value list keeps the plan static — at scale an
    unconstrained pivot needs a distinct-values pass first."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


@query(
    "q_udtf_shingles",
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                      WHERE doc_id < 100),
        shing AS (
            SELECT doc_id,
                   list_distinct(CASE WHEN len(t) >= 3
                       THEN list_transform(range(1, len(t) - 1),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                       ELSE [array_to_string(t, ' ')] END) AS shs
        FROM toks)
        SELECT doc_id, unnest(shs) AS shingle FROM shing
    """,
    tags=("frontdoor", "udtf"),
)
def q_udtf_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (§2.10, Spark 4 class API): a table function
    emitting one row per 3-gram shingle. The pure-expression form
    (functions/textfeat.py) is the production path — this proves the
    UDTF escape hatch against the same oracle. Bounded to 100 docs:
    row-at-a-time Python is the slow path by design."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, shingle string")
    class ShingleUDTF:
        def eval(self, doc_id: int, text: str):
            toks = text.split(" ")
            if len(toks) >= 3:
                shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
            else:
                shingles = {" ".join(toks)}
            for sh in sorted(shingles):
                yield doc_id, sh

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return _apply_udtf(spark, docs, ShingleUDTF)


def _apply_udtf(spark: SparkSession, docs: DataFrame, shingle_udtf) -> DataFrame:
    docs.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("shingle_udtf", shingle_udtf)
    return spark.sql(
        "SELECT s.doc_id, s.shingle FROM _udtf_docs, "
        "LATERAL shingle_udtf(doc_id, text) s"
    )


@query(
    "q_subqueries",
    oracle="""
        SELECT c_mktsegment, count(*) AS n_big_spenders
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        )
        GROUP BY c_mktsegment
    """,
    tags=("frontdoor", "subquery"),
)
def q_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + scalar subquery (the reference's SQLite
    `IN (subquery)` family, §2.5 J2 / §4.2): Catalyst decorrelates the
    EXISTS into a left-semi join and evaluates the scalar subquery
    once — hand-rewriting, which the reference's notebook did
    implicitly, is the optimizer's job here."""
    load_tables(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_big_spenders
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        )
        GROUP BY c_mktsegment
        """
    )


@query(
    "q_pipeline_unwind",
    oracle="""
        SELECT tok AS _id, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents
              WHERE lang = 'en')
        GROUP BY tok
        ORDER BY n DESC, _id ASC
        LIMIT 15
    """,
    tags=("frontdoor", "pipeline", "unwind"),
)
def q_pipeline_unwind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo $unwind through the pipeline front door (≡ Catalyst
    Generate/explode): per-token counts of English documents, with a
    $project rename stage."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    return build_pipeline(
        docs,
        [
            {"$match": {"lang": "en"}},
            {"$project": {"doc_id": 1, "tok": "$toks"}},
            {"$unwind": "$tok"},
            {"$group": {"_id": "$tok", "n": {"$sum": 1}}},
            {"$sort": {"n": -1, "_id": 1}},
            {"$limit": 15},
        ],
    )
