"""Iterative graph analytics over the near-duplicate candidate graph.

The dedup family ends at connected components (q_dedup_clusters);
this module adds numeric iteration on the same graph: PageRank over
the LSH candidate pairs, ranking the documents that sit at the
CENTER of template families (a doc near-duplicating many other docs
scores high — exactly the boilerplate/template hubs a curation pass
wants to inspect first, where raw degree over-counts chains).

Same honesty class as q_semantic_dedup: fixed-iteration numeric
recurrences have no SQL twin, so the registry entry is rows-only and
the bit-exactness claim is carried by a pure-Python replay pytest
(tests/test_graph.py) — integer fixed-point arithmetic everywhere
(scale 1e12, truncating ``div``), so the result is a pure function
of the input with no float summation-order ambiguity AT ALL: any
partitioning, any executor count, same bits.

Iteration discipline is connected_components' (dedup.py): the edge
list with degrees is localCheckpoint'd ONCE, each rank generation is
localCheckpoint'd so the plan never grows with the iteration count,
and rounds are fixed (T=6) rather than convergence-tested — at 100 TB
a fixed budget is the difference between a predictable nightly job
and an unbounded one, and power-iteration error decays geometrically
(0.85^6 ≈ 0.38 of initial error, plenty to separate hubs from chain
members at the x1e12 scale we report).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import query
from .dedup import _PAIRS_CTE, q_dedup_near

_PR_SCALE = 10**12
_PR_ITERS = 6
_PR_TOP = 20


def _pr_oracle() -> str:
    """DuckDB twin of pagerank_fixed: the recurrence is a FIXED
    number of integer iterations, so it unrolls exactly into
    _PR_ITERS chained CTE pairs (inc_t, p_t).  Every quantity is
    BIGINT and DuckDB's ``//`` truncates toward zero exactly like
    Spark's ``div`` (verified on negatives; all values here are
    positive anyway), so the twin is bit-exact, not approximate —
    the same argument tests/test_graph.py's pure-Python replay
    makes, now enforced by the driver's hash every round."""
    # Every p{{t}} is referenced twice (inc_{{t+1}} and p_{{t+1}}), so
    # DuckDB's default CTE INLINING would double the plan per round —
    # 2^6 copies of the whole shingle→minhash→band pipeline.  AS
    # MATERIALIZED pins each generation to one evaluation, which is
    # also exactly what pagerank_fixed's per-round localCheckpoint
    # does on the Spark side.
    iters = []
    for t in range(_PR_ITERS):
        iters.append(f"""
        inc{t + 1} AS MATERIALIZED (
            SELECT e.dst AS doc_id, CAST(sum(p.pr // e.deg) AS BIGINT) AS inc
            FROM edeg e JOIN p{t} p ON p.doc_id = e.src
            GROUP BY e.dst),
        p{t + 1} AS MATERIALIZED (
            SELECT p.doc_id, p.base,
                   CAST((15 * p.base + 85 * coalesce(i.inc, 0)) // 100 AS BIGINT) AS pr
            FROM p{t} p LEFT JOIN inc{t + 1} i USING (doc_id))""")
    chain = ",".join(iters)
    return f"""
        WITH {_PAIRS_CTE},
        edges AS MATERIALIZED (
            SELECT pa AS src, pb AS dst FROM pairs
            UNION
            SELECT pb AS src, pa AS dst FROM pairs),
        deg AS MATERIALIZED (
            SELECT src, CAST(count(*) AS BIGINT) AS deg
            FROM edges GROUP BY src),
        edeg AS MATERIALIZED (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
        p0 AS MATERIALIZED (
            SELECT d.src AS doc_id,
                   CAST({_PR_SCALE} // nn.n AS BIGINT) AS base,
                   CAST({_PR_SCALE} // nn.n AS BIGINT) AS pr
            FROM deg d, nn),{chain}
        SELECT CAST(row_number() OVER (ORDER BY pr DESC, doc_id ASC) AS INT) AS rank,
               doc_id, pr AS pr_x1e12
        FROM p{_PR_ITERS}
        ORDER BY pr DESC, doc_id ASC
        LIMIT {_PR_TOP}
    """


def pagerank_fixed(pairs: DataFrame, iters: int = _PR_ITERS) -> DataFrame:
    """Integer fixed-point PageRank (damping 0.85 as 85/100) over an
    undirected pair list: returns (doc_id, pr) for every node in the
    pair graph, pr scaled by 1e12.

    Recurrence (all BIGINT, ``div`` truncates toward zero):
      base    = SCALE div N
      p0[i]   = base
      inc[i]  = Σ_{j ~ i} (p[j] div deg[j])
      p'[i]   = (15 * base + 85 * inc[i]) div 100

    Every quantity is a positive integer, so the sum is exact and
    order-free — the replay test can assert bit equality instead of
    tolerance.  Per iteration: one join of the degree-annotated edge
    list with the (N-row) rank table on src + one groupBy dst — both
    shuffle on node id, so at scale the two exchanges co-locate and
    the edge list's partitioning is reused across all T iterations.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").cast("bigint").alias("deg"))
    edges_deg = edges.join(deg, "src").localCheckpoint()
    nodes = deg.select(F.col("src").alias("doc_id")).localCheckpoint()
    # bounded scalar: N is one number — the 1-row broadcast crossJoin
    # convention (never a collect in the lazy path)
    n_row = nodes.agg(F.count("*").cast("bigint").alias("__n"))
    p = (
        nodes.crossJoin(F.broadcast(n_row))
        .selectExpr("doc_id", f"CAST({_PR_SCALE} AS BIGINT) div __n AS base")
        .selectExpr("doc_id", "base", "base AS pr")
        .localCheckpoint()
    )
    for _ in range(iters):
        inc = (
            edges_deg.join(
                p.select(F.col("doc_id").alias("src"), "pr"), "src"
            )
            .selectExpr("dst AS doc_id", "pr div deg AS share")
            .groupBy("doc_id")
            .agg(F.sum("share").cast("bigint").alias("inc"))
        )
        p = (
            p.select("doc_id", "base")
            .join(inc, "doc_id", "left")
            .selectExpr(
                "doc_id",
                "base",
                "CAST((15 * base + 85 * coalesce(inc, 0)) div 100 "
                "AS BIGINT) AS pr",
            )
            .localCheckpoint()
        )
    return p.select("doc_id", "pr")


@query("q_pagerank", oracle=_pr_oracle(), tags=("graph", "iterative", "extension"))
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank hubs of the near-dup candidate graph — the
    template/boilerplate centers of the corpus, ranked by where the
    random surfer of "is a near-duplicate of" concentrates.  Pair
    input is q_dedup_near (oracle-verified separately); the FIXED
    6-round integer recurrence unrolls into 6 chained CTE pairs in
    the DuckDB oracle (_pr_oracle), so the driver hash-checks the
    whole iteration, upgrading the bit-exact pure-Python replay in
    tests/test_graph.py from the only check to a second opinion.
    Deterministic tiebreak (pr DESC, doc_id ASC) and integer ranks
    make the output stable across any cluster layout."""
    pr = pagerank_fixed(q_dedup_near(spark, sf_dir))
    top = (
        pr.orderBy(F.desc("pr"), F.asc("doc_id"))
        .limit(_PR_TOP)
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.desc("pr"), F.asc("doc_id"))),
        )
    )
    return top.select("rank", "doc_id", F.col("pr").alias("pr_x1e12"))
