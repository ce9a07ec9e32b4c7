"""Semantic deduplication (SemDeDup-style): k-means over the
embedding column, then within-cluster cosine pruning.

Extends the X3/X2 families (similarity.py's IVF/centroids, dedup.py's
embedding near-dup) with the curation op large LLM corpora actually
run: cluster the embedding space, then drop semantic duplicates
INSIDE each cluster only — the clustering turns the quadratic
all-pairs cosine into k independent block-local problems (Abbas et
al., "SemDeDup", arXiv:2303.09540 — public method description only).

Scale design:

* **Lloyd iteration is shuffle-free per row.**  The codebook (k × dim
  doubles — a few KB) is collected to the driver each iteration and
  re-enters the plan as a LITERAL array of (cid, cemb) structs, so
  cluster assignment is a row-local ``aggregate`` over that array:
  no join, no window, no exchange for the E-step.  The M-step is one
  groupBy(cid, dim) over posexploded components — k·dim uniform keys,
  map-side partials — the same quantize-then-sum fixed-point trick as
  q_centroids (integer sums are associative ⇒ centroids are
  bit-identical regardless of partitioning; float means would drift
  between runs at 100 TB and between engines at any scale).
* **Driver traffic is O(k·dim) per iteration** — a bounded audit-
  style collect, same class as the existing convergence probes; the
  embedding table itself never moves except the one M-step shuffle.
* **Within-cluster pairing is the LSH-family shape**: self-join on
  the cluster id with ``vec_id <`` ordering.  Expected cluster size
  is n/k; SemDeDup deployments pick k ~ sqrt(n) (paper uses 50k
  clusters for LAION) precisely so this block-local quadratic stays
  linear overall.  A degenerate cluster inherits the same mitigation
  family as dedup.py's hot buckets (spillable SMJ; AQE skew split).

Determinism contract (why results are test-stable): init = the k
lowest vec_ids' vectors; assignment ties break toward the lower cid;
centroid components are quantized to 1e-5 fixed point before
averaging with integer division.  Every step is then a pure function
of the input table in BOTH the Spark build and the numpy reference
(tests/test_semantic.py replays the identical recurrence).

Registry: q_semantic_dedup is a rows-only entry (the iterative Lloyd
loop has no single-statement SQL twin); its strong check is the
bit-exact pure-Python replay in tests/test_semantic.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cosine_expr
from ..plans.registry import query
from ..sources.catalog import load_table

_QUANT = 100000  # 1e-5 fixed-point quantization (matches q_centroids)


def _centroid_literal(cents: list[tuple[int, list[float]]]):
    """(cid, cemb) structs as a literal array Column — the broadcast-
    free codebook (a literal is shipped inside the serialized plan,
    cheaper than a broadcast join for KB-scale payloads)."""
    return F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("cemb"),
            )
            for cid, vec in cents
        ]
    )


def assign_clusters(emb: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """(vec_id, cid): nearest centroid by cosine, ties to lower cid —
    row-local argmax over the literal codebook (no join, no window,
    no shuffle).

    Zero-norm guard: a zero embedding (or zero centroid) has no
    cosine; its score is pinned to -2.0 — below any real cosine but
    above the -3.0 accumulator seed — so the row deterministically
    lands in the lowest-cid cluster instead of leaking the -1 init
    sentinel through NaN comparisons (every ``NaN > x`` is false, so
    an unguarded division would skip every centroid)."""
    lit = _centroid_literal(cents)
    # Two-stage SQL: one ``transform`` over the codebook computes
    # (cid, dot, na, nb) per centroid so the three inner aggregates
    # run ONCE each; the outer ``aggregate`` is a strictly-greater
    # argmax, which keeps the first (lowest-cid) maximum.  Built as a
    # SQL string because the inner cosine needs the lambda-bound
    # struct field c.cemb, which the Python lambda API cannot splice
    # into cosine_expr's own SQL.
    scored = (
        "transform(__cb, c -> struct(c.cid AS cid, "
        "aggregate(zip_with(embedding, c.cemb, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (a2, v) -> a2 + v) AS dot, "
        "aggregate(embedding, 0D, (a3, x) -> a3 + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na, "
        "aggregate(c.cemb, 0D, (a4, x) -> a4 + x * x) AS nb))"
    )
    k_expr = (
        f"aggregate({scored}, "
        "struct(CAST(-1 AS INT) AS bc, CAST(-3.0 AS DOUBLE) AS bs), "
        "(acc, s) -> CASE WHEN "
        "(CASE WHEN s.na = 0D OR s.nb = 0D THEN CAST(-2.0 AS DOUBLE) "
        " ELSE s.dot / (sqrt(s.na) * sqrt(s.nb)) END) > acc.bs "
        "THEN struct(s.cid AS bc, "
        "(CASE WHEN s.na = 0D OR s.nb = 0D THEN CAST(-2.0 AS DOUBLE) "
        " ELSE s.dot / (sqrt(s.na) * sqrt(s.nb)) END) AS bs) "
        "ELSE acc END).bc"
    )
    return (
        emb.withColumn("__cb", lit)
        .withColumn("cid", F.expr(k_expr))
        .select("vec_id", "cid")
    )


def _recompute_centroids(emb: DataFrame, assign: DataFrame) -> list[tuple[int, list[float]]]:
    """M-step: quantized integer mean per (cid, dim); returns the new
    codebook as a driver-side list (k × dim — bounded)."""
    rows = (
        emb.join(assign, "vec_id")
        .select("cid", F.posexplode("embedding").alias("pos", "x"))
        .select(
            "cid",
            "pos",
            F.round(F.col("x").cast("double") * _QUANT).cast("bigint").alias("qx"),
        )
        .groupBy("cid", "pos")
        .agg(F.expr("CAST(sum(qx) div count(*) AS BIGINT)").alias("cx"))
        .collect()
    )
    by_cid: dict[int, dict[int, float]] = {}
    for r in rows:
        by_cid.setdefault(r["cid"], {})[r["pos"]] = r["cx"] / _QUANT
    return [
        (cid, [dims[p] for p in sorted(dims)]) for cid, dims in sorted(by_cid.items())
    ]


def lloyd_assignments(
    spark: SparkSession, sf_dir: str, k: int = 8, iters: int = 3
) -> DataFrame:
    """(vec_id, cid) after ``iters`` Lloyd rounds from the
    deterministic init (the k lowest vec_ids PRESENT in the table —
    orderBy + limit, not ``vec_id < k``, so a sparse or re-keyed id
    space still yields exactly min(k, n) seed centroids).  Each
    round: row-local assignment against the literal codebook + one
    k·dim-key aggregate collected to the driver."""
    emb = load_table(spark, sf_dir, "embeddings")
    init = (
        emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(k)
        .collect()
    )
    cents = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in init]
    if not cents:
        # empty-input contract (tests/test_empty_input.py): nothing to
        # cluster — an empty assignment with the normal schema, which
        # every downstream join propagates as an empty result
        from .similarity import _empty_result

        return _empty_result(emb, "vec_id BIGINT, cid INT")
    for _ in range(iters):
        assign = assign_clusters(emb, cents)
        cents = _recompute_centroids(emb, assign)
    return assign_clusters(emb, cents)


def semantic_dedup(
    spark: SparkSession, sf_dir: str, k: int = 8, iters: int = 3, tau: float = 0.8
) -> DataFrame:
    """SemDeDup pruning: (vec_id, cid, is_kept) — a vector is dropped
    iff some SAME-CLUSTER vector with a smaller vec_id has cosine
    ≥ tau with it (greedy lowest-id representative; one pass, not a
    transitive closure — the paper's epsilon-ball pruning).  The
    pairing is a block-local self-join on cid."""
    emb = load_table(spark, sf_dir, "embeddings")
    assign = lloyd_assignments(spark, sf_dir, k=k, iters=iters).localCheckpoint()
    # tagged is consumed three times (both sides of the block-local
    # self-join plus the is_kept join-back); without the lazy
    # checkpoint each consumer re-scanned the table and re-ran the
    # assignment join — 3 corpus scans in the executed plan, 0 after.
    tagged = (
        emb.join(assign, "vec_id")
        .select("vec_id", "cid", "embedding")
        .localCheckpoint(eager=False)
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    cos = cosine_expr("a.embedding", "b.embedding")
    dropped = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        )
        .filter(cos >= tau)
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        tagged.join(dropped.withColumn("__d", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            (F.col("__d").isNull()).alias("is_kept"),
        )
    )


def _sd_oracle(k: int = 8, iters: int = 3, tau: float = 0.2) -> str:
    """DuckDB twin of semantic_dedup: the Lloyd loop is a FIXED
    number of rounds, so it unrolls into ``iters`` chained
    (score → argmax → quantized M-step) CTE triples — the same
    upgrade _pr_oracle made for q_pagerank.  Cross-engine exactness
    rests on three already-proven recipes: (1) assignment scores are
    double cosines whose dot/norms fold the array sequentially in
    both engines (list_inner_product ≡ the zip_with/aggregate fold —
    the q_vec_topk/q_dedup_embedding precedent), with the zero-norm
    guard pinned to -2.0 exactly as assign_clusters does; (2) the
    M-step is the q_centroids integer quantize-then-sum recipe
    (round(x*1e5)::BIGINT, sum // count — DuckDB ``//`` truncates
    toward zero like Spark ``div``); (3) centroid components re-enter
    as cx/1e5 double division, correctly rounded identically in
    Python and DuckDB.  Every multiply-referenced CTE is MATERIALIZED
    or DuckDB 1.0's inlining would replay the chain exponentially."""
    ip = "list_inner_product"
    rounds = []
    for t in range(iters + 1):  # a{iters} is the final assignment
        rounds.append(f"""
        s{t} AS (
            SELECT e.vec_id, c.cid,
                   CASE WHEN {ip}(e.emb, e.emb) = 0 OR {ip}(c.cemb, c.cemb) = 0
                        THEN -2.0
                        ELSE {ip}(e.emb, c.cemb)
                             / (sqrt({ip}(e.emb, e.emb)) * sqrt({ip}(c.cemb, c.cemb)))
                   END AS score
            FROM e CROSS JOIN c{t} c),
        a{t} AS MATERIALIZED (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY score DESC, cid ASC) AS rn
                FROM s{t}) WHERE rn = 1)""")
        if t < iters:
            rounds.append(f"""
        c{t + 1} AS MATERIALIZED (
            SELECT cid, list(CAST(cx AS DOUBLE) / {_QUANT} ORDER BY pos) AS cemb
            FROM (
                SELECT a.cid, u.pos, CAST(sum(u.qx) // count(*) AS BIGINT) AS cx
                FROM a{t} a JOIN u USING (vec_id)
                GROUP BY a.cid, u.pos)
            GROUP BY cid)""")
    chain = ",".join(rounds)
    return f"""
        WITH
        e AS MATERIALIZED (
            SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        u AS MATERIALIZED (
            SELECT vec_id,
                   unnest(range(0, len(emb))) AS pos,
                   CAST(round(unnest(emb) * {_QUANT}) AS BIGINT) AS qx
            FROM e),
        c0 AS MATERIALIZED (
            SELECT vec_id AS cid, emb AS cemb FROM e
            ORDER BY vec_id LIMIT {k}),{chain},
        tagged AS MATERIALIZED (
            SELECT e.vec_id, a.cid, e.emb
            FROM e JOIN a{iters} a USING (vec_id)),
        dropped AS (
            SELECT DISTINCT a.vec_id
            FROM tagged a JOIN tagged b
              ON a.cid = b.cid AND b.vec_id < a.vec_id
            WHERE list_cosine_similarity(a.emb, b.emb) >= {tau})
        SELECT t.vec_id, CAST(t.cid AS INT) AS cid, (d.vec_id IS NULL) AS is_kept
        FROM tagged t LEFT JOIN dropped d ON d.vec_id = t.vec_id
    """


@query(
    "q_semantic_dedup",
    oracle=_sd_oracle(),
    tags=("pipeline", "dedup", "iterative"),
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: 3 Lloyd rounds into 8
    clusters, then within-cluster cosine pruning at tau=0.2 (greedy
    lowest-vec_id representative).  The fixed-round Lloyd loop
    unrolls into chained CTEs in the DuckDB oracle (_sd_oracle), so
    the driver hash-checks the full recurrence; tests/test_semantic.py
    keeps the bit-exact numpy replay as a second opinion."""
    return semantic_dedup(spark, sf_dir, k=8, iters=3, tau=0.2)
