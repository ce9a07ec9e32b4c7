"""End-to-end corpus curation: the composed pipeline a training-data
team actually ships, as one oracle-checked operator.

Stages, in the order every public LLM-data pipeline runs them:

1. **Exact dedup** — keep the lowest doc_id per md5(text).
2. **Near-dup dedup** — MinHash-LSH candidate pairs over the exact
   survivors, connected components, keep each cluster's
   representative (minimum doc_id).  Running this AFTER exact dedup
   is what keeps LSH buckets non-degenerate (dedup.py's cap
   rationale); running components BEFORE quality filtering keeps a
   cluster's representative stable regardless of which members a
   later filter would have dropped.
3. **Quality filter** — Gopher-style structural gates, integer-exact:
   at least ``min_toks`` tokens and a distinct-token ratio of at
   least 30% (boilerplate/spam collapses token diversity).
4. **Leakage-safe split** — the q_split content-hash rule on the
   representative; by construction every kept doc IS its cluster's
   representative, so near-duplicates can never straddle the split.

The registry entry returns the per-stage MANIFEST (stage, n_docs) —
the artifact a pipeline run is judged by — and the DuckDB oracle
recomputes the entire composition (including the recursive-CTE
connected components) so the driver hash checks all four stages at
once.  ``curate_corpus`` also returns the kept-set DataFrame for
callers; tests/test_operators.py asserts the cross-stage invariants
(monotone counts, no surviving exact pair, one doc per cluster,
split completeness).

Scale notes: the survivor set is localCheckpoint'd once because three
consumers branch from it (signature pipeline, component nodes,
quality scan) — at deployment scale this is a persisted table, not a
checkpoint.  Everything else inherits the audited postures of its
building blocks: capped joinless LSH pair generation, pointer-
doubling components, rowwise quality expressions, hash split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import SHINGLES_SQL_CTE
from ..plans.registry import query
from ..sources.catalog import load_table
from .dedup import (
    _BAND_SQL,
    _LSH_BUCKET_CAP,
    _MINHASH_COLS_SQL,
    _capped_band_pairs,
    _lsh_bands,
    connected_components,
    minhash_sigs,
)

_MIN_TOKS = 5
_MIN_DISTINCT_X10K = 3000

# The shared shingle CTE reads the documents table; the curation
# pipeline shingles the exact-dedup SURVIVORS instead.  A targeted
# substitution keeps the two texts provably in sync (asserted, so a
# future rename of the CTE's source table cannot silently desync).
_SHINGLES_OVER_SURVIVORS = SHINGLES_SQL_CTE.replace("FROM documents)", "FROM survivors)")
assert "FROM survivors)" in _SHINGLES_OVER_SURVIVORS

_CURATION_ORACLE = f"""
WITH RECURSIVE
survivors AS (
    SELECT d.doc_id, d.text, d.lang FROM documents d
    JOIN (SELECT md5(text) AS h, min(doc_id) AS keep
          FROM documents GROUP BY 1) k ON d.doc_id = k.keep),
{_SHINGLES_OVER_SURVIVORS},
mh AS (
    SELECT doc_id,
       {_MINHASH_COLS_SQL}
    FROM ex GROUP BY doc_id),
bands AS ({_BAND_SQL}),
hot AS (
    SELECT bi, bv FROM bands GROUP BY bi, bv
    HAVING count(*) > {_LSH_BUCKET_CAP}),
kept AS (
    SELECT * FROM bands ba WHERE NOT EXISTS
        (SELECT 1 FROM hot h WHERE h.bi = ba.bi AND h.bv = ba.bv)),
pairs AS (
    SELECT DISTINCT a.doc_id AS pa, b.doc_id AS pb
    FROM kept a JOIN kept b
      ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id),
edges AS (SELECT pa AS a, pb AS b FROM pairs
          UNION SELECT pb, pa FROM pairs),
reach(src, dst) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
clusters AS (
    SELECT s.doc_id AS n,
           least(s.doc_id, coalesce(min(r.dst), s.doc_id)) AS cluster_id
    FROM survivors s LEFT JOIN reach r ON r.src = s.doc_id
    GROUP BY s.doc_id),
reps AS (SELECT n AS doc_id FROM clusters WHERE n = cluster_id),
quality AS (
    SELECT s.doc_id,
           len(string_split(s.text, ' ')) AS n_toks,
           len(list_distinct(string_split(s.text, ' '))) AS n_distinct
    FROM survivors s JOIN reps USING (doc_id)),
passed AS (
    SELECT doc_id FROM quality
    WHERE n_toks >= {_MIN_TOKS}
      AND 10000 * n_distinct // n_toks >= {_MIN_DISTINCT_X10K}),
spl AS (
    SELECT doc_id,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
                THEN 'train' ELSE 'test' END AS sp
    FROM passed)
SELECT stage, n_docs FROM (
    SELECT 'input' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM documents
    UNION ALL SELECT 'exact_dedup', CAST(count(*) AS BIGINT) FROM survivors
    UNION ALL SELECT 'near_dedup', CAST(count(*) AS BIGINT) FROM reps
    UNION ALL SELECT 'quality', CAST(count(*) AS BIGINT) FROM passed
    UNION ALL SELECT 'train', CAST(count(*) FILTER (sp = 'train') AS BIGINT) FROM spl
    UNION ALL SELECT 'test', CAST(count(*) FILTER (sp = 'test') AS BIGINT) FROM spl)
"""


def curate_corpus(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(kept, manifest): the curated train/test doc set — (doc_id,
    split) — and the per-stage (stage, n_docs) manifest."""
    docs = load_table(spark, sf_dir, "documents")
    keep_ids = docs.groupBy(F.md5("text").alias("__h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    survivors = docs.join(
        keep_ids.select("doc_id"), "doc_id", "left_semi"
    ).localCheckpoint()
    pairs = (
        _capped_band_pairs(_lsh_bands(minhash_sigs(survivors)))
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .localCheckpoint()
    )
    nodes = survivors.select(F.col("doc_id").alias("n"))
    cc = connected_components(pairs, nodes)
    reps = cc.filter(F.col("n") == F.col("cluster_id")).select(
        F.col("n").alias("doc_id")
    )
    quality = survivors.join(reps, "doc_id", "left_semi").selectExpr(
        "doc_id",
        "size(split(text, ' ')) AS n_toks",
        "size(array_distinct(split(text, ' '))) AS n_distinct",
    )
    passed = quality.filter(
        (F.col("n_toks") >= _MIN_TOKS)
        & F.expr(f"10000 * n_distinct div n_toks >= {_MIN_DISTINCT_X10K}")
    ).select("doc_id")
    kept = passed.select(
        "doc_id",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) <= "b",
            "train",
        )
        .otherwise("test")
        .alias("split"),
    )

    def _cnt(stage: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("bigint").alias("n_docs")).select(
            F.lit(stage).alias("stage"), "n_docs"
        )

    manifest = (
        _cnt("input", docs)
        .unionByName(_cnt("exact_dedup", survivors))
        .unionByName(_cnt("near_dedup", reps))
        .unionByName(_cnt("quality", passed))
        .unionByName(_cnt("train", kept.filter(F.col("split") == "train")))
        .unionByName(_cnt("test", kept.filter(F.col("split") == "test")))
    )
    return kept, manifest


@query("q_curation_manifest", oracle=_CURATION_ORACLE, tags=("pipeline", "dedup", "iterative", "extension"))
def q_curation_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage document counts of the full curation pipeline —
    exact dedup → near-dup components → quality gates → leakage-safe
    split — hash-checked against a single DuckDB recomputation of
    the whole composition."""
    _, manifest = curate_corpus(spark, sf_dir)
    return manifest
