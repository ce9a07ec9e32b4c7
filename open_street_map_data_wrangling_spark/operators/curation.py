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
from pyspark.sql.window import Window as W

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


# ---------------------------------------------------------------------------
# The REWRITE composition (r09): boilerplate strip → ExactSubstr
# dup-strip → token-budget mixture → shard plan.  q_curation_manifest
# above composes the doc-level SELECTION stages (dedup/quality/split);
# this is its text-REWRITE sibling — the nightly job that edits and
# re-packs the corpus rather than just choosing documents.


def _training_corpus_oracle() -> str:
    from .dedup import _SPAN_K, _SPAN_POS_BITS, _span_gram_sql
    from .pipeline_ops import _SHARD_BYTES

    gram_sql = _span_gram_sql("tok")
    return f"""
        WITH toks0 AS (
            SELECT doc_id, lang, source, string_split(text, ' ') AS t
            FROM documents),
        chunks AS (
            SELECT doc_id, i AS chunk_no,
                   array_to_string(t[(i * 10 + 1):((i + 1) * 10)], ' ')
                     AS chunk,
                   md5(array_to_string(t[(i * 10 + 1):((i + 1) * 10)], ' '))
                     AS chunk_hash
            FROM toks0, unnest(range(0, (len(t) + 9) // 10)) AS r(i)),
        freq AS (
            SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs
            FROM chunks GROUP BY chunk_hash),
        clean AS (
            SELECT c.doc_id,
                   coalesce(string_agg(
                       CASE WHEN f.n_docs < 2 THEN c.chunk END,
                       ' ' ORDER BY c.chunk_no), '') AS text
            FROM chunks c JOIN freq f USING (chunk_hash)
            GROUP BY c.doc_id),
        tok AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
            FROM clean),
        gram AS (
            SELECT doc_id, pos, {gram_sql} AS g
            FROM tok
            WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        starts AS (
            SELECT doc_id, pos,
                   count(*) OVER (PARTITION BY g) >= 2 AS is_dup,
                   doc_id * {1 << _SPAN_POS_BITS} + pos
                     = min(doc_id * {1 << _SPAN_POS_BITS} + pos)
                         OVER (PARTITION BY g) AS is_first
            FROM gram WHERE g IS NOT NULL),
        flags AS (
            SELECT gr.doc_id, gr.pos,
                   CASE WHEN s.is_dup THEN 1 ELSE 0 END AS dup_start,
                   CASE WHEN s.is_dup AND s.is_first THEN 1 ELSE 0 END
                     AS canon_start
            FROM gram gr
            LEFT JOIN starts s ON gr.doc_id = s.doc_id AND gr.pos = s.pos),
        keepf AS (
            SELECT doc_id, pos,
                   CASE WHEN max(dup_start) OVER v = 1
                             AND max(canon_start) OVER v = 0
                        THEN 0 ELSE 1 END AS keep
            FROM flags
            WINDOW v AS (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN {_SPAN_K - 1} PRECEDING
                         AND CURRENT ROW)),
        stripped AS (
            SELECT t.doc_id,
                   coalesce(string_agg(t.tok, ' ' ORDER BY t.pos)
                              FILTER (WHERE k.keep = 1), '') AS text
            FROM tok t JOIN keepf k
              ON t.doc_id = k.doc_id AND t.pos = k.pos
            GROUP BY t.doc_id),
        d AS (
            SELECT s.doc_id, t0.lang, t0.source, s.text,
                   len(string_split(s.text, ' ')) AS n_tok
            FROM stripped s JOIN toks0 t0 USING (doc_id)),
        lt AS (
            SELECT lang, CAST(sum(n_tok) AS BIGINT) AS lang_toks
            FROM d GROUP BY lang),
        tot AS (
            SELECT CAST(sum(lang_toks) AS BIGINT) AS t,
                   CAST(count(*) AS BIGINT) AS n_langs
            FROM lt),
        rates AS (
            SELECT lt.lang,
                   least(65536, ((tot.t // 2) * 65536)
                                // (tot.n_langs * lt.lang_toks)) AS rate
            FROM lt CROSS JOIN tot),
        kept AS (
            SELECT d.* FROM d JOIN rates r USING (lang)
            WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))
                      ::BIGINT < r.rate),
        sized AS (
            SELECT source, doc_id, text,
                   CAST(length(text) AS BIGINT) AS bytes
            FROM kept),
        placed AS (
            SELECT doc_id, bytes,
                   CAST(coalesce(sum(bytes) OVER (
                       ORDER BY source, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT) AS global_before
            FROM sized),
        shards AS (
            SELECT global_before // {_SHARD_BYTES} AS shard_id,
                   count(*) AS n_docs, sum(bytes) AS bytes
            FROM placed GROUP BY 1)
        SELECT stage, n_docs, n_tokens, n_bytes FROM (
            SELECT 'input' AS stage,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(t)) AS BIGINT) AS n_tokens,
                   CAST(sum(length(array_to_string(t, ' '))) AS BIGINT)
                     AS n_bytes
            FROM toks0
            UNION ALL SELECT 'boilerplate',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT),
                   CAST(sum(length(text)) AS BIGINT)
            FROM clean
            UNION ALL SELECT 'dup_strip',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT),
                   CAST(sum(length(text)) AS BIGINT)
            FROM stripped
            UNION ALL SELECT 'mixture',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(n_tok) AS BIGINT),
                   CAST(sum(length(text)) AS BIGINT)
            FROM kept
            UNION ALL SELECT 'shard_plan',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(n_docs) AS BIGINT),
                   CAST(sum(bytes) AS BIGINT)
            FROM shards)
    """


def training_corpus(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(corpus, placed, manifest) — the composed REWRITE pipeline:

    1. **Boilerplate strip** (dedup.boilerplate_rewrite): drop
       10-token chunks shared by >= 2 docs, rebuild text.
    2. **ExactSubstr dup-strip** (dedup.exactsubstr_rewrite) over
       the CLEANED text: remove every duplicated k-token span except
       at its globally first corpus position.
    3. **Mixture plan** (pipeline_ops.mixture_flagged) over the
       POST-rewrite token masses: half-the-tokens budget at equal
       language shares, md5-Bernoulli keeps.
    4. **Shard plan** (pipeline_ops.shard_place): two-stage
       distributed prefix sum over the kept stream, fixed-byte
       shard ids.

    Ordering is deliberate: rewrites change token masses, so the
    mixture MUST be planned after them (sampling first would leave
    the budget wrong once spans are stripped), and sharding is by
    final byte size.  Each stage's corpus-sized output is
    localCheckpoint'd exactly once — every stage and every manifest
    row reads its predecessor's materialization, never a re-derived
    subtree (at deployment scale these checkpoints are the persisted
    inter-stage tables a nightly pipeline writes anyway).  Documents
    with NULL text drop out at the rewrite stages by contract (no
    spans to strip, nothing to pack).

    Returns: corpus = (doc_id, lang, source, text, n_tok) after
    stage 3; placed = corpus + (bytes, global_before, shard_id);
    manifest = (stage, n_docs, n_tokens, n_bytes) for all 5 stages —
    for the shard_plan row n_docs counts SHARDS and n_tokens counts
    placed documents (each stage name pins its own unit)."""
    from .dedup import boilerplate_rewrite, exactsubstr_rewrite
    from .pipeline_ops import _SHARD_BYTES, mixture_flagged, shard_place

    docs = load_table(spark, sf_dir, "documents")
    clean = (
        boilerplate_rewrite(docs)
        .select("doc_id", "lang", "source", F.col("new_text").alias("text"))
        .localCheckpoint(eager=False)
    )
    stripped = (
        exactsubstr_rewrite(clean)
        .select("doc_id", F.col("new_text").alias("text"))
        .join(docs.select("doc_id", "lang", "source"), "doc_id")
        .localCheckpoint(eager=False)
    )
    d = stripped.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    corpus = (
        mixture_flagged(d)
        .filter(F.col("keep"))
        .select("doc_id", "lang", "source", "text", "n_tok")
        .localCheckpoint(eager=False)
    )
    # shard_place returns only the placement keys; join the offsets
    # back onto the checkpointed corpus so `placed` carries the text
    # a sink writes (equi-join on doc_id over two reads of the same
    # materialization)
    placed = corpus.join(
        shard_place(corpus).select("doc_id", "bytes", "global_before"),
        "doc_id",
    ).withColumn(
        "shard_id",
        F.expr(f"global_before div {_SHARD_BYTES}").cast("bigint"),
    )

    def _stage(name: str, df: DataFrame, text_col: str = "text") -> DataFrame:
        return df.agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.size(F.split(text_col, " "))).cast("bigint").alias(
                "n_tokens"
            ),
            F.sum(F.length(text_col)).cast("bigint").alias("n_bytes"),
        ).select(F.lit(name).alias("stage"), "n_docs", "n_tokens", "n_bytes")

    shards = placed.groupBy("shard_id").agg(
        F.count("*").cast("bigint").alias("sh_docs"),
        F.sum("bytes").cast("bigint").alias("sh_bytes"),
    )
    manifest = (
        _stage("input", docs)
        .unionByName(_stage("boilerplate", clean))
        .unionByName(_stage("dup_strip", stripped))
        .unionByName(_stage("mixture", corpus))
        .unionByName(
            shards.agg(
                F.count("*").cast("bigint").alias("n_docs"),
                F.sum("sh_docs").cast("bigint").alias("n_tokens"),
                F.sum("sh_bytes").cast("bigint").alias("n_bytes"),
            ).select(
                F.lit("shard_plan").alias("stage"),
                "n_docs",
                "n_tokens",
                "n_bytes",
            )
        )
    )
    return corpus, placed, manifest


@query(
    "q_training_corpus",
    oracle=_training_corpus_oracle(),
    tags=("pipeline", "dedup", "rewrite", "sharding", "extension"),
)
def q_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage (docs, tokens, bytes) manifest of the composed
    rewrite pipeline — boilerplate strip → ExactSubstr dup-strip →
    token-budget mixture → shard plan — hash-checked against one
    DuckDB recomputation of the entire four-stage composition (the
    q_curation_manifest discipline applied to the r08 rewrite ops).
    This is the audit a nightly corpus-rewrite run logs before
    committing its output shards."""
    _, _, manifest = training_corpus(spark, sf_dir)
    return manifest


# ---------------------------------------------------------------------------
# X125 — corpus datasheet (per-source + overall, one ROLLUP pass)


@query(
    "q_datasheet",
    oracle="""
        WITH sig AS (
            SELECT source, lang,
                   len(string_split(text, ' ')) AS n_toks,
                   CASE WHEN count(*) OVER (PARTITION BY md5(text)) > 1
                        THEN 1 ELSE 0 END AS is_dup,
                   CASE WHEN len(string_split(text, ' ')) >= 20
                             AND 10000 * len(list_distinct(
                                     string_split(text, ' ')))
                                 // len(string_split(text, ' ')) >= 5000
                        THEN 1 ELSE 0 END AS is_keep
            FROM documents)
        SELECT coalesce(source, '__all__') AS source_group,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_toks) AS BIGINT) AS total_toks,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(sum(is_dup) AS BIGINT) AS dup_docs,
               CAST(10000 * sum(is_dup) // count(*) AS BIGINT) AS dup_bp,
               CAST(sum(is_keep) AS BIGINT) AS keep_docs,
               CAST(10000 * sum(is_keep) // count(*) AS BIGINT) AS keep_bp
        FROM sig
        GROUP BY ROLLUP(source)
        ORDER BY source_group
    """,
    tags=("pipeline", "quality", "extension"),
)
def q_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus datasheet (X125) — the "datasheets for datasets" summary
    a release ships alongside the corpus: per-source AND overall rows
    from ONE rollup pass, covering volume (docs, tokens), language
    breadth, exact-duplicate exposure (corpus-wide md5 families, so a
    source is charged for duplicates it shares with OTHER sources —
    the number that matters for cross-source contamination), and the
    structural keep rate (q_quality_tiers' gate).  Ratios in basis
    points via exact integer division.

    Engine side: rowwise signals at the scan; the dup flag is one
    count-over-md5 window (shuffle by content hash — at 100 TB
    identical to the exact-dedup shuffle, and a corpus that maintains
    q_dedup_exact's family table joins it instead); then ROLLUP gives
    per-source and grand-total rows in one aggregate, no second pass
    and no union of two jobs."""
    docs = load_table(spark, sf_dir, "documents")
    toks = "split(text, ' ')"
    sig = (
        docs.select(
            "source",
            "lang",
            F.md5("text").alias("__h"),
            F.expr(f"size({toks})").cast("bigint").alias("n_toks"),
            F.expr(
                f"CASE WHEN size({toks}) >= 20 AND "
                f"10000 * size(array_distinct({toks})) div size({toks}) >= 5000 "
                "THEN 1 ELSE 0 END"
            ).alias("is_keep"),
        )
        .withColumn(
            "is_dup",
            F.when(F.count("*").over(W.partitionBy("__h")) > 1, 1).otherwise(
                0
            ),
        )
        .drop("__h")
    )
    return (
        sig.rollup("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("total_toks"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.sum("is_dup").cast("bigint").alias("dup_docs"),
            F.expr("10000 * sum(is_dup) div count(*)").alias("dup_bp"),
            F.sum("is_keep").cast("bigint").alias("keep_docs"),
            F.expr("10000 * sum(is_keep) div count(*)").alias("keep_bp"),
        )
        .select(
            F.coalesce("source", F.lit("__all__")).alias("source_group"),
            "n_docs",
            "total_toks",
            "n_langs",
            "dup_docs",
            "dup_bp",
            "keep_docs",
            "keep_bp",
        )
        .orderBy("source_group")
    )
