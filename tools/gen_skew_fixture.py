"""Generate a deliberately Zipf-skewed documents/events fixture
(VERDICT r13 #8) at ~sf1-equivalent row counts, for the skew soak
(tools/skew_soak.py).

The driver fixtures are benign — near-uniform token frequencies,
near-uniform user ids — so the plan-shape pins prove SHAPES but say
nothing about behavior under the skew a real corpus has.  This
fixture is hostile on every axis the soak queries shuffle on:

* documents (50 000 rows = 10x sf0.1): token ranks are log-uniform
  (Zipf s~1) over a 2 000-word vocabulary, so the hottest token
  appears in ~every document (the lm_surprisal/tfidf/wordcount
  token-join hot key); document lengths are themselves skewed
  (p50 ~60 tokens, max ~1 200); `lang` is 90 % one value and
  `source` is Zipf over 10 values (the groupBy hot keys); every
  100th document is a VERBATIM copy of document 0 (a 500-member
  duplicate family — hot LSH buckets, deliberately far over the
  32-doc bucket cap, exercising the cap-drop path at volume).
* events (1 000 000 rows = 10x sf0.1): user 0 owns ~20 % of all
  events (the sessionize/top-users hot partition); event_type is
  80/15/4/1.

Everything derives from md5(doc_id/position) — seeded, regenerable,
no RNG state.  Output: /tmp/skewdata/{documents,events}.parquet.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 50_000
N_EVENTS = 1_000_000
N_EMB = 20_000
VOCAB = 2_000
OUT = os.environ.get("SKEW_DIR", "/tmp/skewdata")


def _u(expr: str) -> str:
    """Deterministic uniform [0,1) from an expression (md5 prefix)."""
    return (
        f"(CAST(conv(substring(md5(CAST({expr} AS STRING)), 1, 8), 16, 10)"
        f" AS DOUBLE) / 4294967296.0)"
    )


def main() -> None:
    from open_street_map_data_wrangling_spark.session import get_spark

    spark = get_spark("gen-skew-fixture")
    # documents: log-uniform token ranks => Zipf(1)-ish frequencies
    n_tok = (
        f"CAST(CASE WHEN {_u('id * 7 + 1')} < 0.02 "
        f"THEN 600 + floor({_u('id * 7 + 2')} * 600) "
        f"ELSE 20 + floor(pow(200.0, {_u('id * 7 + 3')})) END AS INT)"
    )
    # the hottest 31 Zipf ranks map onto the REAL fixture vocabulary
    # (so the fixed BM25/MaxSim demo query terms hit huge, hot
    # posting lists — the retrieval-side skew case); colder ranks are
    # synthetic w<k> tokens
    real = (
        "spark window merge table column vector stream value data "
        "small join filter big group hash customer sort order slow "
        "line part fast the row agg key query a scan batch dup"
    ).split()
    vocab_arr = (
        "array(" + ", ".join(f"'{w}'" for w in real) + ")"
    )
    rank = (
        f"CAST(floor(pow({VOCAB}.0, {_u('id * 1000000 + i')})) "
        f"AS BIGINT)"
    )
    tok = (
        f"CASE WHEN {rank} <= {len(real)} "
        f"THEN element_at({vocab_arr}, CAST({rank} AS INT)) "
        f"ELSE concat('w', CAST({rank} - 1 AS STRING)) END"
    )
    docs = spark.range(N_DOCS).selectExpr(
        "id AS doc_id",
        f"array_join(transform(sequence(1, {n_tok}), i -> {tok}), ' ') AS text",
        f"CASE WHEN {_u('id * 7 + 4')} < 0.9 THEN 'en' "
        f"WHEN {_u('id * 7 + 4')} < 0.96 THEN 'de' ELSE 'zh' END AS lang",
        f"concat('src', CAST(CAST(floor(pow(10.0, {_u('id * 7 + 5')})) "
        f"AS BIGINT) - 1 AS STRING)) AS source",
    )
    # every 100th doc is a verbatim copy of doc 0 (hot dup family)
    base = docs.filter("doc_id % 100 != 0 OR doc_id = 0")
    from pyspark.sql import functions as F

    d0 = docs.filter("doc_id = 0").collect()[0]
    dups = (
        spark.range(N_DOCS)
        .filter("id % 100 = 0 AND id != 0")
        .selectExpr("id AS doc_id")
        .withColumn("text", F.lit(d0["text"]))
        .withColumn("lang", F.lit(d0["lang"]))
        .withColumn("source", F.lit(d0["source"]))
    )
    out_docs = (
        base.unionByName(dups)
        .withColumn("n_chars", F.length("text").cast("bigint"))
        .repartition(32, "doc_id")
    )
    out_docs.write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

    events = spark.range(N_EVENTS).selectExpr(
        "id AS event_id",
        "timestamp_micros(CAST(1704067200000000 + "
        f"floor({_u('id * 11 + 1')} * 2592000000000.0) AS BIGINT)) AS ts",
        f"CAST(CASE WHEN {_u('id * 11 + 2')} < 0.2 THEN 0 "
        f"ELSE 1 + floor({_u('id * 11 + 3')} * 49999) END AS BIGINT)"
        " AS user_id",
        f"CASE WHEN {_u('id * 11 + 4')} < 0.80 THEN 'view' "
        f"WHEN {_u('id * 11 + 4')} < 0.95 THEN 'click' "
        f"WHEN {_u('id * 11 + 4')} < 0.99 THEN 'purchase' "
        "ELSE 'error' END AS event_type",
        f"round({_u('id * 11 + 5')} * 500.0, 2) AS value",
        f"concat('{{\"k\": ', CAST(CAST(floor({_u('id * 11 + 6')} * 100)"
        " AS INT) AS STRING), '}') AS props",
    ).repartition(32, "event_id")
    events.write.mode("overwrite").parquet(f"{OUT}/events.parquet")

    # embeddings: 10x sf0.1 (20k x 64-dim float), with a HOT CLUSTER —
    # 30% of vectors are one shared direction + 1% noise, so they all
    # collapse into a handful of IVF cells (the hostile case for
    # cell-pruned ANN: one probe cell holds ~a third of the corpus,
    # and range probes into it emit thousands of rows).  Labels are
    # Zipf over 5 values for the filtered-serving paths.  All values
    # are md5-hash uniforms — rerunnable, no RNG state.
    hot = f"{_u('id * 13 + 1')} < 0.3"
    elem = (
        f"CAST(CASE WHEN {hot} "
        f"THEN {_u('d + 31337000000')} * 0.2 - 0.1"
        f" + ({_u('id * 832 + d + 7')} * 0.02 - 0.01) "
        f"ELSE {_u('id * 832 + d + 7')} * 2.0 - 1.0 END AS FLOAT)"
    )
    embeddings = spark.range(N_EMB).selectExpr(
        "id AS vec_id",
        f"transform(sequence(0, 63), d -> {elem}) AS embedding",
        f"CAST(floor(pow(5.0, {_u('id * 13 + 2')})) - 1 AS INT) AS label",
    ).repartition(32, "vec_id")
    embeddings.write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")
    print(
        f"wrote {OUT}: documents={out_docs.count()}, "
        f"events={events.count()}, embeddings={embeddings.count()}"
    )


if __name__ == "__main__":
    main()
