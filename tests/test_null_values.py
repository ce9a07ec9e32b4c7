"""Registry-wide null-value contract.

Real crawls carry rows with missing payloads: a document row with no
body, an embeddings row whose vector never materialized, an event
with no type.  The contract: every registered query survives a
fixture where the three pipeline tables carry such rows — null
payloads surface as NULL features or are excluded where the op's
semantics require a value (PQ cannot code a missing vector); nothing
raises.

The sweep that motivated this found 5 crashers, fixed where this test
now pins them:

* q_compression_ratio / q_mm_extract (text.py, multimodal.py) — the
  mapInPandas workers called ``.encode()`` / ``len()`` on None;
  they now emit NULL metrics through pandas nullable Int dtypes,
  matching what the SQL twin's length(NULL)/md5(NULL) produces.
* q_pq_adc / q_pq_recall / q_pq_recall_trained (pq.py) — a NULL
  embedding left the argmin fold's -1 accumulator seed as the code,
  and the ADC lookup crashed on element_at(lut, 0); _with_qemb now
  drops uncodable rows (mirrored by WHERE embedding IS NOT NULL in
  _CODES_SQL), one rule shared by codes/ADC/recall/build/training.

The fixture also carries CJK/emoji/RTL text rows under a source name
outside the srcN convention — that layer's one find was
q_domain_mix's ANSI CAST of the empty regexp_extract (fixed with
TRY_CAST, identical both engines).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from open_street_map_data_wrangling_spark.plans import load_all_queries
from open_street_map_data_wrangling_spark.sources.catalog import TABLES

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def nulls_sf_dir(spark, tmp_path_factory):
    """sf0.001 plus null-payload rows in the three pipeline tables
    (fresh ids where the null column is a key input elsewhere)."""
    d = tmp_path_factory.mktemp("sf_nulls")
    for t in TABLES:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if t == "documents":
            extra = (
                df.limit(2)
                .withColumn("text", F.lit(None).cast("string"))
                .withColumn("lang", F.lit(None).cast("string"))
                .withColumn("doc_id", F.col("doc_id") + 1000000)
            )
            # unicode + foreign-source rows ride in the same sweep:
            # CJK/emoji/RTL text and a source name outside the srcN
            # convention (the latter crashed q_domain_mix's ANSI cast
            # until TRY_CAST, the one hit this sweep ever found)
            uni = spark.createDataFrame(
                [
                    (2000000 + i, txt, "xx", "uni", len(txt))
                    for i, txt in enumerate(
                        [
                            "héllo wörld 東京タワー 🚀 emoji",
                            "مرحبا بالعالم النص العربي",
                            "ẞ ß ŉ ǅ mixed ÇÊ̈ combining",
                        ]
                    )
                ],
                "doc_id long, text string, lang string, source string,"
                " n_chars long",
            )
            df = df.unionByName(extra).unionByName(uni)
        elif t == "embeddings":
            extra = (
                df.limit(2)
                .withColumn("embedding", F.lit(None).cast("array<float>"))
                .withColumn("vec_id", F.col("vec_id") + 1000000)
            )
            df = df.unionByName(extra)
        elif t == "events":
            extra = df.limit(2).withColumn(
                "event_type", F.lit(None).cast("string")
            )
            df = df.unionByName(extra)
        df.coalesce(1).write.mode("overwrite").parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


def test_every_registered_query_survives_null_payloads(spark, nulls_sf_dir):
    failures = []
    for name, spec in sorted(load_all_queries().items()):
        try:
            spec.spark(spark, nulls_sf_dir).limit(5).collect()
        except Exception as e:  # noqa: BLE001 — collecting the sweep
            first = (str(e).splitlines() or [type(e).__name__])[0][:120]
            failures.append(f"{name}: {type(e).__name__}: {first}")
    assert not failures, "\n".join(failures)


def test_null_payload_rows_surface_as_null_features(spark, nulls_sf_dir):
    """The fixed UDFs keep the null rows visible (NULL features), so
    a pipeline can COUNT its decode failures instead of silently
    dropping them; PQ coding excludes uncodable vectors entirely."""
    qs = load_all_queries()
    mm = {
        r["doc_id"]: r
        for r in qs["q_mm_extract"].spark(spark, nulls_sf_dir).collect()
    }
    null_rows = [r for d, r in mm.items() if 1000000 <= d < 2000000]
    assert len(null_rows) == 2
    assert all(
        r["n_bytes"] is None and r["content_md5"] is None for r in null_rows
    )
    cr = {
        r["doc_id"]: r
        for r in qs["q_compression_ratio"]
        .spark(spark, nulls_sf_dir)
        .collect()
    }
    assert all(
        cr[d]["ratio_x10k"] is None for d in cr if 1000000 <= d < 2000000
    )
    codes = (
        qs["q_pq_codes"].spark(spark, nulls_sf_dir).collect()
    )
    assert all(r["vec_id"] < 1000000 for r in codes)
    assert all(r["code0"] >= 0 for r in codes)
