"""functions/xxh64_sql.py — the DuckDB re-implementation of Spark's
xxhash64 must agree with the ENGINE, not just with itself: every
specialization (string bytes, 4-byte int, 8-byte long, multi-column
chaining) is pinned against F.xxhash64 on randomized inputs covering
all length classes (empty, <8, =8, <32, =32 boundary, multi-stripe,
every tail-remainder shape), plus the Python twins used as the fast
in-test ground truth."""

import random
import string

import duckdb
from pyspark.sql import functions as F

from open_street_map_data_wrangling_spark.functions.xxh64_sql import (
    py_signed,
    py_xxh64_bytes,
    py_xxh64_int,
    py_xxh64_long,
    to_signed,
    to_u64,
    xxh64_int_expr,
    xxh64_long_expr,
    xxh64_str_ctes,
)

# every byte-length equivalence class of the algorithm: empty, pure
# byte-tail, exact 4/8 chunks, every (stripe, 8-word, 4-chunk, bytes)
# remainder combination around the 32-byte boundary, multi-stripe
_LENGTHS = [0, 1, 3, 4, 5, 7, 8, 9, 12, 15, 16, 20, 31, 32, 33, 36,
            40, 44, 47, 63, 64, 65, 96, 100, 127, 128, 200]


def _corpus(seed: int = 20260816) -> list[str]:
    rng = random.Random(seed)
    alphabet = string.ascii_letters + string.digits + " .,;:!?'-"
    return [
        "".join(rng.choices(alphabet, k=k)) for k in _LENGTHS
    ] + ["the quick brown fox jumps over the lazy dog"]


def test_python_twins_match_spark(spark):
    strs = _corpus()
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    rows = df.select(
        "s",
        F.xxhash64("s").alias("hs"),
        F.xxhash64(F.col("s"), F.lit(3)).alias("hi"),
        F.xxhash64(F.col("s"), F.lit(-3)).alias("hn"),
    ).collect()
    for r in rows:
        u = py_xxh64_bytes(r["s"].encode(), 42)
        assert py_signed(u) == r["hs"], repr(r["s"])
        assert py_signed(py_xxh64_int(3, u)) == r["hi"], repr(r["s"])
        # negative int: Spark masks (input & 0xFFFFFFFF) before the
        # multiply — the twin must wrap to u32, not sign-extend
        assert py_signed(py_xxh64_int(-3, u)) == r["hn"], repr(r["s"])
    lrows = spark.createDataFrame(
        [(123456789012345, -987654321098765), (0, 0), (-1, 1),
         (2**63 - 1, -(2**63))],
        "a long, b long",
    ).select("a", "b", F.xxhash64("a", "b").alias("h")).collect()
    for r in lrows:
        assert (
            py_signed(py_xxh64_long(r["b"], py_xxh64_long(r["a"], 42)))
            == r["h"]
        )


def test_sql_emitters_match_python_twins():
    strs = _corpus(seed=7)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(
            "({}, '{}')".format(i, s.replace("'", "''"))
            for i, s in enumerate(strs)
        )
        + ") v(doc_id, sh)"
    )
    rows = con.execute(
        f"WITH {xxh64_str_ctes('t')} SELECT t.doc_id, t.sh, xh.shh, "
        f"{xxh64_int_expr(5, 'xh.shh')} AS h5, "
        f"{xxh64_int_expr(-7, 'xh.shh')} AS hn "
        f"FROM xh JOIN t USING (sh) ORDER BY t.doc_id"
    ).fetchall()
    assert len(rows) == len(strs)
    for _, s, shh, h5, hn in rows:
        u = py_xxh64_bytes(s.encode(), 42)
        assert int(shh) == u, repr(s)
        assert int(h5) == py_xxh64_int(5, u), repr(s)
        # negative constant must wrap to u32 (mirrors Spark hashInt's
        # (input & 0xFFFFFFFF) mask) — was latent-wrong before r15
        assert int(hn) == py_xxh64_int(-7, u), repr(s)
    vals = [(123456789012345, -987654321098765), (0, 0), (-1, 1),
            (2**63 - 1, -(2**63)), (42, 42)]
    con.execute(
        "CREATE TABLE l AS SELECT * FROM (VALUES "
        + ",".join(f"(({a})::BIGINT, ({b})::BIGINT)" for a, b in vals)
        + ") v(ra, rb)"
    )
    # non-ASCII precondition guard: the CTE must fail LOUDLY, not
    # return a silently-wrong hash
    con.execute("CREATE TABLE bad AS SELECT 'café' AS sh")
    try:
        con.execute(f"WITH {xxh64_str_ctes('bad')} SELECT * FROM xh")
        raise AssertionError("non-ASCII input did not raise")
    except duckdb.Error as e:
        assert "non-ASCII" in str(e)

    inner = xxh64_long_expr(to_u64("ra"), "42")
    out = con.execute(
        f"SELECT ra, rb, "
        f"{to_signed(xxh64_long_expr(to_u64('rb'), 's1'))} AS bv "
        f"FROM (SELECT ra, rb, {inner} AS s1 FROM l)"
    ).fetchall()
    for a, b, h in out:
        assert int(h) == py_signed(
            py_xxh64_long(b, py_xxh64_long(a, 42))
        )


def test_driver_side_tok_buckets_match_spark_expression(spark):
    """r17 serve-path job cut: text._tok_buckets computes index
    partition buckets on the driver with the Python xxh64 twin; it
    must agree with the pmod(xxhash64(tok), N) expression the index
    BUILDERS write, for the real demo query terms and a randomized
    token corpus covering every length class."""
    from pyspark.sql import functions as F

    from open_street_map_data_wrangling_spark.operators import text as t

    toks = sorted(
        set(_corpus())
        | set(t._SEARCH_TERMS)
        | set(t._BM25_TERMS)
        | {q for _, ts, _ in t._MAXSIM_BATCH_FILTERED for q in ts}
    )
    df = spark.createDataFrame([(s,) for s in toks], "tok string")
    rows = df.select(
        "tok",
        F.pmod(F.xxhash64("tok"), F.lit(t._INDEX_BUCKETS)).alias("b"),
    ).collect()
    want = {r["tok"]: int(r["b"]) for r in rows}
    for tok in toks:
        assert t._tok_buckets([tok]) == [want[tok]], tok
    # set form: dedup + sort
    assert t._tok_buckets(toks) == sorted({want[x] for x in toks})


def test_read_small_parquet_matches_spark_collect(spark, tmp_path):
    """index_cache.read_small_parquet (driver-side pyarrow read of
    tiny artifacts) must return the same rows as the Spark collect it
    replaces — including the float32 array and empty-dir cases."""
    from open_street_map_data_wrangling_spark.operators.index_cache import (
        read_small_parquet,
    )

    p = str(tmp_path / "seeds")
    df = spark.createDataFrame(
        [(1, [0.5, 1.25], 3), (2, [float("0.1"), -2.0], 3)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, n_centroids INT",
    )
    df.write.mode("overwrite").parquet(p)
    got = sorted(
        read_small_parquet(
            spark,
            p,
            "vec_id BIGINT, embedding ARRAY<FLOAT>, n_centroids INT",
            ("vec_id", "embedding", "n_centroids"),
        ),
        key=lambda r: r["vec_id"],
    )
    want = sorted(
        (r.asDict() for r in df.collect()), key=lambda r: r["vec_id"]
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert int(g["vec_id"]) == int(w["vec_id"])
        assert int(g["n_centroids"]) == int(w["n_centroids"])
        assert [float(x) for x in g["embedding"]] == [
            float(x) for x in w["embedding"]
        ]
    # empty dir (build from empty corpus): Spark returns zero rows;
    # the helper must too (pyarrow raises there -> Spark fallback)
    e = str(tmp_path / "empty")
    spark.createDataFrame(
        [], "vec_id BIGINT, embedding ARRAY<FLOAT>, n_centroids INT"
    ).write.mode("overwrite").parquet(e)
    assert (
        read_small_parquet(
            spark,
            e,
            "vec_id BIGINT, embedding ARRAY<FLOAT>, n_centroids INT",
            ("vec_id", "embedding", "n_centroids"),
        )
        == []
    )
