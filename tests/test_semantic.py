"""Determinism contract for operators/semantic.py (SemDeDup).

The module's docstring promises the Spark build is a pure function of
the input table, bit-identical to a numpy/pure-Python replay of the
same recurrence: init = the k lowest vec_ids present, assignment =
strictly-greater cosine argmax over the codebook in cid order
(zero-norm score pinned to -2.0), M-step = 1e-5 fixed-point integer
mean (Spark ``round`` is HALF_UP; bigint ``div`` truncates toward
zero — both emulated here, NOT numpy's banker's rounding / floor
division).  The replay folds dot products and norms sequentially in
array order, exactly like SQL ``aggregate``, so float results match
bit-for-bit rather than approximately.
"""

from __future__ import annotations

import math

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from open_street_map_data_wrangling_spark.operators import semantic

SF = "/root/testdata/sf0.001"
QUANT = semantic._QUANT


def _half_up(x: float) -> int:
    """Spark F.round(double, 0): BigDecimal HALF_UP, away from zero on
    exact .5 — not Python round()'s banker's rounding."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _tdiv(a: int, b: int) -> int:
    """Spark SQL bigint ``div``: truncation toward zero — not Python
    //'s floor (they differ when the sum is negative)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _seq_dot(a: list[float], b: list[float]) -> float:
    """Left-fold in array order — the summation order SQL
    ``aggregate`` uses, which numpy's pairwise np.dot does not."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _np_assign(vecs: dict[int, list[float]], cents: list[tuple[int, list[float]]]) -> dict[int, int]:
    out = {}
    for vid in sorted(vecs):
        v = vecs[vid]
        bc, bs = -1, -3.0
        for cid, c in cents:
            na, nb = _seq_dot(v, v), _seq_dot(c, c)
            if na == 0.0 or nb == 0.0:
                cos = -2.0
            else:
                cos = _seq_dot(v, c) / (math.sqrt(na) * math.sqrt(nb))
            if cos > bs:
                bc, bs = cid, cos
        out[vid] = bc
    return out


def _np_mstep(vecs: dict[int, list[float]], assign: dict[int, int]) -> list[tuple[int, list[float]]]:
    sums: dict[int, list[int]] = {}
    counts: dict[int, int] = {}
    for vid, cid in assign.items():
        counts[cid] = counts.get(cid, 0) + 1
        qs = sums.setdefault(cid, [0] * len(vecs[vid]))
        for p, x in enumerate(vecs[vid]):
            qs[p] += _half_up(x * QUANT)
    return [
        (cid, [_tdiv(s, counts[cid]) / QUANT for s in sums[cid]])
        for cid in sorted(sums)
    ]


def _np_lloyd(vecs: dict[int, list[float]], k: int, iters: int) -> dict[int, int]:
    ids = sorted(vecs)[:k]
    cents = [(vid, list(vecs[vid])) for vid in ids]
    for _ in range(iters):
        cents = _np_mstep(vecs, _np_assign(vecs, cents))
    return _np_assign(vecs, cents)


@pytest.fixture(scope="module")
def vecs() -> dict[int, list[float]]:
    # to_pylist converts the float32 elements to their exact double
    # values — the same widening CAST(x AS DOUBLE) performs in Spark.
    rows = pq.read_table(SF + "/embeddings.parquet").to_pylist()
    return {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in rows}


def test_lloyd_matches_numpy_replay(spark, vecs):
    got = {
        r["vec_id"]: r["cid"]
        for r in semantic.lloyd_assignments(spark, SF, k=4, iters=2).collect()
    }
    want = _np_lloyd(vecs, k=4, iters=2)
    assert got == want
    assert -1 not in set(got.values())


def test_semantic_dedup_matches_numpy_replay(spark, vecs):
    tau = 0.15
    got = {
        r["vec_id"]: (r["cid"], r["is_kept"])
        for r in semantic.semantic_dedup(spark, SF, k=4, iters=2, tau=tau).collect()
    }
    assign = _np_lloyd(vecs, k=4, iters=2)
    want = {}
    for vid, cid in assign.items():
        kept = True
        for other, ocid in assign.items():
            if ocid != cid or other >= vid:
                continue
            na, nb = _seq_dot(vecs[vid], vecs[vid]), _seq_dot(vecs[other], vecs[other])
            if na == 0.0 or nb == 0.0:
                continue
            cos = _seq_dot(vecs[vid], vecs[other]) / (math.sqrt(na) * math.sqrt(nb))
            if cos >= tau:
                kept = False
                break
        want[vid] = (cid, kept)
    assert got == want
    # the replay must exercise the pruning path, not vacuously agree
    assert any(not kept for _, kept in want.values())
    # cluster representatives (lowest vec_id per cid) are always kept
    reps = {}
    for vid, (cid, _) in sorted(got.items()):
        reps.setdefault(cid, vid)
    assert all(got[vid][1] for vid in reps.values())


def test_zero_norm_vectors_never_leak_sentinel(spark):
    df = spark.createDataFrame(
        [(10, [0.0, 0.0]), (11, [1.0, 0.0]), (12, [0.0, 1.0])],
        "vec_id bigint, embedding array<float>",
    )
    cents = [(0, [0.0, 0.0]), (1, [1.0, 0.0])]
    got = {r["vec_id"]: r["cid"] for r in semantic.assign_clusters(df, cents).collect()}
    # zero vector and zero centroid both score -2.0 (> the -3.0 seed),
    # so the zero row lands in the lowest cid, never the -1 sentinel
    assert got[10] == 0
    assert got[11] == 1  # cos(v, c1)=1.0 beats the -2.0 zero-centroid score
    assert got[12] == 1  # cos=0.0 still beats -2.0
    assert -1 not in got.values()


def test_lloyd_init_survives_sparse_vec_ids(spark, monkeypatch):
    """orderBy+limit seeding: a re-keyed id space (no ids < k) still
    yields exactly k seed centroids (the old vec_id < k filter
    produced zero)."""
    real = semantic.load_table

    def shifted(s, sf_dir, name):
        df = real(s, sf_dir, name)
        return df.withColumn("vec_id", F.col("vec_id") + F.lit(100000))

    monkeypatch.setattr(semantic, "load_table", shifted)
    out = semantic.lloyd_assignments(spark, SF, k=3, iters=1)
    cids = {r["cid"] for r in out.select("cid").distinct().collect()}
    assert cids <= {100000, 100001, 100002}
    assert len(cids) >= 2  # clustering actually split the space
    assert out.count() == 500
