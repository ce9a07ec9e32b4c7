"""Bounded-error verification for the sketch queries.

The driver checks q_approx_users and q_approx_percentiles rows-only
(a sketch estimate has no exact SQL twin to hash against), which
verifies the plumbing but not the CLAIM.  These tests close that gap
with DuckDB-derived bounds:

- HLL distinct count must land within a small multiple of its
  configured relative standard deviation of the exact
  COUNT(DISTINCT).  rsd=0.01 → 5σ = 5 % is far looser than the
  sketch's guarantee yet tight enough to catch a broken estimator
  (an off-by-bucketing bug is typically 2× off, not 5 %).
- Each approx_percentile must lie within the exact [p-ε, p+ε]
  quantile envelope around its target — the accuracy contract of
  Spark's Greenwald-Khanna sketch (accuracy parameter 10000 →
  ε = 1/10000 rank error, widened to 1/100 here to stay robust to
  duplicate-value plateaus at fixture scale).
"""

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from open_street_map_data_wrangling_spark.plans import load_all_queries

SF = "/root/testdata/sf0.001"


def _duck(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con


def test_hll_estimate_within_documented_error(spark):
    est = (
        load_all_queries()["q_approx_users"]
        .spark(spark, SF)
        .collect()[0]["n_users_approx"]
    )
    exact = _duck(SF).execute(
        "SELECT count(DISTINCT user_id) FROM events"
    ).fetchone()[0]
    assert abs(est - exact) <= max(5, 0.05 * exact), (
        f"HLL estimate {est} outside 5% of exact {exact}"
    )


def test_approx_percentiles_within_exact_quantile_envelope(spark):
    rows = load_all_queries()["q_approx_percentiles"].spark(spark, SF).collect()
    con = _duck(SF)
    eps = 0.01
    for r in rows:
        et = r["event_type"]
        for col, p in (("p50_approx", 0.5), ("p90_approx", 0.9)):
            # quantile_disc: approx_percentile returns an actual data
            # element, so the envelope must be in dataset values too
            lo, hi = con.execute(
                "SELECT quantile_disc(value, ?), quantile_disc(value, ?) "
                "FROM events WHERE event_type = ?",
                [max(0.0, p - eps), min(1.0, p + eps), et],
            ).fetchone()
            assert lo - 1e-9 <= r[col] <= hi + 1e-9, (
                f"{et}.{col}={r[col]} outside exact envelope "
                f"[{lo}, {hi}] for p∈[{p-eps}, {p+eps}]"
            )
