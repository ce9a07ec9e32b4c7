"""Registry-wide empty-input contract.

A scheduled pipeline stage regularly meets an empty input (tonight's
partition has no data yet, a filter upstream matched nothing, a new
tenant's tables are still blank).  The contract: EVERY registered
query runs to completion on a fixture where all ten tables have zero
rows — aggregates may return their identity row (counts of 0, NULL
ratios), everything else returns zero rows; nothing raises.

The sweep that motivated this found 13 crashers in 3 classes, all
fixed where this test now pins them:

* ANN/IVF/LSH query-vector collects (similarity.py) — KeyError on
  the missing probe vector; now a typed empty result via
  ``_empty_result``, detected from the collect that already ran.
* PQ / IVF-PQ / semantic codebook collects (pq.py, semantic.py) —
  StopIteration / empty ``F.array()`` literals; same fix, including
  the persisted-index serve path (empty seeds parquet -> empty
  serve result, codes/ never touched).
* q_funnel_window conversion ratios (windows.py) — ANSI
  DIVIDE_BY_ZERO on ``count div count``; now CASE-guarded NULL in
  both engines.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from open_street_map_data_wrangling_spark.plans import load_all_queries
from open_street_map_data_wrangling_spark.sources.catalog import TABLES

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def empty_sf_dir(spark, tmp_path_factory):
    """All ten fixture tables with their real schemas and zero rows."""
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        (
            spark.read.parquet(f"{SRC}/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(d / f"{t}.parquet"))
        )
    return str(d)


def test_every_registered_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, spec in sorted(load_all_queries().items()):
        try:
            spec.spark(spark, empty_sf_dir).limit(5).collect()
        except Exception as e:  # noqa: BLE001 — collecting the sweep
            first = (str(e).splitlines() or [type(e).__name__])[0][:120]
            failures.append(f"{name}: {type(e).__name__}: {first}")
    assert not failures, "\n".join(failures)
