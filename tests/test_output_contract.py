"""Registry-wide output-dtype contract.

The verify driver canonicalizes each query's result (sort columns by
name, stringify values, hash) before comparing Spark against DuckDB.
Two rounds lost a stamp to types that canonicalize differently per
engine even when the values agree:

- round 2: ``array<bigint>`` (q_centroids) — unhashable via pandas;
- round 3: ``DECIMAL(18,2)`` (q_decimal_money) — Spark emits
  ``Decimal('…0.00')`` objects while DuckDB's pandas bridge emits
  float64, so the value hash diverges at equal cents.

This guard closes the failure class: every oracle-checked registry
query must emit ONLY types both canonicalizers provably hash the same
way — strings, integrals, doubles/floats, dates, timestamps, booleans.
Rows-only queries (no oracle) merely need a resolvable schema.

Schema resolution is plan-only (no job runs), so sweeping all ~140
registry entries stays cheap.
"""

import sys
from pathlib import Path

import pytest
from pyspark.sql import types as T

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from open_street_map_data_wrangling_spark.plans import load_all_queries

HASH_SAFE = (
    T.StringType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.BooleanType,
    T.DateType,
    T.TimestampType,
)


def test_oracle_checked_queries_emit_only_hash_safe_dtypes(spark, sf_dir):
    specs = load_all_queries()
    offenders = {}
    for name, spec in specs.items():
        df = spec.spark(spark, sf_dir)  # plan-only; no action triggered
        bad = [
            f"{f.name}: {f.dataType.simpleString()}"
            for f in df.schema.fields
            if not isinstance(f.dataType, HASH_SAFE)
        ]
        if bad and spec.oracle is not None:
            offenders[name] = bad
    assert not offenders, (
        "oracle-checked queries must emit only driver-hashable dtypes "
        f"(string/integral/double/date/timestamp/boolean); offenders: {offenders}"
    )


def test_rows_only_queries_resolve_schemas(spark, sf_dir):
    specs = load_all_queries()
    for name, spec in specs.items():
        if spec.oracle is None:
            fields = spec.spark(spark, sf_dir).schema.fields
            assert fields, f"{name} must resolve a non-empty schema"
