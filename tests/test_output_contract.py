"""Registry-wide output-dtype contract.

The verify driver canonicalizes each query's result (sort columns by
name, stringify values, hash) before comparing Spark against DuckDB.
Two rounds lost a stamp to types that canonicalize differently per
engine even when the values agree:

- round 2: ``array<bigint>`` (q_centroids) — unhashable via pandas;
- round 3: ``DECIMAL(18,2)`` (q_decimal_money) — Spark emits
  ``Decimal('…0.00')`` objects while DuckDB's pandas bridge emits
  float64, so the value hash diverges at equal cents.

- round 5: DuckDB ``HUGEINT`` (q_pq_adc) — summing ``sum(BIGINT)``
  columns yields int128 on the ORACLE side while Spark emits BIGINT,
  so the dtype tag in the driver hash diverges at equal values.

This guard closes the failure class ON BOTH SIDES: every
oracle-checked registry query must emit ONLY types both canonicalizers
provably hash the same way — strings, integrals, doubles/floats,
dates, timestamps, booleans — and its ORACLE must resolve (DuckDB
``DESCRIBE``, plan-only) to the matching DuckDB type set (explicitly
excluding HUGEINT and DECIMAL).  Rows-only queries (no oracle) merely
need a resolvable schema.

Schema resolution is plan-only on both engines (no job runs), so
sweeping all ~170 registry entries stays cheap.
"""

import re
import sys
from pathlib import Path

import duckdb
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


# DuckDB types whose pandas canonicalization provably matches the
# Spark set above.  HUGEINT (int128) and DECIMAL are explicitly out —
# both have broken a driver hash at equal values (r05, r03).
_DUCK_SAFE = re.compile(
    r"^(VARCHAR|BIGINT|INTEGER|SMALLINT|TINYINT|DOUBLE|FLOAT|BOOLEAN"
    r"|DATE|TIMESTAMP(_NS| WITH TIME ZONE)?)$"
)


def test_oracle_sql_resolves_only_hash_safe_duckdb_dtypes(sf_dir):
    """DESCRIBE each oracle under DuckDB: the r05 q_pq_adc failure
    (oracle-side HUGEINT from summing sum(BIGINT) columns) was
    invisible to the Spark-side guard above."""
    from open_street_map_data_wrangling_spark.sources.catalog import TABLES

    specs = load_all_queries()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    offenders = {}
    for name, spec in sorted(specs.items()):
        if spec.oracle is None:
            continue
        cols = con.execute(f"DESCRIBE {spec.oracle}").fetchall()
        bad = [
            f"{c[0]}: {c[1]}" for c in cols if not _DUCK_SAFE.match(c[1])
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle SQL must resolve to driver-hashable DuckDB dtypes "
        "(no HUGEINT/DECIMAL — CAST aggregates explicitly); "
        f"offenders: {offenders}"
    )


def test_rows_only_queries_resolve_schemas(spark, sf_dir):
    specs = load_all_queries()
    for name, spec in specs.items():
        if spec.oracle is None:
            fields = spec.spark(spark, sf_dir).schema.fields
            assert fields, f"{name} must resolve a non-empty schema"
