"""Driver-contract smoke tests (the surface the verify driver hits)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert len(df.collect()) > 0


def test_queries_and_oracles_consistent(spark):
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert set(osql).issubset(set(qs))
    assert len(qs) >= 45


def test_sinks_roundtrip(spark, sf_dir, tmp_path):
    from open_street_map_data_wrangling_spark.sources.catalog import load_table
    from open_street_map_data_wrangling_spark.sources.sinks import (
        write_csv,
        write_json,
        write_parquet,
    )

    df = load_table(spark, sf_dir, "nation")
    for writer, fmt in ((write_parquet, "parquet"), (write_csv, "csv"), (write_json, "json")):
        path = str(tmp_path / fmt)
        writer(df, path)
        if fmt == "csv":
            back = spark.read.option("header", True).csv(path)
        else:
            back = getattr(spark.read, fmt)(path)
        assert back.count() == df.count()


def test_generate_report(spark, sf_dir):
    from open_street_map_data_wrangling_spark.etl import generate_report

    rpt = generate_report(spark, sf_dir)
    assert rpt["table_counts"]["events"] == 1000
    assert rpt["distinct_users"] > 0
    assert len(rpt["top_users"]) == 10
    assert set(rpt["key_buckets"]) <= {"lower", "lower_colon", "problemchars", "other"}
