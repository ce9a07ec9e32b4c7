"""Engine CLI.

    python -m open_street_map_data_wrangling_spark list
        Print the query inventory (name, oracle-checked?, doc line).

    python -m open_street_map_data_wrangling_spark run q_star_join [sf_dir]
        Run one query and show its result.

    python -m open_street_map_data_wrangling_spark etl <xml> <out_dir>
        Run the reference's full OSM ETL: parse XML -> clean -> write
        the five shaped parquet tables + an audit report.

    python -m open_street_map_data_wrangling_spark explain q_name [sf_dir]
        Print the optimized + physical plan (explain "formatted") —
        the per-operator audit loop PLANS.md is built from.
"""

from __future__ import annotations

import sys

from .plans import load_all_queries
from .session import get_spark


def _list() -> None:
    specs = load_all_queries()
    for name in sorted(specs):
        spec = specs[name]
        mode = "oracle" if spec.oracle else "rows-only"
        doc = (spec.doc or "").strip().splitlines()[0] if spec.doc else ""
        print(f"{name:24s} [{mode}] {doc}")
    print(f"\n{len(specs)} queries")


def _run(name: str, sf_dir: str) -> None:
    specs = load_all_queries()
    if name not in specs:
        sys.exit(f"unknown query {name!r}; see `list`")
    spark = get_spark("osmdw-cli")
    specs[name].spark(spark, sf_dir).show(50, truncate=False)
    spark.stop()


def _explain(name: str, sf_dir: str) -> None:
    specs = load_all_queries()
    if name not in specs:
        sys.exit(f"unknown query {name!r}; see `list`")
    spark = get_spark("osmdw-explain")
    specs[name].spark(spark, sf_dir).explain("formatted")
    spark.stop()


def _etl(xml_path: str, out_dir: str) -> None:
    from .etl import run_osm_etl

    spark = get_spark("osmdw-etl")
    report = run_osm_etl(spark, xml_path, out_dir)
    for line in report:
        print(line)
    spark.stop()


def main(argv: list[str]) -> None:
    if not argv or argv[0] == "list":
        _list()
    elif argv[0] == "run" and len(argv) >= 2:
        _run(argv[1], argv[2] if len(argv) > 2 else "/root/testdata/sf0.001")
    elif argv[0] == "explain" and len(argv) >= 2:
        _explain(argv[1], argv[2] if len(argv) > 2 else "/root/testdata/sf0.001")
    elif argv[0] == "etl" and len(argv) == 3:
        _etl(argv[1], argv[2])
    else:
        sys.exit(__doc__)


if __name__ == "__main__":
    main(sys.argv[1:])
