"""The reference's complete ETL, end-to-end (SURVEY.md §3.1 EP1+EP2).

data.py::process_map + audit.py in one distributed pipeline:

    OSM XML ──parse──▶ 5 shaped relations
             ──audit──▶ street-type variants report
             ──clean──▶ mapping-table street rewrite, postcode core
             ──validate──▶ reject counts
             ──write──▶ parquet per table (the CSV-per-table analog)

Every stage is the operator already proven in the inventory
(sources/osm_xml.py, operators/cleaning.py); this module only
composes them, which is the point: the reference's monolithic script
becomes a composition of verified relational pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.cleaning import STREET_MAPPING
from .sources.osm_xml import parse_osm_xml
from .sources.sinks import write_parquet

EXPECTED_STREET_TYPES = ("Street", "Road", "Avenue", "Boulevard", "Lane", "Drive")


def audit_street_types(nodes_tags: DataFrame) -> DataFrame:
    """audit.py::audit - distinct (street_type, name) variants whose
    last token is not an expected street type."""
    street = nodes_tags.filter((F.col("type") == "addr") & (F.col("key") == "street"))
    stype = F.regexp_extract(
        F.regexp_replace(F.col("value"), r"\.$", ""), r"([^ ]+)$", 1
    )
    return (
        street.select(stype.alias("street_type"), F.col("value").alias("name"))
        .filter(~F.col("street_type").isin(*EXPECTED_STREET_TYPES))
        .distinct()
    )


def clean_street_names(tags: DataFrame, spark: SparkSession) -> DataFrame:
    """update_name as a broadcast mapping join over the street rows;
    non-street rows pass through unchanged."""
    mapping = spark.createDataFrame(
        [("St", "Street"), ("St.", "Street"), ("Ave", "Avenue"), ("Ave.", "Avenue"),
         ("Rd", "Road"), ("Rd.", "Road"), ("Blvd", "Boulevard"), ("Ln", "Lane"),
         ("Dr", "Drive")],
        "raw string, clean string",
    )
    is_street = (F.col("type") == "addr") & (F.col("key") == "street")
    last = F.regexp_extract(F.col("value"), r"([^ ]+)$", 1)
    tagged = tags.withColumn("__last", F.when(is_street, last))
    joined = tagged.join(F.broadcast(mapping), F.col("__last") == F.col("raw"), "left")
    cleaned = F.when(
        F.col("clean").isNotNull(),
        F.concat(F.regexp_replace(F.col("value"), r"[^ ]+$", ""), F.col("clean")),
    ).otherwise(F.col("value"))
    return joined.select("id", "key", cleaned.alias("value"), "type")


def validate(nodes: DataFrame) -> DataFrame:
    """validate_element: typed constraints -> accept/reject counts."""
    ok = (
        F.col("id").isNotNull()
        & F.col("lat").between(-90.0, 90.0)
        & F.col("lon").between(-180.0, 180.0)
        & F.col("uid").isNotNull()
    )
    return nodes.select(ok.alias("ok")).groupBy("ok").count()


def run_osm_etl(spark: SparkSession, xml_path: str, out_dir: str) -> list[str]:
    """process_map: parse, audit, clean, validate, write. Returns a
    human-readable report (the reference printed its audit dict)."""
    tables = parse_osm_xml(spark, xml_path)
    report: list[str] = []

    variants = audit_street_types(tables["nodes_tags"]).collect()
    report.append(f"street-type variants flagged: {len(variants)}")
    for r in sorted(variants, key=lambda r: (r.street_type, r.name))[:20]:
        report.append(f"  {r.street_type}: {r.name}")

    cleaned_tags = {
        "nodes_tags": clean_street_names(tables["nodes_tags"], spark),
        "ways_tags": clean_street_names(tables["ways_tags"], spark),
    }

    for r in validate(tables["nodes"]).collect():
        report.append(f"nodes valid={r.ok}: {r['count']}")

    for name in ("nodes", "ways", "ways_nodes"):
        write_parquet(tables[name], f"{out_dir}/{name}.parquet")
    for name, df in cleaned_tags.items():
        write_parquet(df, f"{out_dir}/{name}.parquet")
    for name in ("nodes", "nodes_tags", "ways", "ways_tags", "ways_nodes"):
        n = spark.read.parquet(f"{out_dir}/{name}.parquet").count()
        report.append(f"wrote {name}: {n} rows")
    return report


def generate_report(spark: SparkSession, sf_dir: str) -> dict:
    """EP3's final artifact: the reference's case-study report numbers
    (element counts, distinct contributors, top contributors, top
    categories) computed in one place from the registered queries —
    the engine's analog of the README the project family publishes."""
    from .plans import load_all_queries

    specs = load_all_queries()

    def rows(name):
        return [tuple(r) for r in specs[name].spark(spark, sf_dir).collect()]

    return {
        "table_counts": dict((t, n) for t, n in rows("q_count")),
        "distinct_users": rows("q_distinct_users")[0][0],
        "one_time_users": rows("q_onetime_users")[0][0],
        "top_users": rows("q_top_users"),
        "top_categories": rows("q_top_amenities"),
        "key_buckets": dict((b, n) for b, n in rows("q_keybuckets")),
    }
