"""Equivalence contract for the ``osm_xml`` Python data source.

One parser, two transports: the registered format must return
row-identical relations to parse_osm_xml (the lineSep+mapInPandas
path) for EVERY table, at several partition counts — including byte
ranges that cut mid-element, mid-marker, and inside the XML header —
because the boundary-ownership rule (marker newline in [start, end)
owns the fragment, fragment runs to the next marker) must parse each
element exactly once regardless of where the cuts land.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from open_street_map_data_wrangling_spark.sources.osm_datasource import (
    OsmXmlDataSource,
    _iter_owned,
)
from open_street_map_data_wrangling_spark.sources.osm_xml import (
    _TABLE_SCHEMAS,
    parse_osm_xml,
)
from tests.test_osm_xml import _make_xml


@pytest.fixture(scope="module")
def xml_path(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("osmds") / "extract.osm"
    p.write_text(_make_xml())
    return str(p)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(OsmXmlDataSource)
    return spark


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_datasource_matches_mapinpandas_path(
    registered, xml_path, n_parts
):
    spark = registered
    expected = {
        t: sorted(tuple(r) for r in df.collect())
        for t, df in parse_osm_xml(spark, xml_path).items()
    }
    for t in _TABLE_SCHEMAS:
        got = sorted(
            tuple(r)
            for r in spark.read.format("osm_xml")
            .option("table", t)
            .option("numPartitions", str(n_parts))
            .load(xml_path)
            .collect()
        )
        assert got == expected[t], (t, n_parts)
    assert expected["nodes"], "fixture must parse nodes"
    assert expected["ways_nodes"], "fixture must parse way refs"


def test_byte_ranges_partition_fragments_exactly_once(xml_path):
    """Pure-Python check of the split-alignment rule: for several
    partitionings (including byte counts that land mid-marker), the
    union of owned fragments equals the single-range scan, with no
    duplicates and no losses."""
    import os

    size = os.path.getsize(xml_path)
    whole = list(_iter_owned(xml_path, 0, size))
    assert whole
    for cuts in ([0, size], [0, 1, size], [0, 17, 18, 19, 1021, size],
                 list(range(0, size, 997)) + [size]):
        got = []
        for s, e in zip(cuts, cuts[1:]):
            got.extend(_iter_owned(xml_path, s, e))
        assert got == whole, cuts


def test_unknown_table_and_missing_path_raise(registered, xml_path):
    spark = registered
    with pytest.raises(Exception, match="unknown table"):
        spark.read.format("osm_xml").option("table", "nope").load(
            xml_path
        ).collect()


def test_stream_reader_ingests_file_drops(registered, tmp_path):
    """readStream over the registered format: each micro-batch picks
    up exactly the .osm files dropped since the last offset; after
    two drops the memory sink equals the batch parse of both files,
    and readBetweenOffsets replays a committed range bit-for-bit
    (the restart-recovery contract)."""
    spark = registered
    from open_street_map_data_wrangling_spark.sources.osm_datasource import (
        OsmXmlStreamReader,
    )

    watch = tmp_path / "drops"
    watch.mkdir()
    xml = _make_xml()
    (watch / "a.osm").write_text(xml)

    stream = (
        spark.readStream.format("osm_xml")
        .option("table", "nodes")
        .load(str(watch))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("osm_stream_nodes")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    try:
        q.processAllAvailable()
        n_one = spark.table("osm_stream_nodes").count()
        (watch / "b.osm").write_text(xml)
        q.processAllAvailable()
        n_two = spark.table("osm_stream_nodes").count()
    finally:
        q.stop()
    batch_n = (
        spark.read.format("osm_xml")
        .option("table", "nodes")
        .load(str(watch / "a.osm"))
        .count()
    )
    assert batch_n > 0
    assert n_one == batch_n
    assert n_two == 2 * batch_n

    # deterministic replay from the name-set difference
    r = OsmXmlStreamReader({"path": str(watch), "table": "nodes"})
    start = r.initialOffset()
    rows, end = r.read(start)
    assert sorted(end["files"].split("\n")) == ["a.osm", "b.osm"]
    all_rows = sorted(rows)
    again = sorted(r.readBetweenOffsets(start, end))
    assert again == all_rows
    mid = {"files": "a.osm"}
    only_b = sorted(r.readBetweenOffsets(mid, end))
    assert len(only_b) == batch_n
