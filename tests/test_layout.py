"""Z-order layout: the clustering must actually buy 2-D skipping.

Writes the same rows twice — z-clustered and single-column-sorted —
into 16 range-partitioned files each, then measures which files
contain rows matching a box predicate (via input_file_name on the
filtered scan: file-level locality is a property of the LAYOUT, the
same one lakehouse min/max stats prune by).  The single-column
layout must read every file for an off-axis predicate; z-order must
touch a strict subset of files for the same box on either axis.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pytest
from pyspark.sql import functions as F

from open_street_map_data_wrangling_spark.operators.layout import with_zvalue

N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    # 64x64 grid, one row per cell: every (qx, qy) box is exactly
    # representable, no sampling noise
    base = (
        spark.range(64 * 64)
        .selectExpr("id", "CAST(id % 64 AS BIGINT) AS gx", "CAST(id div 64 AS BIGINT) AS gy")
        # scale grid coords into the 16-bit domain the primitive expects
        .selectExpr("id", "gx", "gy", "gx * 1024 AS qx", "gy * 1024 AS qy")
    )
    zdir = str(tmp_path_factory.mktemp("zorder"))
    xdir = str(tmp_path_factory.mktemp("xsort"))
    with_zvalue(base, "qx", "qy").repartitionByRange(N_FILES, "z").write.mode(
        "overwrite"
    ).parquet(zdir)
    base.repartitionByRange(N_FILES, "qx").write.mode("overwrite").parquet(xdir)
    return zdir, xdir


def _files_touched(spark, path, predicate) -> int:
    df = spark.read.parquet(path).filter(predicate)
    return df.select(F.input_file_name()).distinct().count()


def _total_files(spark, path) -> int:
    return (
        spark.read.parquet(path).select(F.input_file_name()).distinct().count()
    )


def test_zorder_skips_on_both_axes(spark, layouts):
    zdir, xdir = layouts
    total = _total_files(spark, zdir)
    assert total == N_FILES
    box_y = "gy >= 8 AND gy < 16"  # off-axis for the x-sorted layout
    box_x = "gx >= 8 AND gx < 16"
    # single-column sort: perfect on its own axis, useless off-axis
    assert _files_touched(spark, xdir, box_y) == N_FILES
    assert _files_touched(spark, xdir, box_x) <= N_FILES // 4
    # z-order: strict subset of files on EITHER single axis...
    z_y = _files_touched(spark, zdir, box_y)
    z_x = _files_touched(spark, zdir, box_x)
    assert z_y <= N_FILES // 2
    assert z_x <= N_FILES // 2
    # ...and a small 2-D box touches only a few files
    z_box = _files_touched(spark, zdir, f"{box_x} AND {box_y}")
    assert z_box <= N_FILES // 4


def test_zvalue_is_a_space_filling_curve(spark):
    """Adjacent z-values differ in exactly one grid step: decoding the
    interleave recovers the quantized inputs (round-trip check over
    the whole 16-bit-domain corner set)."""
    pts = [(x, y) for x in (0, 1, 255, 65535) for y in (0, 1, 255, 65535)]
    df = spark.createDataFrame(pts, "qx bigint, qy bigint")
    rows = with_zvalue(df, "qx", "qy").collect()
    for r in rows:
        z = r["z"]
        dx = sum(((z >> (2 * b)) & 1) << b for b in range(16))
        dy = sum(((z >> (2 * b + 1)) & 1) << b for b in range(16))
        assert (dx, dy) == (r["qx"], r["qy"])


def test_optimize_table_compacts_and_clusters(spark, tmp_path):
    """One rewrite must do both maintenance jobs: file count drops to
    the target AND the layout becomes 2-D-skippable (a y-axis box no
    longer touches every file), with rows preserved and CBO stats
    registered."""
    from open_street_map_data_wrangling_spark.operators.layout import optimize_table

    frag = str(tmp_path / "fragmented")
    opt = str(tmp_path / "optimized")
    base = (
        spark.range(64 * 64)
        .selectExpr("id", "CAST(id % 64 AS BIGINT) AS gx", "CAST(id div 64 AS BIGINT) AS gy")
        .selectExpr("id", "gx", "gy", "gx * 1024 AS qx", "gy * 1024 AS qy")
    )
    base.repartition(32).write.mode("overwrite").parquet(frag)

    audit = optimize_table(
        spark, frag, opt, "qx", "qy", n_files=8, analyze_as="opt_table_test"
    )
    assert audit["rows"] == 64 * 64
    assert audit["files_before"] >= 32
    assert audit["files_after"] == 8
    assert spark.read.parquet(opt).count() == 64 * 64
    touched = (
        spark.read.parquet(opt)
        .filter("gy >= 8 AND gy < 16")
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert touched <= 4  # fragmented-by-id layout would touch all 8
    stats = spark.sql("DESCRIBE EXTENDED opt_table_test").collect()
    assert any("Statistics" in r["col_name"] for r in stats)
    spark.sql("DROP TABLE IF EXISTS opt_table_test")


def test_zvalue3_is_a_bijection(spark):
    """The 3-D interleave decodes back to its inputs over the corner
    set and a pseudo-random sample of the 21-bit domain."""
    from open_street_map_data_wrangling_spark.operators.layout import with_zvalue3

    corners = [0, 1, 255, 2097151]
    pts = [(x, y, z) for x in corners for y in corners for z in corners]
    # deterministic pseudo-random triples (LCG — no RNG state in tests)
    seed = 1234567
    for _ in range(200):
        seed = (seed * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        pts.append(
            (seed % 2097152, (seed >> 21) % 2097152, (seed >> 42) % 2097152)
        )
    df = spark.createDataFrame(pts, "qx bigint, qy bigint, qz bigint")
    for r in with_zvalue3(df, "qx", "qy", "qz").collect():
        z = r["z3"]
        d = [0, 0, 0]
        for axis in range(3):
            d[axis] = sum(((z >> (3 * b + axis)) & 1) << b for b in range(21))
        assert (d[0], d[1], d[2]) == (r["qx"], r["qy"], r["qz"])
