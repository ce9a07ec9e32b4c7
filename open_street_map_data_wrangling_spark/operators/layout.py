"""Z-order (Morton) clustering — multi-dimensional data-skipping
layout.

A 100 TB table is pruned by min/max statistics (parquet row groups,
lakehouse file stats).  Sorting by ONE column gives perfect skipping
on that column and none on any other; interleaving the bits of two
quantized columns gives a single sort key whose contiguous ranges are
small rectangles in BOTH dimensions, so a rectangle predicate touches
O(perimeter) files instead of all of them — the layout trick behind
Delta/Iceberg OPTIMIZE ZORDER, built here from plain integer
expressions (quantize → spread bits with the Morton magic numbers →
interleave), no UDF, no shuffle beyond the final clustering write.

The z-value is pure integer arithmetic after quantization, so the
Spark build and the DuckDB oracle agree bit-for-bit; the one double
step (scaling a measure into its min/max range) is written with the
identical IEEE expression on both sides.

tests/test_layout.py writes the same rows z-clustered and
single-column-sorted and asserts a 2-D box predicate touches a strict
subset of files under z-order while the single-column layout reads
every file for the off-axis dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.catalog import load_table

# Morton spread: 16-bit value -> its bits at even positions of 32.
# (mask, shift) pairs applied high-to-low; constants are the classic
# 0x00FF00FF / 0x0F0F0F0F / 0x33333333 / 0x55555555 in decimal so the
# same literals parse in Spark SQL and DuckDB.
_SPREAD = ((8, 16711935), (4, 252645135), (2, 858993459), (1, 1431655765))


def _spread_sql(expr: str, shift_fmt) -> str:
    """SQL computing the bit-spread of a 16-bit ``expr``;
    ``shift_fmt(e, n)`` renders a left shift in the target dialect."""
    e = f"({expr})"
    for n, mask in _SPREAD:
        e = f"(({e} | {shift_fmt(e, n)}) & {mask})"
    return e


def _spark_shift(e: str, n: int) -> str:
    return f"shiftleft({e}, {n})"


def _duck_shift(e: str, n: int) -> str:
    return f"({e} << {n})"


def zvalue_sql(qx: str, qy: str, shift_fmt) -> str:
    """Interleave two quantized 16-bit columns into one 32-bit Morton
    key: x at even bit positions, y at odd."""
    return (
        f"({_spread_sql(qx, shift_fmt)} | "
        f"{shift_fmt(_spread_sql(qy, shift_fmt), 1)})"
    )


# Quantizers for the q_zorder fixture query (orders): o_orderdate as
# day offsets and o_totalprice in cents, each scaled to [0, 65535]
# with pure integer arithmetic against broadcast min/max scalars.
# floor(x * 100 + 0.5) is the one double op; it is spelled
# identically in both dialects (IEEE-deterministic).
_QDAYS = "CAST((days - mnd) * 65535 div greatest(mxd - mnd, 1) AS BIGINT)"
_QCENTS = "CAST((cents - mnc) * 65535 div greatest(mxc - mnc, 1) AS BIGINT)"
_QDAYS_DUCK = "CAST((days - mnd) * 65535 // greatest(mxd - mnd, 1) AS BIGINT)"
_QCENTS_DUCK = "CAST((cents - mnc) * 65535 // greatest(mxc - mnc, 1) AS BIGINT)"

_ZORDER_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey,
         date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS days,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), rng AS (
  SELECT min(days) AS mnd, max(days) AS mxd,
         min(cents) AS mnc, max(cents) AS mxc
  FROM base
), q AS (
  SELECT o_orderkey,
         {_QDAYS_DUCK} AS qx,
         {_QCENTS_DUCK} AS qy
  FROM base CROSS JOIN rng
)
SELECT CAST({zvalue_sql('qx', 'qy', _duck_shift)} >> 24 AS BIGINT) AS z_bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
FROM q
GROUP BY 1
ORDER BY z_bucket
"""


def with_zvalue(
    df: DataFrame,
    qx: str,
    qy: str,
    out: str = "z",
) -> DataFrame:
    """Append the Morton key of two ALREADY-QUANTIZED (0..65535)
    integer columns — the reusable clustering primitive: follow with
    ``repartitionByRange(n, out)`` + write to lay a table out for
    2-D skipping."""
    return df.withColumn(out, F.expr(zvalue_sql(qx, qy, _spark_shift)))


@query("q_zorder", oracle=_ZORDER_ORACLE, tags=("layout", "scale"))
def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton keys over orders (orderdate-days x totalprice-cents,
    16 bits each): per z-prefix bucket (top 8 bits) row count +
    orderkey checksum.  Exercises the full quantize+interleave
    pipeline over every row with an exact integer oracle; the
    min/max scalars enter as a 1-row broadcast, everything else is
    rowwise at the scan plus one bounded (<=256-key) aggregate."""
    base = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS days",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
    )
    rng = base.selectExpr(
        "min(days) AS mnd",
        "max(days) AS mxd",
        "min(cents) AS mnc",
        "max(cents) AS mxc",
    )
    q = base.crossJoin(F.broadcast(rng)).selectExpr(
        "o_orderkey",
        f"{_QDAYS} AS qx",
        f"{_QCENTS} AS qy",
    )
    z = zvalue_sql("qx", "qy", _spark_shift)
    return (
        q.selectExpr("o_orderkey", f"CAST({z} >> 24 AS BIGINT) AS z_bucket")
        .groupBy("z_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("o_orderkey").cast("bigint").alias("key_checksum"),
        )
        .orderBy("z_bucket")
    )


def optimize_table(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    qx: str,
    qy: str,
    n_files: int,
    analyze_as: str | None = None,
) -> dict:
    """OPTIMIZE-verb maintenance: compact a fragmented table AND
    z-cluster it in one rewrite, optionally registering it with CBO
    statistics — the composed op a lakehouse runs on schedule
    (Delta/Iceberg `OPTIMIZE ... ZORDER BY`), built from this repo's
    audited pieces: one read, one Morton key, one range partition,
    one write.

    ``qx``/``qy`` are already-quantized (0..65535) integer columns.
    Compaction and clustering share the same shuffle: the
    repartitionByRange on the z-key IS the file-count reduction, so
    the data moves once, not twice.  With ``analyze_as`` the result
    is also saved as a managed table and ANALYZEd so the optimizer
    sees real row counts (CBO join ordering — the same lever
    tests/test_scale_patterns.py pins for dimension tables).

    Returns a small audit dict: files before/after, rows.
    """
    import os

    def _count_files(d: str) -> int:
        return len(
            [
                f
                for f in os.listdir(d)
                if f.endswith(".parquet") and not f.startswith("_")
            ]
        )

    src = spark.read.parquet(src_dir)
    rows = src.count()
    files_before = _count_files(src_dir)
    clustered = with_zvalue(src, qx, qy).repartitionByRange(n_files, "z")
    clustered.write.mode("overwrite").parquet(dest_dir)
    if analyze_as:
        spark.read.parquet(dest_dir).write.mode("overwrite").saveAsTable(analyze_as)
        spark.sql(f"ANALYZE TABLE {analyze_as} COMPUTE STATISTICS")
    return {
        "rows": rows,
        "files_before": files_before,
        "files_after": _count_files(dest_dir),
    }


# 3-D Morton: 21-bit values spread to every 3rd bit of 63. The same
# shift/mask cascade as 2-D with the 3-D magic constants (hex:
# 1f00000000ffff, 1f0000ff0000ff, 100f00f00f00f00f, 10c30c30c30c30c3,
# 1249249249249249) in decimal so both SQL dialects parse them.
_SPREAD3 = (
    (32, 8725724278095871),
    (16, 8725728556220671),
    (8, 1157144660301377551),
    (4, 1207822528635744451),
    (2, 1317624576693539401),
)


def _spread3_sql(expr: str, shift_fmt) -> str:
    e = f"(({expr}) & 2097151)"  # clamp to 21 bits
    for n, mask in _SPREAD3:
        e = f"(({e} | {shift_fmt(e, n)}) & {mask})"
    return e


def zvalue3_sql(qx: str, qy: str, qz: str, shift_fmt) -> str:
    """Interleave three quantized 21-bit columns into one 63-bit
    Morton key — the (time, x, y) layout a telemetry or geo-temporal
    table clusters by, so a box predicate on ANY subset of the three
    dimensions skips files."""
    return (
        f"({_spread3_sql(qx, shift_fmt)} | "
        f"{shift_fmt(_spread3_sql(qy, shift_fmt), 1)} | "
        f"{shift_fmt(_spread3_sql(qz, shift_fmt), 2)})"
    )


def with_zvalue3(
    df: DataFrame, qx: str, qy: str, qz: str, out: str = "z3"
) -> DataFrame:
    """Append the 3-D Morton key of three ALREADY-QUANTIZED
    (0..2097151) integer columns; follow with repartitionByRange +
    write, exactly like the 2-D primitive."""
    return df.withColumn(out, F.expr(zvalue3_sql(qx, qy, qz, _spark_shift)))
