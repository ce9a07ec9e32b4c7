"""Geospatial operators for the OSM domain — geohash + proximity join.

The reference project family reads OSM extracts but never computes
with coordinates; an engine owning OSM data should.  Two primitives,
both pure JVM expressions (no UDF):

* `with_geohash` — standard geohash (lon/lat bit-interleave, base32)
  at precision 8, built from a 32-bit-wide Morton spread (layout.py's
  is 16-bit).  Geohash IS a Z-order curve over (lon, lat), so the
  same write-time clustering + prefix-range file skipping story as
  q_zorder applies to spatial data verbatim: cluster by geohash,
  prune scans by prefix.
* `proximity_pairs` — distance join via the bucketed-candidates
  posture (the spatial twin of LSH banding): each node lands in one
  radius-derived grid cell keyed by quantized (lat, lon) — cells
  cos(lat)-corrected in longitude so a radius circle cannot escape
  the neighborhood; candidates come
  from equi-joining each node's cell against the 3x3 neighborhood of
  the other side (a bounded 9x explode of cell KEYS, not data
  duplication of the big side), then the exact haversine filter runs
  on candidates only.  Never an all-pairs cross join; worst case per
  cell is bounded by local point density, the quantity you actually
  control at ingest (cell size vs radius).

Verification is two-tier.  tests/test_geo.py checks the primitives
against an independent pure-Python replay (reference geohash
implementation + brute-force O(n²) distance check).  The driver
fixtures carry no coordinate columns, so the registered queries
(q_geohash_cells, q_proximity_join) derive DETERMINISTIC synthetic
lat/lon from customer keys via the md5→bigint recipe the dedup
family already proved cross-engine (synth_points): the coordinate
arithmetic is integer-mod then one correctly-rounded double
division, bit-identical in Spark and DuckDB, so the geohash oracle
re-derives the full Morton interleave relationally and the
proximity oracle is an INDEPENDENT brute-force O(n²) join — the
driver hash now re-proves the grid join misses no border pair every
round, not just at pytest time.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.catalog import load_table

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# 32→64-bit interleave spread (x | x<<k) & mask chain; constants are
# the standard Morton masks, all < 2^63 so they are plain BIGINT
# literals in Spark SQL.
_SPREAD32 = (
    (16, 281470681808895),          # 0x0000FFFF0000FFFF
    (8, 71777214294589695),         # 0x00FF00FF00FF00FF
    (4, 1085102592571150095),       # 0x0F0F0F0F0F0F0F0F
    (2, 3689348814741910323),       # 0x3333333333333333
    (1, 6148914691236517205),       # 0x5555555555555555
)


def _spread32_sql(expr: str) -> str:
    e = f"({expr})"
    for n, mask in _SPREAD32:
        e = f"((({e} | shiftleft({e}, {n})) & {mask}))"
    return e


def geohash_int_sql(lat: str, lon: str, bits_per_axis: int = 20) -> str:
    """SQL for the integer geohash (bit-interleaved, lon at even bit
    positions counting from the MSB — the standard layout) of double
    lat/lon columns, 2*bits_per_axis total bits."""
    scale = 1 << bits_per_axis
    top = scale - 1
    qlat = (
        f"least(CAST(floor(({lat} + 90.0) / 180.0 * {scale}) AS BIGINT), {top})"
    )
    qlon = (
        f"least(CAST(floor(({lon} + 180.0) / 360.0 * {scale}) AS BIGINT), {top})"
    )
    return (
        f"({_spread32_sql(qlat)} | "
        f"shiftleft({_spread32_sql(qlon)}, 1))"
    )


def with_geohash(
    df: DataFrame, lat: str = "lat", lon: str = "lon", out: str = "geohash"
) -> DataFrame:
    """Append the precision-8 base32 geohash string (40 bits = 8
    characters) — layout/skipping key for spatial tables."""
    g = geohash_int_sql(lat, lon)
    digits = ", ".join(
        f"substring('{_B32}', CAST((shiftright(__g, {35 - 5 * k}) & 31) "
        "AS INT) + 1, 1)"
        for k in range(8)
    )
    return (
        df.withColumn("__g", F.expr(g))
        .withColumn(out, F.expr(f"concat({digits})"))
        .drop("__g")
    )


_HAVERSINE = (
    "2.0 * 6371000.0 * asin(sqrt("
    "pow(sin(radians({lat2} - {lat1}) / 2), 2) + "
    "cos(radians({lat1})) * cos(radians({lat2})) * "
    "pow(sin(radians({lon2} - {lon1}) / 2), 2)))"
)


def proximity_pairs(
    nodes: DataFrame,
    radius_m: float = 150.0,
    max_abs_lat: float = 66.0,
    wrap_lon: bool = False,
) -> DataFrame:
    """All node pairs (id_a < id_b) within `radius_m` meters:
    candidates from a 3x3 neighbor-cell equi-join on the quantized
    grid, exact haversine on candidates only.

    Cell sizing is the correctness-critical part: a latitude degree
    is ~111 km everywhere, but a LONGITUDE degree shrinks by
    cos(lat) — at 47°N a cell sized for latitude alone is ~32 %
    short and border pairs silently escape the 3x3 neighborhood
    (caught by the brute-force replay test).  Cells are therefore
    radius/111km tall and radius/(111km·cos(max_abs_lat)) wide,
    exact for any data within ±`max_abs_lat` (caller contract —
    polar data needs a latitude-band pre-partition, not this grid).

    Longitude contract: by default cell indices come from
    floor(lon/width) on the raw coordinate and do NOT wrap at ±180°,
    so a pair straddling the antimeridian sits in far-apart cells and
    is silently missed.  City-extract workloads (the reference's
    domain) never span it; global deployments pass ``wrap_lon=True``:
    the cell index becomes pmod(floor((lon+180)/width), n_cells) and
    — the part a bare modulo misses — the ±1 neighbor probe is ALSO
    taken modulo n_cells, so cell 0 and cell n-1 are adjacent and a
    seam-straddling pair meets in one bucket.  The haversine itself
    is wrap-safe unconditionally (sin²(Δλ/2) is invariant under
    Δλ → Δλ ± 360°), so only the bucketing needed the option."""
    lat_cell = radius_m / 111_000.0
    lon_cell = radius_m / (111_000.0 * math.cos(math.radians(max_abs_lat)))
    cx = f"CAST(floor(lat / {lat_cell}) AS BIGINT)"
    if wrap_lon:
        n_lon_cells = math.ceil(360.0 / lon_cell)
        cy = (
            f"pmod(CAST(floor((lon + 180.0) / {lon_cell}) AS BIGINT), "
            f"{n_lon_cells})"
        )
        cy_probe = f"pmod(cyb + dy, {n_lon_cells}) AS cya"
    else:
        cy = f"CAST(floor(lon / {lon_cell}) AS BIGINT)"
        cy_probe = "cyb + dy AS cya"
    left = nodes.selectExpr(
        "id AS id_a", "lat AS lat_a", "lon AS lon_a",
        f"{cx} AS cxa", f"{cy} AS cya",
    )
    right = (
        nodes.selectExpr(
            "id AS id_b", "lat AS lat_b", "lon AS lon_b",
            f"{cx} AS cxb", f"{cy} AS cyb",
        )
        # 9 candidate cell KEYS per right node; the join is then a
        # plain equi-join on (cell_x, cell_y)
        .selectExpr(
            "*",
            "explode(array(-1, 0, 1)) AS dx",
        )
        .selectExpr("*", "explode(array(-1, 0, 1)) AS dy")
        .selectExpr(
            "id_b", "lat_b", "lon_b",
            "cxb + dx AS cxa", cy_probe,
        )
    )
    dist = _HAVERSINE.format(
        lat1="lat_a", lon1="lon_a", lat2="lat_b", lon2="lon_b"
    )
    return (
        left.join(right, ["cxa", "cya"])
        .where(F.col("id_a") < F.col("id_b"))
        .selectExpr(
            "id_a", "id_b", f"CAST(round({dist}, 1) AS DOUBLE) AS dist_m"
        )
        .where(F.col("dist_m") <= radius_m)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Driver-visible queries over synthetic deterministic coordinates
# ---------------------------------------------------------------------------

# ~0.5° x 0.5° box around 40°N / 74°W (a city-extract-sized frame,
# the reference's domain): lat/lon are integer-mod of two disjoint
# md5 windows over the customer key, then ONE correctly-rounded
# double division each — bit-identical in Spark and DuckDB (the
# _MH_H_SQL pairing from dedup.py, proven hash-green since round 2).
_LAT0, _LON0, _COORD_DIV = 40.0, -74.0, 200000.0
_PROX_RADIUS_M = 150.0

_H1_SPARK = "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 1, 10), 16, 10) AS BIGINT)"
_H2_SPARK = "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 11, 10), 16, 10) AS BIGINT)"
_H1_DUCK = "(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 10))::BIGINT)"
_H2_DUCK = "(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 11, 10))::BIGINT)"

_PTS_CTE = f"""
        pts AS MATERIALIZED (
            SELECT c_custkey AS id,
                   {_LAT0} + CAST({_H1_DUCK} % 100000 AS DOUBLE) / {_COORD_DIV} AS lat,
                   {_LON0} + CAST({_H2_DUCK} % 100000 AS DOUBLE) / {_COORD_DIV} AS lon
            FROM customer)"""


def synth_points(cust: DataFrame) -> DataFrame:
    """(id, lat, lon) synthetic point table derived from customer
    keys — deterministic, engine-independent, bounded to the
    ±max_abs_lat contract of proximity_pairs by construction."""
    return cust.selectExpr(
        "c_custkey AS id",
        f"{_LAT0} + CAST({_H1_SPARK} % 100000 AS DOUBLE) / {_COORD_DIV} AS lat",
        f"{_LON0} + CAST({_H2_SPARK} % 100000 AS DOUBLE) / {_COORD_DIV} AS lon",
    )


def _spread32_duck(expr: str) -> str:
    """DuckDB twin of _spread32_sql (operator syntax for the shifts;
    identical masks, identical result on values < 2^40)."""
    e = f"({expr})"
    for n, mask in _SPREAD32:
        e = f"((({e} | ({e} << {n})) & {mask}))"
    return e


def _geohash_duck(lat: str, lon: str, bits_per_axis: int = 20) -> str:
    scale = 1 << bits_per_axis
    top = scale - 1
    qlat = f"least(CAST(floor(({lat} + 90.0) / 180.0 * {scale}) AS BIGINT), {top})"
    qlon = f"least(CAST(floor(({lon} + 180.0) / 360.0 * {scale}) AS BIGINT), {top})"
    g = f"({_spread32_duck(qlat)} | ({_spread32_duck(qlon)} << 1))"
    digits = " || ".join(
        f"substring('{_B32}', CAST(((__g >> {35 - 5 * k}) & 31) AS INT) + 1, 1)"
        for k in range(8)
    )
    return f"SELECT pts.*, {digits} AS geohash FROM (SELECT pts.*, {g} AS __g FROM pts) pts"


@query(
    "q_geohash_cells",
    oracle=f"""
        WITH {_PTS_CTE},
        gh AS ({_geohash_duck("lat", "lon")})
        SELECT substring(geohash, 1, 5) AS cell,
               CAST(count(*) AS BIGINT) AS n_points,
               min(geohash) AS sample_hash
        FROM gh GROUP BY 1
    """,
    tags=("geo", "extension"),
)
def q_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial histogram: precision-8 geohash per synthetic customer
    point, aggregated to precision-5 cells (~4.9 km squares — ~100
    cells over the 0.5° frame).  The oracle re-derives the full
    32-bit Morton interleave + base32 encoding relationally in
    DuckDB, so the driver hash checks every bit of the geohash math,
    not just the aggregate.  At 100 TB the geohash is the write-time
    cluster key: this aggregate is the occupancy audit a layout job
    runs before choosing file split points (layout.py's q_zorder
    story, specialized to spatial data)."""
    pts = synth_points(load_table(spark, sf_dir, "customer"))
    return (
        with_geohash(pts)
        .groupBy(F.expr("substring(geohash, 1, 5)").alias("cell"))
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            F.min("geohash").alias("sample_hash"),
        )
    )


@query(
    "q_proximity_join",
    oracle=f"""
        WITH {_PTS_CTE}
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(round({_HAVERSINE.format(lat1="a.lat", lon1="a.lon", lat2="b.lat", lon2="b.lon")}, 1) AS DOUBLE) AS dist_m
        FROM pts a JOIN pts b ON a.id < b.id
        WHERE CAST(round({_HAVERSINE.format(lat1="a.lat", lon1="a.lon", lat2="b.lat", lon2="b.lon")}, 1) AS DOUBLE) <= {_PROX_RADIUS_M}
    """,
    tags=("geo", "join", "extension"),
)
def q_proximity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All synthetic customer points within 150 m of each other —
    the spatial distance join.  Spark runs the production grid-cell
    3×3 neighbor equi-join (candidates bounded by local density,
    never all-pairs); the DuckDB oracle is deliberately the OPPOSITE
    shape, a brute-force O(n²) cross-check, so a green row proves
    the cos(lat)-corrected cell sizing loses no border pair on this
    frame — the strongest possible differential for a pruning join
    (same discipline as the ANN recall audits: exact twin, not a
    re-derivation of the same shortcut)."""
    pts = synth_points(load_table(spark, sf_dir, "customer"))
    return proximity_pairs(pts, radius_m=_PROX_RADIUS_M)


# ---------------------------------------------------------------------------
# X42 — co-movement (convoy / companion) detection

# Crowd-cell cap, the spatio-temporal analogue of _LSH_BUCKET_CAP: a
# (cell, hour) shared by more than this many users is a crowd (a
# station, a plaza), not a convoy — pairs from it are meaningless and
# their count is quadratic in occupancy, so those cells are excluded
# from pair generation deterministically.
_CONVOY_CELL_CAP = 32
_CONVOY_TOP = 20

# Deterministic synthetic trajectory: the driver fixtures carry no
# positions, so each user's cell at hour h is an md5 of their travel
# GROUP (users travel in parties of 4; every 17th user wanders solo)
# — the same md5→bigint recipe synth_points proved cross-engine,
# giving the detector real convoys to find while the oracle re-derives
# the identical world.
_CELL_SPARK = (
    "CAST(conv(substring(md5(concat('c:', grp, ':', CAST(hr AS STRING))),"
    " 1, 4), 16, 10) AS BIGINT) % 4096"
)
_CELL_DUCK = (
    "('0x' || substr(md5('c:' || grp || ':' || CAST(hr AS VARCHAR)), 1, 4))"
    "::BIGINT % 4096"
)


@query(
    "q_comovement",
    oracle=f"""
        WITH ev AS (
            SELECT user_id,
                   CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
                        AS BIGINT) AS hr,
                   CASE WHEN user_id % 17 = 0
                        THEN 'u' || CAST(user_id AS VARCHAR)
                        ELSE 'g' || CAST(user_id // 4 AS VARCHAR) END AS grp
            FROM events),
        visits AS (
            SELECT DISTINCT user_id, hr, {_CELL_DUCK} AS cell FROM ev),
        occ AS (
            SELECT cell, hr FROM visits GROUP BY cell, hr
            HAVING count(*) <= {_CONVOY_CELL_CAP}),
        kept AS (
            SELECT v.* FROM visits v JOIN occ USING (cell, hr)),
        sizes AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n
            FROM kept GROUP BY user_id),
        shared AS (
            SELECT a.user_id AS ua, b.user_id AS ub,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM kept a JOIN kept b
              ON a.cell = b.cell AND a.hr = b.hr
             AND a.user_id < b.user_id
            GROUP BY 1, 2)
        SELECT ua, ub, n_shared,
               CAST(10000 * n_shared // (sa.n + sb.n - n_shared)
                    AS BIGINT) AS jaccard_x10k
        FROM shared
        JOIN sizes sa ON sa.user_id = ua
        JOIN sizes sb ON sb.user_id = ub
        ORDER BY n_shared DESC, jaccard_x10k DESC, ua ASC, ub ASC
        LIMIT {_CONVOY_TOP}
    """,
    tags=("geo", "extension", "join", "timeseries"),
)
def q_comovement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convoy / companion detection: the top user pairs by number of
    shared (grid cell, hour) visits, with the Jaccard of their visit
    sets — the spatio-temporal co-occurrence join behind
    contact-tracing, convoy mining, and bot-ring detection.

    Scale shape: trajectories collapse to DISTINCT (user, cell, hr)
    visits first; pair generation is an equi self-join keyed on
    (cell, hr) whose worst case is bounded by the crowd-cell cap
    (quadratic-in-occupancy cells are crowds, not convoys — excluded
    deterministically, the LSH bucket-cap posture in space-time); the
    per-user set sizes join back on user id.  Nothing is ever
    all-pairs across users and no row carries more than ids and two
    bigint keys.  The visits relation is checkpointed once and feeds
    all three consumers (occupancy filter, both join sides, sizes)."""
    ev = load_table(spark, sf_dir, "events")
    visits = (
        ev.select(
            "user_id",
            # Floor division (not `div`, which truncates toward zero):
            # DuckDB's `//` floors, and the two disagree on pre-1970
            # timestamps (negative epoch micros).  Subtracting pmod
            # first makes the numerator an exact multiple, so `div`
            # then equals floor for any sign — pure integer, exact.
            F.expr(
                "CAST((unix_micros(ts) - pmod(unix_micros(ts), 3600000000))"
                " div 3600000000 AS BIGINT)"
            ).alias("hr"),
        )
        .withColumn(
            "grp",
            F.expr(
                "CASE WHEN user_id % 17 = 0 "
                "THEN concat('u', CAST(user_id AS STRING)) "
                "ELSE concat('g', CAST(user_id div 4 AS STRING)) END"
            ),
        )
        .withColumn("cell", F.expr(_CELL_SPARK))
        .select("user_id", "hr", "cell")
        .distinct()
        .localCheckpoint(eager=False)
    )
    occ = (
        visits.groupBy("cell", "hr")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") <= _CONVOY_CELL_CAP)
        .select("cell", "hr")
    )
    kept = visits.join(occ, ["cell", "hr"], "left_semi").localCheckpoint(
        eager=False
    )
    sizes = kept.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n")
    )
    a, b = kept.alias("a"), kept.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.hr") == F.col("b.hr"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("ua"), F.col("b.user_id").alias("ub")
        )
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    sa = sizes.select(F.col("user_id").alias("ua"), F.col("n").alias("na"))
    sb = sizes.select(F.col("user_id").alias("ub"), F.col("n").alias("nb"))
    return (
        shared.join(sa, "ua")
        .join(sb, "ub")
        .select(
            "ua",
            "ub",
            "n_shared",
            F.expr(
                "CAST(10000 * n_shared div (na + nb - n_shared) AS BIGINT)"
            ).alias("jaccard_x10k"),
        )
        .orderBy(
            F.desc("n_shared"),
            F.desc("jaccard_x10k"),
            F.asc("ua"),
            F.asc("ub"),
        )
        .limit(_CONVOY_TOP)
    )


# ---------------------------------------------------------------------------
# X93 — persisted spatial grid index + batched radius serving (r12)
#
# q_proximity_join answers "all pairs within r" inline; a deployment
# also serves the other direction — "what is NEAR these N points?" —
# against a corpus ingested long ago.  The persisted form of the
# grid: points parquet partitioned by SUPERBLOCKS of the radius-
# derived cells (block = cell // _GEO_BLOCK — raw cells as partition
# dirs would scatter a large corpus into millions of tiny files; a
# block is still small enough that a 3x3 cell probe touches at most
# 4 blocks), with the exact cell ids riding as data columns.  A
# batch of N query points is answered by ONE scan partition-pruned
# to the union of their probe blocks (PartitionFilters — the spatial
# twin of ivfpq_search_many's union-cell pruning), an equi-join
# against the broadcast 9-cell probe table, and the exact haversine
# on candidates only.

_GEO_BLOCK = 8  # grid cells per partition-dir axis
_PROX_SERVE_RADIUS = 2000.0  # serve-demo radius (meters)
_PROX_SERVE_QIDS = (6, 104, 112)  # fixed demo query points
_GEO_STORE_DDL = (
    "id BIGINT, lat DOUBLE, lon DOUBLE, cx BIGINT, cy BIGINT, "
    "gbx BIGINT, gby BIGINT, __batch INT"
)


def _geo_cells(radius_m: float, max_abs_lat: float = 66.0):
    """(lat_cell, lon_cell) — the proximity_pairs sizing contract
    shared by build and serve so probe cells and stored cells can
    never disagree."""
    return (
        radius_m / 111_000.0,
        radius_m / (111_000.0 * math.cos(math.radians(max_abs_lat))),
    )


def geo_code_points(
    pts: DataFrame,
    radius_m: float = _PROX_SERVE_RADIUS,
    meta: tuple[str, ...] = (),
) -> DataFrame:
    """(id, lat, lon[, meta...], cx, cy, gbx, gby) — the grid/
    superblock projection over ANY point frame, shared by the offline
    build and the streaming maintenance merge so both write
    byte-identical rows (the _bm25_postings convention).  ``meta``
    names metadata columns of ``pts`` that ride IN the index files
    (the X92 codes-file convention) so filtered serving never joins
    back to the source table."""
    lat_cell, lon_cell = _geo_cells(radius_m)
    return pts.selectExpr(
        "id",
        "lat",
        "lon",
        *meta,
        f"CAST(floor(lat / {lat_cell}) AS BIGINT) AS cx",
        f"CAST(floor(lon / {lon_cell}) AS BIGINT) AS cy",
    ).selectExpr(
        "*",
        f"CAST(floor(cx / {_GEO_BLOCK}) AS BIGINT) AS gbx",
        f"CAST(floor(cy / {_GEO_BLOCK}) AS BIGINT) AS gby",
    )


def build_geo_index(
    pts: DataFrame,
    path: str,
    radius_m: float = _PROX_SERVE_RADIUS,
    meta: tuple[str, ...] = (),
) -> None:
    """Persist (id, lat, lon[, meta...], cx, cy) partitioned by the
    cell superblock (gbx, gby) plus the ingest-batch sublevel __batch
    (the ivfpq codes layout: the initial build is batch 0, the
    streaming maintenance job leaf-overwrites its own __batch
    partitions — replay safety from the LAYOUT, no markers).  One
    scan + one partitioned write — the amortized offline step; at
    100 TB this is the same write-time clustering story as the
    geohash/Z-order layout, with the block size keeping file counts
    O(occupied blocks), not O(cells)."""
    coded = geo_code_points(pts, radius_m, meta).withColumn(
        "__batch", F.lit(0)
    )
    # REBALANCE before the partitioned write (r17, guide §6): file
    # count stays O(occupied blocks), not O(write tasks x blocks)
    coded.hint("rebalance", "gbx", "gby", "__batch").write.mode(
        "overwrite"
    ).partitionBy("gbx", "gby", "__batch").parquet(path)


def proximity_search(
    spark: SparkSession,
    store_dir: str,
    points: dict[int, tuple[float, float]],
    radius_m: float = _PROX_SERVE_RADIUS,
    filters: dict[int, int] | None = None,
    meta_col: str = "cat",
) -> DataFrame:
    """Batched radius queries over the PERSISTED grid index: for each
    (qid -> (lat, lon)) query point, every stored point within
    ``radius_m`` (excluding the point whose id equals qid — the
    audit case where queries are corpus rows).  Driver-side: each
    query's 3x3 probe cells and their ≤4 superblocks (pure
    arithmetic).  Engine-side: ONE store scan pruned to the union of
    probe blocks (PartitionFilters), an equi-join against the
    broadcast (qid, cell) probe table, exact haversine on candidates
    only.  Zero scans of the original point table; N queries cost
    one pruned scan instead of N.

    ``filters`` (X106) maps qid -> required ``meta_col`` value.  The
    metadata rides IN the index files (built with
    build_geo_index(meta=...)), nothing statistical derives from the
    scan, so the UNION of requested values pushes into the scan
    (PushedFilters, on top of the PartitionFilters block pruning —
    the X92 vector convention); per-query equality comes from the
    broadcast probe table.  Fails fast on an index built without the
    column — a forced schema would read it as all-NULL and silently
    starve every filtered query (the r12 bm25 ADVICE defect class)."""
    if not points:
        return spark.createDataFrame(
            [], "qid BIGINT, id BIGINT, dist_m DOUBLE"
        )
    if filters is not None and set(filters) - set(points):
        raise ValueError("filters reference unknown qids")
    lat_cell, lon_cell = _geo_cells(radius_m)
    probe_rows, blocks = [], set()
    for qid, (qlat, qlon) in sorted(points.items()):
        cx0 = math.floor(qlat / lat_cell)
        cy0 = math.floor(qlon / lon_cell)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cx, cy = cx0 + dx, cy0 + dy
                probe_rows.append(
                    (int(qid), float(qlat), float(qlon), cx, cy)
                )
                blocks.add((cx // _GEO_BLOCK, cy // _GEO_BLOCK))
    probes = spark.createDataFrame(
        probe_rows, "qid LONG, qlat DOUBLE, qlon DOUBLE, cx LONG, cy LONG"
    )
    block_pred = None
    for bx, by in sorted(blocks):
        cond = (F.col("gbx") == int(bx)) & (F.col("gby") == int(by))
        block_pred = cond if block_pred is None else (block_pred | cond)
    ddl = _GEO_STORE_DDL
    if filters is not None:
        from pyspark.errors import AnalysisException

        try:
            store_cols = spark.read.parquet(store_dir).columns
        except AnalysisException:
            # empty store: no files to infer from, no row to mis-read
            # — the explicit-schema read below returns zero rows
            store_cols = None
        if store_cols is not None and meta_col not in store_cols:
            raise ValueError(
                f"geo index at {store_dir} has no metadata column "
                f"{meta_col!r} — rebuild with build_geo_index(meta=...)"
            )
        ddl = _GEO_STORE_DDL.replace(
            "cx BIGINT", f"{meta_col} BIGINT, cx BIGINT"
        )
    store = spark.read.schema(ddl).parquet(store_dir).filter(block_pred)
    if filters is not None:
        store = store.filter(
            F.col(meta_col).isin(sorted(set(filters.values())))
        )
        fl = spark.createDataFrame(
            sorted((int(q), int(c)) for q, c in filters.items()),
            "qid LONG, __qcat LONG",
        )
        probes = probes.join(F.broadcast(fl), "qid", "left")
    dist = _HAVERSINE.format(
        lat1="qlat", lon1="qlon", lat2="lat", lon2="lon"
    )
    out = store.join(F.broadcast(probes), ["cx", "cy"]).where(
        F.col("id") != F.col("qid")
    )
    if filters is not None:
        out = out.where(
            F.col("__qcat").isNull() | (F.col(meta_col) == F.col("__qcat"))
        )
    return (
        out.selectExpr(
            "qid", "id", f"CAST(round({dist}, 1) AS DOUBLE) AS dist_m"
        )
        .where(F.col("dist_m") <= radius_m)
        .orderBy("qid", "dist_m", "id")
    )


@query(
    "q_proximity_served",
    oracle=f"""
        WITH {_PTS_CTE},
        qp AS (
            SELECT id AS qid, lat AS qlat, lon AS qlon
            FROM pts WHERE id IN {_PROX_SERVE_QIDS}),
        d AS (
            SELECT qp.qid, b.id,
                   CAST(round({_HAVERSINE.format(
                       lat1="qp.qlat", lon1="qp.qlon",
                       lat2="b.lat", lon2="b.lon")}, 1) AS DOUBLE)
                     AS dist_m
            FROM qp JOIN pts b ON b.id <> qp.qid)
        SELECT qid, id, dist_m
        FROM d
        WHERE dist_m <= {_PROX_SERVE_RADIUS}
        ORDER BY qid, dist_m, id
    """,
    tags=("geo", "serve", "batch", "extension"),
)
def q_proximity_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched radius queries SERVED from the persisted spatial grid
    (X93, VERDICT r11 #8): build the superblock-partitioned point
    index once (the amortized offline step), then answer all
    {len(_PROX_SERVE_QIDS)} demo radius queries from the store alone
    — one partition-pruned scan (union of the queries' probe
    blocks), broadcast 9-cell probe table, exact haversine on
    candidates.  The oracle is the deliberate OPPOSITE shape —
    brute-force O(n·q) over every point — so a green row proves the
    cell sizing and the block pruning lose no border point (the
    q_proximity_join differential discipline, now covering the
    PERSISTED layout too).  Query points enter as caller data
    (bounded {len(_PROX_SERVE_QIDS)}-row collect of the synthetic
    points; a real serving tier gets coordinates from the request)."""
    import sys

    from .index_cache import cached

    pts = synth_points(load_table(spark, sf_dir, "customer"))
    path = cached(
        "geo",
        sf_dir,
        ("customer",),
        (sys.modules[__name__],),
        lambda p: build_geo_index(pts, p),
    )
    qrows = {
        int(r["id"]): (float(r["lat"]), float(r["lon"]))
        for r in pts.filter(
            F.col("id").isin(list(_PROX_SERVE_QIDS))
        ).collect()
    }
    return proximity_search(spark, path, qrows)


@query(
    "q_proximity_served_filtered",
    oracle=f"""
        WITH {_PTS_CTE},
        qp AS (
            SELECT id AS qid, lat AS qlat, lon AS qlon
            FROM pts WHERE id IN {_PROX_SERVE_QIDS}),
        d AS (
            SELECT qp.qid, b.id,
                   CAST(round({_HAVERSINE.format(
                       lat1="qp.qlat", lon1="qp.qlon",
                       lat2="b.lat", lon2="b.lon")}, 1) AS DOUBLE)
                     AS dist_m
            FROM qp JOIN pts b
              ON b.id <> qp.qid AND b.id % 7 = (qp.qid + 1) % 7)
        SELECT qid, id, dist_m
        FROM d
        WHERE dist_m <= {_PROX_SERVE_RADIUS}
        ORDER BY qid, dist_m, id
    """,
    tags=("geo", "serve", "batch", "filtered", "extension"),
)
def q_proximity_served_filtered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FILTERED batched radius serving (X106): the filtered
    dimension (X92 vector / X97 lexical / X100 hybrid / X101
    late-interaction) reaches the spatial index — "points within
    2 km of each query, restricted to the query's required
    category".  The category rides IN the index files
    (build_geo_index(meta=("cat",)), the X92 codes-file convention),
    so the serve is still ONE store scan: PartitionFilters prune to
    the union of probe blocks AND the union of requested categories
    pushes into the scan (nothing statistical derives from it —
    radius results are per-point, unlike BM25's corpus-global idf),
    with per-query equality on the broadcast probe table.  The
    oracle brute-forces O(n·q) with the category predicate inline,
    so a green row proves the metadata path loses no border point;
    proximity_search fails fast on a meta-less index rather than
    silently starving (the r12 bm25 ADVICE defect class)."""
    import sys

    from .index_cache import cached

    pts = synth_points(load_table(spark, sf_dir, "customer")).selectExpr(
        "*", "CAST(id % 7 AS BIGINT) AS cat"
    )
    path = cached(
        "geo_cat",
        sf_dir,
        ("customer",),
        (sys.modules[__name__],),
        lambda p: build_geo_index(pts, p, meta=("cat",)),
    )
    qrows = {
        int(r["id"]): (float(r["lat"]), float(r["lon"]))
        for r in pts.filter(
            F.col("id").isin(list(_PROX_SERVE_QIDS))
        ).collect()
    }
    return proximity_search(
        spark,
        path,
        qrows,
        filters={qid: (qid + 1) % 7 for qid in qrows},
    )
