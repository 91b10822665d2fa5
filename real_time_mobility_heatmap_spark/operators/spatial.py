"""Spatial range join via grid bucketing (SURVEY.md §2.11 extension).

The generic form of "which region contains this point" is a theta join
(``point BETWEEN bbox bounds``) — in Spark that plans as a
BroadcastNestedLoopJoin (fine for small region tables) or, with two large
sides, a cartesian product: the one join shape that cannot scale. The
100 TB-safe plan bucketizes BOTH sides onto the engine's uniform grid
(functions/grid.py): each zone explodes into the grid cells its bbox
covers, points snap to their cell, and the join becomes a plain equi-join
on cell_id followed by the exact bbox predicate on the (tiny) candidate
set. Shuffle volume is |points| + |zones x covered cells|, per-point
fanout is the number of zones overlapping one cell — never |points| x
|zones|.

The zone table is derived deterministically from the TPC-H ``nation``
fixture (25 overlapping bboxes tiling the ping area), so the DuckDB
oracle can reproduce the whole pipeline — including the plain theta-join
formulation the equi-join must agree with.

Speed sums use exact integer micro-km/h (see latest.recent_tiles_merged)
so cross-engine summation order cannot flip the rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..functions.grid import cell_id
from ..functions.rounding import micro_units
from ..operators.validate import VALID_SQL, validate_pings
from ..sources.tables import PINGS_ORACLE_SQL, load_table, pings_from_events

# deterministic 5x5 zone layout over the ping area (lat 42..43, lon -72..-71);
# spans exceed the 0.2-degree pitch so neighboring zones overlap and points
# can fall in multiple zones (a real containment join, not a partition)
ZONE_LAT_SPAN = 0.24
ZONE_LON_SPAN = 0.28

_LAT0 = "CAST(42.0 AS DOUBLE) + (n_nationkey % 5) * CAST(0.2 AS DOUBLE)"
# floor(x / 5), not x // 5: `//` is not Spark SQL, and DuckDB's `/` on
# integers is double division too, so this fragment is exact in both
_LON0 = "CAST(-72.0 AS DOUBLE) + floor(n_nationkey / 5) * CAST(0.2 AS DOUBLE)"


def zones_from_nation(nation: DataFrame) -> DataFrame:
    """nation -> deterministic bbox zone table (zone_key, zone_name, bbox)."""
    return nation.select(
        F.col("n_nationkey").alias("zone_key"),
        F.col("n_name").alias("zone_name"),
        F.expr(_LAT0).alias("lat0"),
        (F.expr(_LAT0) + F.lit(ZONE_LAT_SPAN)).alias("lat1"),
        F.expr(_LON0).alias("lon0"),
        (F.expr(_LON0) + F.lit(ZONE_LON_SPAN)).alias("lon1"),
    )


def zone_covering_cells(zones: DataFrame, scale: int) -> DataFrame:
    """Explode each zone bbox into the grid cells it covers.

    The cover is conservative (floor on both ends, inclusive): candidate
    cells may stick out past the bbox edge — the exact predicate after
    the equi-join trims them. Fanout per zone is
    O(span_lat*scale x span_lon*scale), independent of the point count.
    """
    s = F.lit(scale)
    y = F.explode(
        F.sequence(F.floor(F.col("lat0") * s), F.floor(F.col("lat1") * s))
    ).alias("cy")
    with_y = zones.select("*", y)
    x = F.explode(
        F.sequence(F.floor(F.col("lon0") * s), F.floor(F.col("lon1") * s))
    ).alias("cx")
    return with_y.select("*", x).select(
        F.concat(F.col("cy").cast("string"), F.lit(":"), F.col("cx").cast("string")).alias("cell_id"),
        "zone_key",
        "zone_name",
        "lat0",
        "lat1",
        "lon0",
        "lon1",
    )


def zone_counts(pings: DataFrame, nation: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Per-zone ping stats via the bucketed containment join.

    Plan shape: snap points to cells (pure column math) -> equi-join on
    cell_id against the exploded zone cover (broadcast: the cover is
    |zones| x tens of cells) -> exact bbox filter -> hash aggregate on
    zone. No nested-loop join anywhere; at 100 TB the only large-side
    cost is one pass over the points and an aggregate keyed by zone.
    """
    p = validate_pings(pings).withColumn(
        "cell_id", cell_id(F.col("lat"), F.col("lon"), cfg.grid_scale)
    )
    cover = zone_covering_cells(zones_from_nation(nation), cfg.grid_scale)
    matched = p.join(F.broadcast(cover), "cell_id").filter(
        (F.col("lat") >= F.col("lat0"))
        & (F.col("lat") < F.col("lat1"))
        & (F.col("lon") >= F.col("lon0"))
        & (F.col("lon") < F.col("lon1"))
    )
    micro = micro_units("speedKmh")
    return matched.groupBy("zone_key", "zone_name").agg(
        F.count(F.lit(1)).alias("n_pings"),
        F.count_distinct("vehicleId").alias("n_vehicles"),
        F.round(F.sum(micro) / F.lit(1e6) / F.count("speedKmh"), 6).alias("avg_speed_kmh"),
    )


ZONE_COUNTS_ORACLE = f"""
    WITH pings AS ({PINGS_ORACLE_SQL}),
    valid AS (SELECT * FROM pings WHERE {VALID_SQL}),
    zones AS (
        SELECT n_nationkey AS zone_key,
               n_name AS zone_name,
               {_LAT0} AS lat0,
               {_LAT0} + {ZONE_LAT_SPAN} AS lat1,
               {_LON0} AS lon0,
               {_LON0} + {ZONE_LON_SPAN} AS lon1
        FROM nation
    )
    SELECT zone_key, zone_name,
           count(*) AS n_pings,
           count(DISTINCT vehicleId) AS n_vehicles,
           round(sum(TRY_CAST(round(speedKmh * 1e6) AS BIGINT)) / 1e6 / count(speedKmh), 6)
               AS avg_speed_kmh
    FROM valid v
    JOIN zones z
      ON v.lat >= z.lat0 AND v.lat < z.lat1
     AND v.lon >= z.lon0 AND v.lon < z.lon1
    GROUP BY zone_key, zone_name
"""


def q_zone_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zone_counts(
        pings_from_events(spark, sf_dir), load_table(spark, sf_dir, "nation")
    )


# --------------------------------------------------------------------------
# Z-order (Morton) data-layout report
# --------------------------------------------------------------------------

# 8 bits per axis over the ping area -> 16-bit Morton key; 32 "files" model
# the write partitioning a layout job would produce at any scale.
_Z_BITS = 8
_Z_FILES = 32
_Z_KEYSPACE = 1 << (2 * _Z_BITS)  # 65536


def _axis_sql(expr: str, origin: float) -> str:
    """Snap a coordinate to an integer 0..255 axis index — identical SQL in
    Spark and DuckDB (floor of double math, then clamp)."""
    hi = (1 << _Z_BITS) - 1
    return (
        f"CAST(least({hi}, greatest(0, "
        f"floor(({expr} - CAST({origin} AS DOUBLE)) * {1 << _Z_BITS}))) AS BIGINT)"
    )


def _zkey_sql(ix: str, iy: str, idiv: str) -> str:
    """Bit-interleave two axis indices into a Morton key using only integer
    div/mod arithmetic (``idiv`` = 'div' for Spark, '//' for DuckDB) so both
    engines compute bit-identical keys without engine-specific bit operators."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(({ix} {idiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({iy} {idiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def zorder_layout_report(pings: DataFrame) -> DataFrame:
    """Data-layout diagnostic: how much scan pruning a Z-order (Morton)
    clustered file layout buys over ingestion-order (round-robin) files.

    At 100 TB the dominant cost of a spatial query is which files its bbox
    predicate can SKIP via min/max column statistics. This report assigns
    every ping to a file under two layouts — ``zorder`` (contiguous Morton
    ranges, what ``writeTo().sortedBy(zkey)`` or a compaction job produces)
    and ``roundrobin`` (event_id % files, i.e. arrival order) — and
    measures, per layout, the average/maximum per-file bounding-box
    footprint and its share of the key space (``avg_bbox_ppm``): the
    fraction of files a random small bbox query must read. Z-order files
    cover tiny tight bboxes (skippable); arrival-order files each span the
    whole area (nothing prunes).

    All post-snap arithmetic is integer (Morton keys, spans, ppm by integer
    div), so the report hash-matches the oracle exactly. Shape: one scan,
    a 2x row explode (stack), one (layout, file) aggregate, one per-layout
    aggregate — diagnostics run at full scale or on a sample, either way
    shuffle rows = 2 x pings collapsing to 2 x files.
    """
    ix, iy = _axis_sql("lat", 42.0), _axis_sql("lon", -72.0)
    snapped = pings.select(
        F.expr(ix).alias("ix"),
        F.expr(iy).alias("iy"),
        F.col("event_id"),
    ).withColumn("zkey", F.expr(_zkey_sql("ix", "iy", "div")))
    per_file_span = _Z_KEYSPACE // _Z_FILES
    assigned = snapped.select(
        "ix",
        "iy",
        F.expr(
            f"stack(2, 'zorder', zkey div {per_file_span}, "
            f"'roundrobin', event_id % {_Z_FILES}) AS (layout, file_id)"
        ),
    )
    per_file = assigned.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        ((F.max("ix") - F.min("ix") + 1) * (F.max("iy") - F.min("iy") + 1)).alias(
            "bbox_area"
        ),
    )
    cells_total = _Z_KEYSPACE
    return per_file.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.expr("sum(bbox_area) div count(*)").alias("avg_bbox_area"),
        F.max("bbox_area").alias("max_bbox_area"),
        F.expr(f"sum(bbox_area) * 1000000 div (count(*) * {cells_total})").alias(
            "avg_bbox_ppm"
        ),
    )


def zorder_layout_report_oracle() -> str:
    ix, iy = _axis_sql("lat", 42.0), _axis_sql("lon", -72.0)
    zkey = _zkey_sql("ix", "iy", "//")
    per_file_span = _Z_KEYSPACE // _Z_FILES
    return f"""
        WITH pings AS ({PINGS_ORACLE_SQL}),
        snapped AS (
            SELECT {ix} AS ix, {iy} AS iy, event_id FROM pings
        ),
        keyed AS (SELECT ix, iy, event_id, {zkey} AS zkey FROM snapped),
        assigned AS (
            SELECT 'zorder' AS layout, zkey // {per_file_span} AS file_id, ix, iy
            FROM keyed
            UNION ALL
            SELECT 'roundrobin' AS layout, event_id % {_Z_FILES} AS file_id, ix, iy
            FROM keyed
        ),
        per_file AS (
            SELECT layout, file_id, count(*) AS n_rows,
                   (max(ix) - min(ix) + 1) * (max(iy) - min(iy) + 1) AS bbox_area
            FROM assigned GROUP BY layout, file_id
        )
        SELECT layout,
               count(*) AS n_files,
               CAST(sum(bbox_area) AS BIGINT) // count(*) AS avg_bbox_area,
               max(bbox_area) AS max_bbox_area,
               CAST(sum(bbox_area) * 1000000 AS BIGINT)
                   // (count(*) * {_Z_KEYSPACE}) AS avg_bbox_ppm
        FROM per_file
        GROUP BY layout
    """


def q_zorder_layout_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zorder_layout_report(pings_from_events(spark, sf_dir))


COMPACT_FILE_KEY = 64      # rows sharing l_orderkey div KEY form one "file"
COMPACT_TARGET_ROWS = 4000  # compacted output size target (row proxy for bytes)


def compaction_plan(lineitem: DataFrame) -> DataFrame:
    """Small-files compaction planner — the maintenance job that turns a
    fragmented table (many under-sized files from streaming appends /
    over-parallel writes) into target-sized outputs, completing the
    data-layout family (zorder_layout_report = WHAT order to write,
    partition_pruned_stats = WHAT directories, this = WHICH files merge).

    The file inventory is derived deterministically (order-key ranges as
    file proxies, row counts as size proxies). The plan is sorted-fill
    bin packing: files ordered size-DESC (id tie-break), running-sum
    assigned to bins of ``COMPACT_TARGET_ROWS`` — the greedy one-pass
    assignment real compactors (Delta OPTIMIZE-style) use. The global
    window runs over the FILE inventory, which is orders of magnitude
    smaller than the table (the `value_histogram` cardinality argument);
    the row data itself never shuffles — a real run would then rewrite
    each bin's files in one task.
    """
    from pyspark.sql import Window

    files = (
        lineitem.groupBy(
            F.expr(f"l_orderkey div {COMPACT_FILE_KEY}").alias("file_id")
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    w = Window.orderBy(F.desc("n_rows"), F.asc("file_id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    planned = files.withColumn("cum_rows", F.sum("n_rows").over(w)).withColumn(
        "bin_id", F.expr(f"(cum_rows - n_rows) div {COMPACT_TARGET_ROWS}")
    )
    per_bin = Window.partitionBy("bin_id")
    return planned.select(
        "file_id",
        "n_rows",
        "bin_id",
        F.sum("n_rows").over(per_bin).alias("bin_rows"),
        F.count(F.lit(1)).over(per_bin).alias("n_bin_files"),
    )


COMPACTION_PLAN_ORACLE = f"""
    WITH files AS (
        SELECT l_orderkey // {COMPACT_FILE_KEY} AS file_id, count(*) AS n_rows
        FROM lineitem GROUP BY 1
    ),
    planned AS (
        SELECT file_id, n_rows,
               sum(n_rows) OVER (ORDER BY n_rows DESC, file_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rows
        FROM files
    ),
    binned AS (
        SELECT file_id, n_rows,
               CAST((cum_rows - n_rows) // {COMPACT_TARGET_ROWS} AS BIGINT) AS bin_id
        FROM planned
    )
    SELECT file_id, n_rows, bin_id,
           CAST(sum(n_rows) OVER (PARTITION BY bin_id) AS BIGINT) AS bin_rows,
           count(*) OVER (PARTITION BY bin_id) AS n_bin_files
    FROM binned
"""


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compaction_plan(load_table(spark, sf_dir, "lineitem"))


# Inscribed-pentagon vertices as (lat, lon) fractions of the zone bbox —
# plan literals, identical in both engines.
PENT_VERTS = [(1.0, 0.5), (0.65, 1.0), (0.1, 0.8), (0.1, 0.2), (0.65, 0.0)]
PENT_EDGES = [
    (PENT_VERTS[i], PENT_VERTS[(i + 1) % len(PENT_VERTS)])
    for i in range(len(PENT_VERTS))
]


def _crossing_terms(y0: str, x0: str, lat: str = "lat", lon: str = "lon") -> list[str]:
    """Ray-cast crossing test per pentagon edge (ray toward +lon), one SQL
    term per edge; identical text in Spark and DuckDB dialects. Vertex
    coordinates are ``bbox origin + fraction * span`` so every operand is
    a column or a literal double."""
    terms = []
    for (a1, b1), (a2, b2) in PENT_EDGES:
        y1 = f"({y0} + {a1!r} * {ZONE_LAT_SPAN!r})"
        y2 = f"({y0} + {a2!r} * {ZONE_LAT_SPAN!r})"
        x1 = f"({x0} + {b1!r} * {ZONE_LON_SPAN!r})"
        x2 = f"({x0} + {b2!r} * {ZONE_LON_SPAN!r})"
        terms.append(
            f"(CASE WHEN (({y1} > {lat}) != ({y2} > {lat}))"
            f" AND {lon} < {x1} + ({lat} - {y1}) * ({x2} - {x1}) / ({y2} - {y1})"
            f" THEN 1 ELSE 0 END)"
        )
    return terms


def polygon_zone_counts(
    pings: DataFrame, nation: DataFrame, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """TRUE polygon containment (the ST_Contains shape): per-zone stats
    for points inside an irregular pentagon inscribed in each zone bbox,
    by even-odd ray casting — upgrading ``zone_counts``'s rectangles to
    real polygon geometry with the SAME scale plan.

    Candidates still come from the grid-bucketed bbox cover (broadcast
    equi-join on cell_id, no nested loop); the ray-cast is a pure column
    expression over plan-literal edge fractions — zero extra joins or
    shuffles for the exact geometry test. Identical IEEE expressions on
    both engines make the crossing parity engine-deterministic.
    """
    p = validate_pings(pings).withColumn(
        "cell_id", cell_id(F.col("lat"), F.col("lon"), cfg.grid_scale)
    )
    cover = zone_covering_cells(zones_from_nation(nation), cfg.grid_scale)
    cand = p.join(F.broadcast(cover), "cell_id").filter(
        (F.col("lat") >= F.col("lat0"))
        & (F.col("lat") < F.col("lat1"))
        & (F.col("lon") >= F.col("lon0"))
        & (F.col("lon") < F.col("lon1"))
    )
    crossings = " + ".join(_crossing_terms("lat0", "lon0"))
    inside = cand.filter(F.expr(f"(({crossings}) % 2) = 1"))
    micro = micro_units("speedKmh")
    return inside.groupBy("zone_key", "zone_name").agg(
        F.count(F.lit(1)).alias("n_pings"),
        F.count_distinct("vehicleId").alias("n_vehicles"),
        F.round(F.sum(micro) / F.lit(1e6) / F.count("speedKmh"), 6).alias(
            "avg_speed_kmh"
        ),
    )


def polygon_zone_counts_oracle() -> str:
    crossings = " + ".join(_crossing_terms("z.lat0", "z.lon0", "v.lat", "v.lon"))
    return f"""
    WITH pings AS ({PINGS_ORACLE_SQL}),
    valid AS (SELECT * FROM pings WHERE {VALID_SQL}),
    zones AS (
        SELECT n_nationkey AS zone_key,
               n_name AS zone_name,
               {_LAT0} AS lat0,
               {_LAT0} + {ZONE_LAT_SPAN} AS lat1,
               {_LON0} AS lon0,
               {_LON0} + {ZONE_LON_SPAN} AS lon1
        FROM nation
    )
    SELECT zone_key, zone_name,
           count(*) AS n_pings,
           count(DISTINCT vehicleId) AS n_vehicles,
           round(sum(TRY_CAST(round(speedKmh * 1e6) AS BIGINT)) / 1e6 / count(speedKmh), 6)
               AS avg_speed_kmh
    FROM valid v
    JOIN zones z
      ON v.lat >= z.lat0 AND v.lat < z.lat1
     AND v.lon >= z.lon0 AND v.lon < z.lon1
     AND (({crossings}) % 2) = 1
    GROUP BY zone_key, zone_name
"""


def q_polygon_zone_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return polygon_zone_counts(
        pings_from_events(spark, sf_dir), load_table(spark, sf_dir, "nation")
    )
