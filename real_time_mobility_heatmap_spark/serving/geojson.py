"""Serving-layer projections (reference EP3 / app.py).

The reference's Flask layer turns stored tiles into GeoJSON hex Polygon
features (app.py:52-69, boundary helper 19-41) and latest positions into
Point features (app.py:71-88), plus a TTL freshness filter implied by the
Mongo TTL index (README.md:146). Here those are terminal DataFrame
projections:

- flat corner columns (``tile_features_flat``) — pure column math,
  oracle-checked;
- the real nested GeoJSON Feature struct (``tile_feature_collection``) —
  same data shaped as structs/arrays (pytest + serving use), with a
  ``to_json``-serialized twin (``tile_feature_collection_json``) that is
  fully oracle-checked (flat strings hash portably across engines);
- Point features for positions (oracle-checked, flat);
- TTL read-filter at a deterministic reference instant (ST7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..functions.grid import cell_ring
from ..functions.keys import iso_ts, iso_ts_sql
from ..operators.latest import LATEST_POSITIONS_ORACLE, latest_positions
from ..operators.tiles import tile_aggregate, tiles_oracle_sql
from ..sources.tables import PINGS_ORACLE_SQL, pings_from_events

# deterministic "now" for TTL checks: mid-range of the fixture event time
TTL_REFERENCE_INSTANT = "2024-01-15 00:00:00"


def tile_features_flat(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Tile -> flat polygon-corner projection (F2 ring math, SQL-exact)."""
    t = tile_aggregate(pings, cfg)
    scale = F.lit(float(cfg.grid_scale))
    y = F.split("cell_id", ":").getItem(0).cast("bigint")
    x = F.split("cell_id", ":").getItem(1).cast("bigint")
    return t.select(
        "tile_id",
        "cell_id",
        "ping_count",
        "avg_speed_kmh",
        (y / scale).alias("lat_min"),
        ((y + 1) / scale).alias("lat_max"),
        (x / scale).alias("lon_min"),
        ((x + 1) / scale).alias("lon_max"),
        iso_ts(F.col("window_start")).alias("window_start_iso"),
    )


def tile_features_flat_oracle(cfg: EngineConfig = DEFAULT) -> str:
    s = f"CAST({cfg.grid_scale} AS DOUBLE)"
    return f"""
        WITH tiles AS ({tiles_oracle_sql(PINGS_ORACLE_SQL, cfg)})
        SELECT
            tile_id,
            cell_id,
            ping_count,
            avg_speed_kmh,
            CAST(split_part(cell_id, ':', 1) AS BIGINT) / {s} AS lat_min,
            (CAST(split_part(cell_id, ':', 1) AS BIGINT) + 1) / {s} AS lat_max,
            CAST(split_part(cell_id, ':', 2) AS BIGINT) / {s} AS lon_min,
            (CAST(split_part(cell_id, ':', 2) AS BIGINT) + 1) / {s} AS lon_max,
            {iso_ts_sql('window_start')} AS window_start_iso
        FROM tiles
    """


def tile_feature_collection(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """The real nested GeoJSON Feature rows (reference app.py:52-69):
    Polygon geometry with a closed ring, properties struct. Terminal
    projection — built entirely of struct/array columns, no Python."""
    t = tile_aggregate(pings, cfg)
    ring = cell_ring(F.col("cell_id"), cfg.grid_scale)
    return t.select(
        F.lit("Feature").alias("type"),
        F.col("tile_id").alias("id"),
        F.struct(
            F.lit("Polygon").alias("type"),
            F.array(ring).alias("coordinates"),
        ).alias("geometry"),
        F.struct(
            F.col("cell_id"),
            F.col("ping_count"),
            F.col("avg_speed_kmh"),
            iso_ts(F.col("window_start")).alias("windowStart"),
            iso_ts(F.col("window_end")).alias("windowEnd"),
        ).alias("properties"),
    )


def tile_feature_collection_json(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Hash-safe projection of ``tile_feature_collection``: geometry and
    properties serialized with ``to_json`` so the output is flat strings
    (nested arrays crash order-insensitive hash comparison harnesses).

    Byte-parity with the DuckDB oracle holds because both engines use
    shortest-round-trip double rendering, which agrees for magnitudes in
    [1e-3, 1e7) — grid corners (multiples of 1/scale) and rounded speed
    averages (>= 0.01 in fixtures) stay inside that band. Outside it Spark
    switches to scientific notation earlier than DuckDB.
    """
    fc = tile_feature_collection(pings, cfg)
    return fc.select(
        "type",
        "id",
        F.to_json(F.col("geometry")).alias("geometry_json"),
        F.to_json(F.col("properties"), {"ignoreNullFields": "false"}).alias("properties_json"),
    )


def tile_feature_collection_json_oracle(cfg: EngineConfig = DEFAULT) -> str:
    s = f"CAST({cfg.grid_scale} AS DOUBLE)"
    return f"""
        WITH tiles AS ({tiles_oracle_sql(PINGS_ORACLE_SQL, cfg)}),
        corners AS (
            SELECT *,
                CAST(split_part(cell_id, ':', 1) AS BIGINT) / {s} AS lat0,
                (CAST(split_part(cell_id, ':', 1) AS BIGINT) + 1) / {s} AS lat1,
                CAST(split_part(cell_id, ':', 2) AS BIGINT) / {s} AS lon0,
                (CAST(split_part(cell_id, ':', 2) AS BIGINT) + 1) / {s} AS lon1
            FROM tiles
        )
        SELECT
            'Feature' AS type,
            tile_id AS id,
            to_json(struct_pack(
                type := 'Polygon',
                coordinates := [[[lon0, lat0], [lon1, lat0], [lon1, lat1],
                                 [lon0, lat1], [lon0, lat0]]]
            ))::VARCHAR AS geometry_json,
            to_json(struct_pack(
                cell_id := cell_id,
                ping_count := ping_count,
                avg_speed_kmh := avg_speed_kmh,
                windowStart := {iso_ts_sql('window_start')},
                windowEnd := {iso_ts_sql('window_end')}
            ))::VARCHAR AS properties_json
        FROM corners
    """


def position_features(pings: DataFrame) -> DataFrame:
    """Latest positions as flat Point-feature columns (app.py:71-88)."""
    p = latest_positions(pings)
    return p.select(
        "position_id",
        "provider",
        "vehicleId",
        iso_ts(F.col("event_ts")).alias("ts_iso"),
        F.col("loc_lon").alias("point_lon"),
        F.col("loc_lat").alias("point_lat"),
    )


POSITION_FEATURES_ORACLE = f"""
    WITH pos AS ({LATEST_POSITIONS_ORACLE})
    SELECT position_id, provider, vehicleId,
           {iso_ts_sql('event_ts')} AS ts_iso,
           loc_lon AS point_lon,
           loc_lat AS point_lat
    FROM pos
"""


def fresh_tiles(pings: DataFrame, cfg: EngineConfig = DEFAULT, now: str = TTL_REFERENCE_INSTANT) -> DataFrame:
    """TTL read-filter (ST7): only tiles not yet expired at the reference
    instant — compute-side analog of the reference's Mongo TTL index."""
    t = tile_aggregate(pings, cfg)
    return t.filter(F.col("stale_at") > F.lit(now).cast("timestamp"))


def fresh_tiles_oracle(cfg: EngineConfig = DEFAULT, now: str = TTL_REFERENCE_INSTANT) -> str:
    return f"""
        WITH tiles AS ({tiles_oracle_sql(PINGS_ORACLE_SQL, cfg)})
        SELECT * FROM tiles WHERE stale_at > TIMESTAMP '{now}'
    """


def q_tile_features_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tile_features_flat(pings_from_events(spark, sf_dir))


def q_tile_feature_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # registered variant is the JSON-serialized projection: same data, but
    # flat string columns survive the driver's order-insensitive hashing
    # (the nested-struct tile_feature_collection stays for pytest/serving)
    return tile_feature_collection_json(pings_from_events(spark, sf_dir))


def q_position_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return position_features(pings_from_events(spark, sf_dir))


def q_fresh_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fresh_tiles(pings_from_events(spark, sf_dir))
