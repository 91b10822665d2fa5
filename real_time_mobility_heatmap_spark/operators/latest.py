"""Latest-per-key family (reference A4, A5, J1, T1, EP3.1, S5's read shape).

The reference computes "newest position per vehicle" as a per-batch
max-timestamp aggregate joined back to the rows (heatmap_stream.py:201-207).
That is two shuffles and duplicates ties. We provide:

- ``latest_join``      — the reference's exact join-based argmax, kept for
                         semantic fidelity (tie rows preserved);
- ``latest_maxby``     — idiomatic single-shuffle argmax with ``max_by``;
- ``latest_rownum``    — ranking-window variant (deterministic tie-break),
                         the canonical form when the full row is needed;
- ``top_window``       — global max window (reference app.py:51 top-1 sort);
- ``latest_window_snapshot`` — the serving layer's two-phase "latest
                         complete snapshot": max window key, then all tiles
                         at that key (app.py:45-69).

Scale notes: max_by/row_number shuffle once on the group key; the join
variant shuffles twice (agg + join) but AQE broadcast-joins the small
aggregated side automatically. At 100 TB the maxby/rownum forms are the
ones to use; the join form exists for parity and tie semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..functions.keys import position_id
from ..operators.tiles import tile_aggregate, tiles_oracle_sql
from ..operators.validate import VALID_SQL, validate_pings
from ..sources.tables import PINGS_ORACLE_SQL, pings_from_events

KEY = ["provider", "vehicleId"]


def latest_maxby(pings: DataFrame) -> DataFrame:
    """argmax via max_by: one shuffle, one row per key."""
    p = validate_pings(pings)
    return p.groupBy(*KEY).agg(
        F.max("eventTs").alias("event_ts"),
        F.max_by("lat", "eventTs").alias("lat"),
        F.max_by("lon", "eventTs").alias("lon"),
        F.max_by("speedKmh", "eventTs").alias("speed_kmh"),
    )


def latest_join(pings: DataFrame) -> DataFrame:
    """Reference-fidelity argmax: groupBy max ts, 3-column equi-join back.

    Parity: heatmap_stream.py:201-207 (ties produce duplicate rows; the
    reference's sink dedups them by `_id`, our oracle reproduces them).
    """
    p = validate_pings(pings)
    latest_ts = p.groupBy(*KEY).agg(F.max("eventTs").alias("eventTs"))
    return latest_ts.join(p, [*KEY, "eventTs"], "left").select(
        "provider",
        "vehicleId",
        F.col("eventTs").alias("event_ts"),
        "lat",
        "lon",
        F.col("speedKmh").alias("speed_kmh"),
    )


def latest_rownum(pings: DataFrame) -> DataFrame:
    """Ranking-window argmax with deterministic event_id tie-break."""
    p = validate_pings(pings)
    w = Window.partitionBy(*KEY).orderBy(F.desc("eventTs"), F.desc("event_id"))
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "provider",
            "vehicleId",
            F.col("eventTs").alias("event_ts"),
            "lat",
            "lon",
            F.col("speedKmh").alias("speed_kmh"),
        )
    )


def latest_positions(pings: DataFrame) -> DataFrame:
    """positions_latest document shape (heatmap_stream.py:217-228):
    `_id` = provider|vehicleId, newest ts, lon/lat point coordinates."""
    latest = latest_maxby(pings)
    return latest.select(
        position_id(F.col("provider"), F.col("vehicleId")).alias("position_id"),
        "provider",
        "vehicleId",
        "event_ts",
        F.col("lon").alias("loc_lon"),
        F.col("lat").alias("loc_lat"),
    )


def top_window(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Global newest window start (reference app.py:51 sort-desc-limit-1,
    expressed as an aggregate: no global sort at scale)."""
    tiles = tile_aggregate(pings, cfg)
    return tiles.agg(F.max("window_start").alias("latest_window"))


def latest_window_snapshot(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Two-phase latest-complete-snapshot (reference app.py:45-69):
    max window key, then every tile in that window. The single-row max side
    is broadcast into the filter join."""
    tiles = tile_aggregate(pings, cfg)
    latest = tiles.agg(F.max("window_start").alias("window_start"))
    return tiles.join(F.broadcast(latest), "window_start").select(tiles.columns)


MERGE_WINDOWS = 3  # "last N minutes" = N/tile_minutes consecutive windows


def recent_tiles_merged(pings: DataFrame, cfg: EngineConfig = DEFAULT, k: int = MERGE_WINDOWS) -> DataFrame:
    """The reference README's roadmap feature (README.md:228: "merge last
    N minutes of tiles"): one smoothed heatmap over the k newest tumbling
    windows per cell — counts summed, speed re-averaged as the
    count-weighted mean (NOT the mean of per-window means). Two-phase
    like the latest snapshot: single-row max window broadcast into the
    filter, then one aggregate on cell."""
    tiles = tile_aggregate(pings, cfg)
    span = F.expr(f"INTERVAL {(k - 1) * cfg.tile_minutes} MINUTES")
    latest = tiles.agg((F.max("window_start") - span).alias("min_ws"))
    recent = tiles.crossJoin(F.broadcast(latest)).filter(
        F.col("window_start") >= F.col("min_ws")
    )
    return recent.groupBy("cell_id").agg(
        F.sum("ping_count").alias("ping_count"),
        F.round(
            F.sum(F.col("avg_speed_kmh") * F.col("ping_count")) / F.sum(
                F.when(F.col("avg_speed_kmh").isNotNull(), F.col("ping_count"))
            ),
            6,
        ).alias("avg_speed_kmh"),
        F.count(F.lit(1)).alias("n_windows"),
        F.min("window_start").alias("merge_start"),
        F.max("window_end").alias("merge_end"),
    )


def recent_tiles_merged_oracle(cfg: EngineConfig = DEFAULT, k: int = MERGE_WINDOWS) -> str:
    return f"""
        WITH tiles AS ({tiles_oracle_sql(PINGS_ORACLE_SQL, cfg)}),
        bound AS (
            SELECT max(window_start) - INTERVAL '{(k - 1) * cfg.tile_minutes} minutes' AS min_ws
            FROM tiles
        )
        SELECT cell_id,
               sum(ping_count) AS ping_count,
               round(sum(avg_speed_kmh * ping_count)
                     / sum(CASE WHEN avg_speed_kmh IS NOT NULL THEN ping_count END), 6)
                   AS avg_speed_kmh,
               count(*) AS n_windows,
               min(window_start) AS merge_start,
               max(window_end) AS merge_end
        FROM tiles, bound
        WHERE window_start >= min_ws
        GROUP BY cell_id
    """


def watermark_latedrop(pings: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Batch twin of the streaming watermark (heatmap_stream.py:107):
    drop events more than the watermark behind the max event time."""
    p = validate_pings(pings)
    bound = p.agg((F.max("eventTs") - F.expr(f"INTERVAL {watermark}")).alias("min_ts"))
    return (
        p.crossJoin(F.broadcast(bound))
        .filter(F.col("eventTs") >= F.col("min_ts"))
        .select("event_id", F.col("eventTs").alias("event_ts"), "provider", "vehicleId")
    )


# ---------------------------------------------------------------------------
# oracles

_VALID_PINGS = f"WITH pings AS ({PINGS_ORACLE_SQL}), valid AS (SELECT * FROM pings WHERE {VALID_SQL})"

LATEST_MAXBY_ORACLE = f"""
    {_VALID_PINGS}
    SELECT provider, vehicleId,
           max(eventTs) AS event_ts,
           arg_max(lat, eventTs) AS lat,
           arg_max(lon, eventTs) AS lon,
           arg_max(speedKmh, eventTs) AS speed_kmh
    FROM valid GROUP BY provider, vehicleId
"""

LATEST_JOIN_ORACLE = f"""
    {_VALID_PINGS},
    latest_ts AS (SELECT provider, vehicleId, max(eventTs) AS eventTs FROM valid GROUP BY 1, 2)
    SELECT t.provider, t.vehicleId, t.eventTs AS event_ts, v.lat, v.lon, v.speedKmh AS speed_kmh
    FROM latest_ts t LEFT JOIN valid v USING (provider, vehicleId, eventTs)
"""

LATEST_ROWNUM_ORACLE = f"""
    {_VALID_PINGS}
    SELECT provider, vehicleId, eventTs AS event_ts, lat, lon, speedKmh AS speed_kmh
    FROM (
        SELECT *, row_number() OVER (PARTITION BY provider, vehicleId ORDER BY eventTs DESC, event_id DESC) AS rn
        FROM valid
    ) WHERE rn = 1
"""

LATEST_POSITIONS_ORACLE = f"""
    {_VALID_PINGS}
    SELECT provider || '|' || vehicleId AS position_id,
           provider, vehicleId,
           max(eventTs) AS event_ts,
           arg_max(lon, eventTs) AS loc_lon,
           arg_max(lat, eventTs) AS loc_lat
    FROM valid GROUP BY provider, vehicleId
"""

WATERMARK_LATEDROP_ORACLE = f"""
    {_VALID_PINGS}
    SELECT event_id, eventTs AS event_ts, provider, vehicleId
    FROM valid
    WHERE eventTs >= (SELECT max(eventTs) - INTERVAL '10 minutes' FROM valid)
"""


def top_window_oracle(cfg: EngineConfig = DEFAULT) -> str:
    return f"WITH tiles AS ({tiles_oracle_sql(PINGS_ORACLE_SQL, cfg)}) SELECT max(window_start) AS latest_window FROM tiles"


def latest_window_snapshot_oracle(cfg: EngineConfig = DEFAULT) -> str:
    return f"""
        WITH tiles AS ({tiles_oracle_sql(PINGS_ORACLE_SQL, cfg)})
        SELECT * FROM tiles WHERE window_start = (SELECT max(window_start) FROM tiles)
    """


# queries() adapters
def q_latest_maxby(spark, sf_dir):
    return latest_maxby(pings_from_events(spark, sf_dir))


def q_latest_join(spark, sf_dir):
    return latest_join(pings_from_events(spark, sf_dir))


def q_latest_rownum(spark, sf_dir):
    return latest_rownum(pings_from_events(spark, sf_dir))


def q_latest_positions(spark, sf_dir):
    return latest_positions(pings_from_events(spark, sf_dir))


def q_top_window(spark, sf_dir):
    return top_window(pings_from_events(spark, sf_dir))


def q_latest_window_snapshot(spark, sf_dir):
    return latest_window_snapshot(pings_from_events(spark, sf_dir))


def q_watermark_latedrop(spark, sf_dir):
    return watermark_latedrop(pings_from_events(spark, sf_dir))


def q_recent_tiles_merged(spark, sf_dir):
    return recent_tiles_merged(pings_from_events(spark, sf_dir))
