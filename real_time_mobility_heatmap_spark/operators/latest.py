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
from ..functions.rounding import micro_units, round_half_up, round_half_up_sql
from ..operators.tiles import snap_pings, tile_aggregate, tiles_oracle_sql
from ..operators.validate import VALID_SQL, validate_pings
from ..sources.tables import PINGS_ORACLE_SQL, pings_from_events

KEY = ["provider", "vehicleId"]


def latest_maxby(pings: DataFrame) -> DataFrame:
    """argmax via max_by: one shuffle, one row per key.

    The ordering key is the PAIR (eventTs, event_id), not eventTs alone:
    with a bare timestamp key, two pings of one vehicle in the same
    second (the NORM for a real fleet; manufactured by the r13 --ties
    sweep, which caught exactly this) make the winner arbitrary in BOTH
    engines — Spark's max_by and DuckDB's arg_max each pick whichever
    tied row their accumulator saw first. The pair key makes the winner
    a pure function of the data: highest event_id wins ties.

    The pair is PACKED into one DECIMAL(38,0) — micros * 10^19 +
    event_id — rather than a struct: a struct-typed max_by buffer is
    not UnsafeRow-mutable, so Spark silently falls back from
    HashAggregate to SortAggregate (measured: the struct form turned
    this whole plan sort-based), while decimal buffers stay
    hash-aggregable. Ordering is equivalent (micros ~1.7e15 * 1e19 ~
    1.7e34 < 1e38; event_id is a non-negative int64 < 10^19 by the
    fixture/producer contract), verified against the struct form on a
    tie-heavy frame.
    """
    p = validate_pings(pings)
    key = F.expr(
        "CAST(unix_micros(eventTs) AS DECIMAL(18,0))"
        " * 10000000000000000000 + event_id"
    )
    return p.groupBy(*KEY).agg(
        F.max("eventTs").alias("event_ts"),
        F.max_by("lat", key).alias("lat"),
        F.max_by("lon", key).alias("lon"),
        F.max_by("speedKmh", key).alias("speed_kmh"),
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
    windows per cell — counts summed, speed re-averaged over the whole
    span (NOT the mean of per-window means). Two-phase like the latest
    snapshot: single-row max window broadcast into the filter, then one
    aggregate on cell.

    Determinism: the merge is computed from the snapped pings, not from
    per-window rounded averages, and speed is accumulated as exact
    integer micro-km/h — int64 sums are associative, so partition /
    engine summation order cannot flip the 6-decimal rounding (a double
    re-weighting of rounded per-window means sat on a half-boundary and
    hash-flipped run-to-run in round 2). One round at the very end."""
    snapped = snap_pings(pings, cfg).withColumn(
        "w", F.window("eventTs", cfg.window_duration)
    )
    span = F.expr(f"INTERVAL {(k - 1) * cfg.tile_minutes} MINUTES")
    latest = snapped.agg((F.max("w.start") - span).alias("min_ws"))
    recent = snapped.crossJoin(F.broadcast(latest)).filter(
        F.col("w.start") >= F.col("min_ws")
    )
    micro = micro_units("speedKmh")  # total int64 grid (rounding.py)
    return recent.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("ping_count"),
        # half-up float-domain rounding of the int64-exact mean: identical
        # double in both engines, and an exactly-on-boundary rational
        # can't split the engines' native round() (r11)
        round_half_up(
            F.sum(micro) / F.lit(1e6) / F.count("speedKmh"), 6
        ).alias("avg_speed_kmh"),
        F.count_distinct(F.col("w.start")).alias("n_windows"),
        F.min(F.col("w.start")).alias("merge_start"),
        F.max(F.col("w.end")).alias("merge_end"),
    )


def recent_tiles_merged_oracle(cfg: EngineConfig = DEFAULT, k: int = MERGE_WINDOWS) -> str:
    from ..operators.tiles import snapped_oracle_cte

    w = f"time_bucket(INTERVAL '{cfg.tile_minutes} minutes', eventTs)"
    return f"""
        {snapped_oracle_cte(PINGS_ORACLE_SQL, cfg)},
        win AS (SELECT *, {w} AS ws FROM snapped WHERE cell_id IS NOT NULL),
        bound AS (
            SELECT max(ws) - INTERVAL '{(k - 1) * cfg.tile_minutes} minutes' AS min_ws
            FROM win
        )
        SELECT cell_id,
               count(*) AS ping_count,
               {round_half_up_sql('sum(TRY_CAST(round(speedKmh * 1e6) AS BIGINT)) / 1e6 / count(speedKmh)', 6)}
                   AS avg_speed_kmh,
               count(DISTINCT ws) AS n_windows,
               min(ws) AS merge_start,
               max(ws) + INTERVAL '{cfg.tile_minutes} minutes' AS merge_end
        FROM win, bound
        WHERE ws >= min_ws
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

# Expressed in the row_number form, NOT arg_max: the argmax ordering key
# is the PAIR (eventTs, event_id) — the r13 --ties sweep caught bare-
# timestamp arg_max picking an arbitrary winner among same-second pings
# in both engines — and DuckDB's arg_max accepts only scalar ordering
# keys (no struct overload), so the deterministic pair ordering needs
# the window form here. Row semantics also carry the one nullable field
# (speedKmh) through intact, which arg_max would SKIP on NULL (the r11
# null-sweep finding that previously forced a struct_pack wrap).
LATEST_MAXBY_ORACLE = f"""
    {_VALID_PINGS}
    SELECT provider, vehicleId, eventTs AS event_ts, lat, lon, speedKmh AS speed_kmh
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY provider, vehicleId
            ORDER BY eventTs DESC, event_id DESC) AS rn
        FROM valid
    ) WHERE rn = 1
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

# row_number form for the same reason as LATEST_MAXBY_ORACLE: the
# deterministic (eventTs, event_id) pair ordering has no DuckDB arg_max
# spelling.
def latest_positions_oracle(pings_sql: str = PINGS_ORACLE_SQL) -> str:
    """Parameterized on the pings SELECT so the streaming twin can pass
    the bounded stream event-time domain (streaming/sources.py)."""
    return f"""
    WITH pings AS ({pings_sql}), valid AS (SELECT * FROM pings WHERE {VALID_SQL})
    SELECT provider || '|' || vehicleId AS position_id,
           provider, vehicleId,
           eventTs AS event_ts,
           lon AS loc_lon,
           lat AS loc_lat
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY provider, vehicleId
            ORDER BY eventTs DESC, event_id DESC) AS rn
        FROM valid
    ) WHERE rn = 1
"""


LATEST_POSITIONS_ORACLE = latest_positions_oracle()

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
