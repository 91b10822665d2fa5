"""Tumbling-window tile aggregation — the engine's core query.

Parity with reference heatmap_stream.py:96-132: validate -> cell snap ->
groupBy(window(eventTs, 5 min), cellId) -> count / avg(speed) / centroid ->
tile projection with deterministic `_id` and `staleAt` retention stamp.

Spark-first notes (vs reference):
- the snap is pure column arithmetic (functions/grid.py), so the whole
  scan->filter->project->partial-agg pipeline is one WholeStageCodegen span
  with no Python round trip;
- the aggregate is a plain hash aggregate (partial map-side combine ->
  shuffle on (window, cellId) -> final), which is exactly the shape that
  scales: tile cardinality (cells x windows), not input rows, crosses the
  shuffle;
- `_id`/`staleAt` are built executor-side as columns, not in a sink loop
  (reference heatmap_stream.py:168-187 shapes documents on the driver).

Double-typed aggregates are rounded (ROUND_*) identically here and in the
oracle so cross-engine float accumulation order cannot flip a comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..functions.epochs import epoch_s_sql
from ..lineage import cut_lineage
from ..functions.grid import cell_id, cell_id_sql
from ..functions.keys import tile_id, tile_id_sql
from ..functions.rounding import avg_2dec_exact_sql, micro_units, round_half_up, round_half_up_sql
from .validate import VALID_SQL, validate_pings

ROUND_AVG = 6  # decimal places for avg() aggregates in oracle-checked output

# Engine-exact tile means (r12): speedKmh is 2-decimal by wire contract
# and lat/lon are exact 2-decimal grid offsets by fixture construction,
# so all three averages accumulate exact int64 cents (order-free) and
# round via the shared float-domain half-up form — the same treatment
# vehicle_sessions/sliding_cell_counts got in r11. One fragment each,
# shared verbatim by the DataFrame build (F.expr) and the oracle SQL.
AVG_SPEED_EXACT = avg_2dec_exact_sql("speedKmh", ROUND_AVG)
AVG_LON_EXACT = avg_2dec_exact_sql("lon", ROUND_AVG)
AVG_LAT_EXACT = avg_2dec_exact_sql("lat", ROUND_AVG)


def snap_pings(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """validate + cell snap + null-cell drop (reference P4-P6 + F1)."""
    return (
        validate_pings(pings)
        .withColumn("cell_id", cell_id(F.col("lat"), F.col("lon"), cfg.grid_scale))
        .filter(F.col("cell_id").isNotNull())
    )


def tile_aggregate(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """The flagship tile query (reference A1-A3 + W1 + P8 + F3-F5)."""
    snapped = snap_pings(pings, cfg)
    agg = snapped.groupBy(
        F.window("eventTs", cfg.window_duration).alias("w"), F.col("cell_id")
    ).agg(
        F.count(F.lit(1)).alias("ping_count"),
        F.expr(AVG_SPEED_EXACT).alias("avg_speed_kmh"),
        F.expr(AVG_LON_EXACT).alias("centroid_lon"),
        F.expr(AVG_LAT_EXACT).alias("centroid_lat"),
    )
    return agg.select(
        tile_id(cfg.city, cfg.grid_name, F.col("cell_id"), F.col("w.start")).alias("tile_id"),
        F.lit(cfg.city).alias("city"),
        F.lit(cfg.grid_name).alias("grid"),
        "cell_id",
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "ping_count",
        "avg_speed_kmh",
        "centroid_lon",
        "centroid_lat",
        (F.col("w.end") + F.expr(f"INTERVAL {cfg.ttl_minutes} MINUTES")).alias("stale_at"),
    )


def snapped_oracle_cte(pings_sql: str, cfg: EngineConfig = DEFAULT) -> str:
    """DuckDB CTE mirroring ``snap_pings`` over a pings projection."""
    return f"""
        WITH pings AS ({pings_sql}),
        snapped AS (
            SELECT *, {cell_id_sql('lat', 'lon', cfg.grid_scale)} AS cell_id
            FROM pings
            WHERE {VALID_SQL}
        )
    """


def tiles_oracle_sql(pings_sql: str, cfg: EngineConfig = DEFAULT) -> str:
    """DuckDB twin of ``tile_aggregate``.

    time_bucket() and Spark's window() both align N-minute buckets on
    instants that are whole multiples of the width from midnight, so the
    bucket starts agree for any width dividing 24h (verified in tests).
    """
    w = f"time_bucket(INTERVAL '{cfg.tile_minutes} minutes', eventTs)"
    return f"""
        {snapped_oracle_cte(pings_sql, cfg)},
        agg AS (
            SELECT
                {w} AS window_start,
                {w} + INTERVAL '{cfg.tile_minutes} minutes' AS window_end,
                cell_id,
                count(*) AS ping_count,
                {AVG_SPEED_EXACT} AS avg_speed_kmh,
                {AVG_LON_EXACT} AS centroid_lon,
                {AVG_LAT_EXACT} AS centroid_lat
            FROM snapped
            GROUP BY 1, 2, 3
        )
        SELECT
            {tile_id_sql(cfg.city, cfg.grid_name, 'cell_id', 'window_start')} AS tile_id,
            '{cfg.city}' AS city,
            '{cfg.grid_name}' AS grid,
            cell_id,
            window_start,
            window_end,
            ping_count,
            avg_speed_kmh,
            centroid_lon,
            centroid_lat,
            window_end + INTERVAL '{cfg.ttl_minutes} minutes' AS stale_at
        FROM agg
    """


# --------------------------------------------------------------------------
# Hierarchical rollups (continuous-aggregate cascade)
# --------------------------------------------------------------------------

ROLLUP_GRAINS = [("1min", 60), ("10min", 600), ("1hour", 3600)]


def hierarchical_rollups(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: per-cell tile counts
    at 1-minute grain, then 10-minute and 1-hour grains DERIVED FROM THE
    PREVIOUS GRAIN — never re-scanning the raw pings. One output frame,
    all grains unioned with a ``grain`` tag.

    This is the maintenance pattern behind materialized rollup serving at
    100 TB: the raw scan happens once (finest grain); each coarser level
    aggregates the previous level's output, whose cardinality is
    cells x buckets — orders of magnitude below the fact table — so the
    cascade costs one fact shuffle plus two dim-sized shuffles. Speed
    sums ride as exact integer micro-km/h (int64 sums are associative,
    so re-aggregating partial sums is EXACT — the property that makes
    rollup-from-rollup legal; a pre-rounded avg would drift).

    Buckets are integer epoch seconds (``(epoch div width) * width``),
    the engine-neutral bucket key (Spark window() and DuckDB time_bucket
    agree only for widths aligned from midnight; integer math agrees
    always and is what a rollup TABLE would key on).
    """
    snapped = snap_pings(pings, cfg)
    micro = micro_units("speedKmh")
    w0 = ROLLUP_GRAINS[0][1]
    level = (
        snapped.select(
            "cell_id",
            F.expr(f"({epoch_s_sql('eventTs')} div {w0}) * {w0}").alias("bucket_epoch"),
            micro.alias("micro"),
        )
        .groupBy("cell_id", "bucket_epoch")
        .agg(
            F.count(F.lit(1)).alias("n_pings"),
            F.sum("micro").alias("sum_speed_micro"),
        )
    )
    # each level is materialized once (r17): the union's branches embed
    # the previous level's plan, so without the cut the raw scan + snap
    # + finest-grain aggregate re-ran inside EVERY coarser branch (6
    # parquet scans in the before plan) — physically violating the
    # "raw scan happens once" cascade this operator exists to model
    # (guide §2.4 duplicated subtrees)
    level = cut_lineage(level, eager=False)
    out = level.withColumn("grain", F.lit(ROLLUP_GRAINS[0][0]))
    for grain, width in ROLLUP_GRAINS[1:]:
        level = cut_lineage(
            level.groupBy(
                "cell_id",
                F.expr(f"(bucket_epoch div {width}) * {width}").alias("bucket_epoch"),
            )
            .agg(
                F.sum("n_pings").alias("n_pings"),
                F.sum("sum_speed_micro").alias("sum_speed_micro"),
            ),
            eager=False,
        )
        out = out.unionByName(level.withColumn("grain", F.lit(grain)))
    return out.select(
        "grain",
        "cell_id",
        "bucket_epoch",
        "n_pings",
        "sum_speed_micro",
        round_half_up(
            F.col("sum_speed_micro") / 1e6 / F.col("n_pings"), ROUND_AVG
        ).alias("avg_speed_kmh"),
    )


def hierarchical_rollups_oracle(pings_sql: str, cfg: EngineConfig = DEFAULT) -> str:
    """DuckDB twin — the same cascade, each level reading the previous CTE."""
    levels = []
    prev = None
    for grain, width in ROLLUP_GRAINS:
        name = f"l_{grain}"
        if prev is None:
            levels.append(
                f"""{name} AS (
                    SELECT cell_id,
                           (CAST(floor(epoch(eventTs)) AS BIGINT) // {width}) * {width}
                               AS bucket_epoch,
                           count(*) AS n_pings,
                           CAST(sum(TRY_CAST(round(speedKmh * 1e6) AS BIGINT)) AS BIGINT)
                               AS sum_speed_micro
                    FROM snapped GROUP BY 1, 2
                )"""
            )
        else:
            levels.append(
                f"""{name} AS (
                    SELECT cell_id,
                           (bucket_epoch // {width}) * {width} AS bucket_epoch,
                           CAST(sum(n_pings) AS BIGINT) AS n_pings,
                           CAST(sum(sum_speed_micro) AS BIGINT) AS sum_speed_micro
                    FROM {prev} GROUP BY 1, 2
                )"""
            )
        prev = name
    union = "\nUNION ALL\n".join(
        f"SELECT '{grain}' AS grain, cell_id, bucket_epoch, n_pings, sum_speed_micro "
        f"FROM l_{grain}"
        for grain, _ in ROLLUP_GRAINS
    )
    return f"""
        {snapped_oracle_cte(pings_sql, cfg)},
        {", ".join(levels)}
        SELECT grain, cell_id, bucket_epoch, n_pings, sum_speed_micro,
               {round_half_up_sql('sum_speed_micro / 1e6 / n_pings', ROUND_AVG)} AS avg_speed_kmh
        FROM ({union})
    """


MERGE_CUTOFF = "2024-01-24"  # history/delta split inside the fixture range
MERGE_W = 600                # 10-min rollup buckets


def rollup_delta_merge(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Incremental materialized-view maintenance: a stored tile rollup
    (history, ``eventTs < MERGE_CUTOFF``) absorbs a new delta batch by
    MERGING PARTIAL AGGREGATES on the bucket key — the
    ``MERGE WHEN MATCHED THEN UPDATE SET n = n + delta.n`` pattern —
    never rescanning history rows.

    Exactness rides on int64 micro-km/h partial sums (associative, so
    partial+partial == full recompute); the oracle IS the full
    recompute over all pings, hash-proving the incremental path. The
    ``n_delta_pings`` column is the MERGE's touched-set audit: buckets
    with 0 are the ones a real MERGE would never write.

    At 100 TB: the delta aggregate is batch-sized, the merge shuffle is
    keyed on (cell, bucket) whose cardinality is the MV's — not the
    fact table's — and history stays on disk as the previous MV
    snapshot (here recomputed once for self-containment).
    """
    snapped = snap_pings(pings, cfg)
    micro = micro_units("speedKmh")
    part = snapped.select(
        "cell_id",
        F.expr(f"({epoch_s_sql('eventTs')} div {MERGE_W}) * {MERGE_W}").alias(
            "bucket_epoch"
        ),
        micro.alias("micro"),
        (F.col("eventTs") >= F.lit(MERGE_CUTOFF).cast("timestamp")).alias("is_delta"),
    )
    base = (
        part.filter(~F.col("is_delta"))
        .groupBy("cell_id", "bucket_epoch")
        .agg(
            F.count(F.lit(1)).alias("n_pings"),
            F.sum("micro").alias("sum_speed_micro"),
        )
        .withColumn("n_delta_pings", F.lit(0).cast("long"))
    )
    delta = (
        part.filter(F.col("is_delta"))
        .groupBy("cell_id", "bucket_epoch")
        .agg(
            F.count(F.lit(1)).alias("n_pings"),
            F.sum("micro").alias("sum_speed_micro"),
        )
        .withColumn("n_delta_pings", F.col("n_pings"))
    )
    merged = (
        base.unionByName(delta)
        .groupBy("cell_id", "bucket_epoch")
        .agg(
            F.sum("n_pings").alias("n_pings"),
            F.sum("sum_speed_micro").alias("sum_speed_micro"),
            F.sum("n_delta_pings").alias("n_delta_pings"),
        )
    )
    return merged.select(
        "cell_id",
        "bucket_epoch",
        "n_pings",
        "n_delta_pings",
        "sum_speed_micro",
        round_half_up(
            F.col("sum_speed_micro") / 1e6 / F.col("n_pings"), ROUND_AVG
        ).alias("avg_speed_kmh"),
    )


def rollup_delta_merge_oracle(pings_sql: str, cfg: EngineConfig = DEFAULT) -> str:
    """The FULL RECOMPUTE over all pings — hash-equality proves the
    incremental merge exact."""
    return f"""
        {snapped_oracle_cte(pings_sql, cfg)}
        SELECT cell_id,
               (CAST(floor(epoch(eventTs)) AS BIGINT) // {MERGE_W}) * {MERGE_W}
                   AS bucket_epoch,
               count(*) AS n_pings,
               CAST(sum(CASE WHEN eventTs >= TIMESTAMP '{MERGE_CUTOFF}'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_delta_pings,
               CAST(sum(TRY_CAST(round(speedKmh * 1e6) AS BIGINT)) AS BIGINT)
                   AS sum_speed_micro,
               {round_half_up_sql('sum(TRY_CAST(round(speedKmh * 1e6) AS BIGINT)) / 1e6 / count(*)', ROUND_AVG)} AS avg_speed_kmh
        FROM snapped
        GROUP BY 1, 2
    """


UNPIVOT_METRICS = ["ping_count", "avg_speed_kmh", "centroid_lon", "centroid_lat"]


def unpivot_tile_metrics(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Wide->long relayout of the tile aggregate (``DataFrame.unpivot`` /
    SQL UNPIVOT — the inverse of ``event_type_pivot``): one (cell,
    window, metric, value) row per metric column, the shape a
    metrics-store or charting sink ingests.

    Map-side only after the tile aggregate (unpivot is a local Expand —
    no shuffle added); counts cast to double up front so the value
    column has one type in both engines.

    NULL metric values are dropped explicitly: Spark's unpivot keeps
    NULL-valued rows while DuckDB's UNPIVOT excludes them by default,
    and avg_speed_kmh is NULL when every ping in a tile window has NULL
    speedKmh — the filter makes both engines agree by construction
    instead of by fixture luck (ADVICE r7).
    """
    t = tile_aggregate(pings, cfg).select(
        "cell_id",
        "window_start",
        F.col("ping_count").cast("double").alias("ping_count"),
        "avg_speed_kmh",
        "centroid_lon",
        "centroid_lat",
    )
    return t.unpivot(
        ids=["cell_id", "window_start"],
        values=UNPIVOT_METRICS,
        variableColumnName="metric",
        valueColumnName="value",
    ).filter(F.col("value").isNotNull())


def unpivot_tile_metrics_oracle(pings_sql: str, cfg: EngineConfig = DEFAULT) -> str:
    return f"""
        WITH tiles AS ({tiles_oracle_sql(pings_sql, cfg)})
        SELECT cell_id, window_start, metric, value
        FROM (
            SELECT cell_id, window_start,
                   CAST(ping_count AS DOUBLE) AS ping_count,
                   avg_speed_kmh, centroid_lon, centroid_lat
            FROM tiles
        ) UNPIVOT (value FOR metric IN
                   (ping_count, avg_speed_kmh, centroid_lon, centroid_lat))
    """
