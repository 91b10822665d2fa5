"""Movement-flow analytics over the ping stream — the city-scale
companions of the tile heatmap (SURVEY.md §2 mobility extensions):
origin→destination flows, co-location contact pairs, and spatial
smoothing of the cell-count surface.

The reference stops at per-cell densities (heatmap_stream.py:96-132);
a transit operator's next three questions are *where do trips go*
(`od_matrix`), *which vehicles travel together* (`encounter_pairs` —
the contact-tracing / convoy-detection primitive), and *what does the
density look like with sensor noise smoothed out* (`kring_smooth`, the
grid analog of H3's k-ring neighborhood average).

Scale shapes, per operator (measured 10x/30x curves: SCALE.md
"Movement-flow family scale curve"):
- ``od_matrix``: ONE corpus shuffle on (vehicleId, hour); both endpoint
  windows and the endpoint aggregate reuse that partitioning, and the
  final flow aggregate is keyed by cell pairs (geography²-bounded).
- ``encounter_pairs`` / ``co_dwell_pairs``: the dedup family's
  capped-bucket pattern applied to (cell, time) buckets — over-cap
  depot buckets are dropped BEFORE any array/join materializes, so
  per-bucket fanout is bounded by C(cap, 2), never corpus².
- ``kring_smooth`` / ``tile_anomaly_report`` / ``tile_gap_fill`` /
  ``tile_speed_locf``: one corpus scan+shuffle into a cell-bounded (or
  top-N-bounded) relation; everything after runs on that aggregate.
- ``stay_points`` / ``ping_gap_report`` / ``trip_distance_report``:
  per-vehicle lag/run windows and their aggregates share a single
  (vehicleId) exchange (plan-tested), exactly linear in keys.
- ``convoy_clusters``: reuses dedup_clusters' pointer-jumping CC on the
  injected encounter edge set — O(log diameter) bounded rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..functions.epochs import epoch_s, epoch_s_sql
from ..functions.guards import spine_guard_sql
from ..functions.ols import OLS_SUMS_SQL, grouped_ols, ols_select_sql
from ..functions.percentiles import percentile_disc_exact
from ..functions.rounding import micro_units, round_half_up_sql
from ..lineage import cut_lineage
from ..operators.dedup import _capped_sorted_buckets
from ..operators.tiles import snap_pings, snapped_oracle_cte
from ..operators.validate import VALID_SQL, require_ts_domain, validate_pings
from ..sources.tables import PINGS_ORACLE_SQL, pings_from_events

# co-location bucket: same grid cell within the same 5-minute tumbling
# window counts as one encounter opportunity
ENC_WINDOW_MIN = 5
# depot guard: a (cell, window) bucket holding more distinct vehicles
# than this is a terminal/garage, not an encounter — dropped before its
# vehicle array materializes (same rationale as dedup's df_cap)
ENC_CAP = 50

# OD trip grain: first and last observed cell per vehicle per clock hour
OD_GRAIN = "hour"


# --------------------------------------------------------------------------
# Origin -> destination matrix
# --------------------------------------------------------------------------


def od_matrix(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Hourly origin→destination flow counts between grid cells.

    Trip grain = (vehicleId, clock hour): origin is the cell of the
    vehicle's FIRST ping in the hour, destination the cell of its LAST,
    with (eventTs, event_id) as the engine-total order (eventTs alone
    can tie within a vehicle-hour). Emits one row per observed
    (origin_cell, dest_cell) with trip and vehicle counts (a stationary
    vehicle-hour appears on the diagonal, origin == dest).

    Both row_number windows and the endpoint aggregate share the
    (vehicleId, hour) hash partitioning — Catalyst plans ONE exchange
    for all three; the flow aggregate then shuffles the per-trip rows
    (|vehicles|×|hours| at most, far below ping volume).
    """
    snapped = snap_pings(pings, cfg).withColumn(
        "trip_hour", F.date_trunc(OD_GRAIN, F.col("eventTs"))
    )
    part = ["vehicleId", "trip_hour"]
    asc = Window.partitionBy(*part).orderBy(F.asc("eventTs"), F.asc("event_id"))
    desc = Window.partitionBy(*part).orderBy(F.desc("eventTs"), F.desc("event_id"))
    trips = (
        snapped.select(
            *part,
            "cell_id",
            F.row_number().over(asc).alias("rn_a"),
            F.row_number().over(desc).alias("rn_d"),
        )
        .filter((F.col("rn_a") == 1) | (F.col("rn_d") == 1))
        .groupBy(*part)
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("cell_id"))).alias("origin_cell"),
            F.max(F.when(F.col("rn_d") == 1, F.col("cell_id"))).alias("dest_cell"),
        )
    )
    return trips.groupBy("origin_cell", "dest_cell").agg(
        F.count(F.lit(1)).alias("n_trips"),
        F.count_distinct("vehicleId").alias("n_vehicles"),
    )


def od_matrix_oracle(cfg: EngineConfig = DEFAULT) -> str:
    return f"""
        {snapped_oracle_cte(PINGS_ORACLE_SQL, cfg)},
        ranked AS (
            SELECT vehicleId,
                   date_trunc('{OD_GRAIN}', eventTs) AS trip_hour,
                   cell_id,
                   row_number() OVER (
                       PARTITION BY vehicleId, date_trunc('{OD_GRAIN}', eventTs)
                       ORDER BY eventTs ASC NULLS FIRST, event_id ASC NULLS FIRST
                   ) AS rn_a,
                   row_number() OVER (
                       PARTITION BY vehicleId, date_trunc('{OD_GRAIN}', eventTs)
                       ORDER BY eventTs DESC NULLS LAST, event_id DESC NULLS LAST
                   ) AS rn_d
            FROM snapped
        ),
        trips AS (
            SELECT vehicleId, trip_hour,
                   max(CASE WHEN rn_a = 1 THEN cell_id END) AS origin_cell,
                   max(CASE WHEN rn_d = 1 THEN cell_id END) AS dest_cell
            FROM ranked WHERE rn_a = 1 OR rn_d = 1
            GROUP BY vehicleId, trip_hour
        )
        SELECT origin_cell, dest_cell,
               count(*) AS n_trips,
               count(DISTINCT vehicleId) AS n_vehicles
        FROM trips GROUP BY origin_cell, dest_cell
    """


def q_od_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return od_matrix(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Co-location encounter pairs
# --------------------------------------------------------------------------


def encounter_pairs(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Vehicle pairs repeatedly observed in the same (cell, 5-min window).

    The contact-tracing / convoy primitive: distinct co-location triples
    (cell, window, vehicle) are grouped into capped sorted vehicle-array
    buckets (``_capped_sorted_buckets`` — the r10-audited builder that
    drops over-cap depot buckets BEFORE collect_list materializes them),
    then i<j pairs stream out via the two-level explode. Emits one row
    per vehicle pair with encounter count, distinct-cell count, and
    first co-location window. Never an all-pairs product: fanout is
    bounded by n_buckets × C(ENC_CAP, 2).
    """
    snapped = snap_pings(pings, cfg)
    # materialized once (r17): the bucket builder reads the triple
    # relation twice (hot-key count + collect) and each read previously
    # re-ran the events scan + snap + distinct (guide §2.4 — 4 parquet
    # scans before, 2 after)
    triples = cut_lineage(
        snapped.select(
            "cell_id",
            F.window("eventTs", f"{ENC_WINDOW_MIN} minutes").start.alias("w_start"),
            "vehicleId",
        ).distinct(),
        eager=False,
    )
    buckets = _capped_sorted_buckets(
        triples, ["cell_id", "w_start"], "vehicleId", ENC_CAP
    )
    pairs = (
        buckets.select(
            "cell_id",
            "w_start",
            "ds",
            F.explode(F.expr("sequence(1, size(ds) - 1)")).alias("i"),
        )
        .select(
            "cell_id",
            "w_start",
            F.expr("element_at(ds, i)").alias("vehicle_a"),
            F.explode(F.expr("slice(ds, i + 1, size(ds) - i)")).alias("vehicle_b"),
        )
    )
    return pairs.groupBy("vehicle_a", "vehicle_b").agg(
        F.count(F.lit(1)).alias("n_encounters"),
        F.count_distinct("cell_id").alias("n_cells"),
        F.min("w_start").alias("first_seen"),
    )


def encounter_pairs_oracle(cfg: EngineConfig = DEFAULT) -> str:
    # sorted-array i<j pairing == self-join with a strict string "<" on
    # the member column; the cap filter reproduces the bucket drop
    return f"""
        {snapped_oracle_cte(PINGS_ORACLE_SQL, cfg)},
        triples AS (
            SELECT DISTINCT cell_id,
                   time_bucket(INTERVAL '{ENC_WINDOW_MIN} minutes', eventTs) AS w_start,
                   vehicleId
            FROM snapped
        ),
        sized AS (
            SELECT *, count(*) OVER (PARTITION BY cell_id, w_start) AS _n
            FROM triples
        ),
        kept AS (SELECT * FROM sized WHERE _n <= {ENC_CAP}),
        pairs AS (
            SELECT a.cell_id, a.w_start,
                   a.vehicleId AS vehicle_a, b.vehicleId AS vehicle_b
            FROM kept a JOIN kept b
              ON a.cell_id = b.cell_id AND a.w_start = b.w_start
             AND a.vehicleId < b.vehicleId
        )
        SELECT vehicle_a, vehicle_b,
               count(*) AS n_encounters,
               count(DISTINCT cell_id) AS n_cells,
               min(w_start) AS first_seen
        FROM pairs GROUP BY vehicle_a, vehicle_b
    """


def q_encounter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return encounter_pairs(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# k-ring neighborhood smoothing
# --------------------------------------------------------------------------


def kring_smooth(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """3×3-neighborhood (k-ring 1) smoothing of the per-cell ping counts.

    The grid analog of averaging an H3 cell with its k-ring: every cell
    SCATTERS its count to itself and its 8 neighbors (a 3×3 uniform
    kernel via two literal sequence explodes), the scatter re-aggregates
    on the receiving cell, and occupied cells join back their raw count.
    Emits (cell_id, ping_count, smoothed_count, share_ppm) where
    share_ppm = the cell's own fraction of its neighborhood total — a
    hot-spot isolation score (1e6 = isolated spike, ~111k = uniform
    field).

    The corpus is touched ONCE (the map-side-combined cell count); the
    9× explode, re-aggregate, and self-join all run on the
    geography-bounded cell relation.
    """
    cells = (
        validate_pings(pings)
        .groupBy(
            F.floor(F.col("lat") * cfg.grid_scale).cast("bigint").alias("iy"),
            F.floor(F.col("lon") * cfg.grid_scale).cast("bigint").alias("ix"),
        )
        .agg(F.count(F.lit(1)).alias("ping_count"))
    )
    scattered = (
        cells.select(
            "iy", "ix", "ping_count", F.explode(F.expr("sequence(-1, 1)")).alias("dy")
        )
        .select(
            "iy", "ix", "ping_count", "dy",
            F.explode(F.expr("sequence(-1, 1)")).alias("dx"),
        )
        .groupBy(
            (F.col("iy") + F.col("dy")).alias("ny"),
            (F.col("ix") + F.col("dx")).alias("nx"),
        )
        .agg(F.sum("ping_count").alias("smoothed_count"))
    )
    joined = cells.join(
        scattered, (cells.iy == scattered.ny) & (cells.ix == scattered.nx)
    )
    return joined.select(
        F.concat(
            F.col("iy").cast("string"), F.lit(":"), F.col("ix").cast("string")
        ).alias("cell_id"),
        "ping_count",
        "smoothed_count",
        F.round(F.col("ping_count") * 1e6 / F.col("smoothed_count"))
        .cast("long")
        .alias("share_ppm"),
    )


def kring_smooth_oracle(cfg: EngineConfig = DEFAULT) -> str:
    return f"""
        WITH pings AS ({PINGS_ORACLE_SQL}),
        cells AS (
            SELECT CAST(floor(lat * {cfg.grid_scale}) AS BIGINT) AS iy,
                   CAST(floor(lon * {cfg.grid_scale}) AS BIGINT) AS ix,
                   count(*) AS ping_count
            FROM pings WHERE {VALID_SQL}
            GROUP BY 1, 2
        ),
        offsets AS (SELECT * FROM (VALUES (-1), (0), (1)) d(d)),
        scattered AS (
            SELECT c.iy + dy.d AS ny, c.ix + dx.d AS nx,
                   CAST(sum(ping_count) AS BIGINT) AS smoothed_count
            FROM cells c CROSS JOIN offsets dy CROSS JOIN offsets dx
            GROUP BY 1, 2
        )
        SELECT CAST(c.iy AS VARCHAR) || ':' || CAST(c.ix AS VARCHAR) AS cell_id,
               c.ping_count,
               s.smoothed_count,
               CAST(round(c.ping_count * 1e6 / s.smoothed_count) AS BIGINT)
                   AS share_ppm
        FROM cells c JOIN scattered s ON c.iy = s.ny AND c.ix = s.nx
    """


def q_kring_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kring_smooth(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Stay-point detection
# --------------------------------------------------------------------------

# a vehicle "stays" when >= 2 consecutive pings share a cell for >= 10 min
STAY_MIN_S = 600


def stay_points(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Per-vehicle stay points: maximal runs of consecutive same-cell
    pings dwelling >= ``STAY_MIN_S`` — the terminals/layovers extraction
    that turns raw pings into trip boundaries (the dual of ``od_matrix``,
    which keeps only endpoints; this keeps only the NON-movement).

    Gaps-and-islands on the cell sequence: lag(cell) change flag, then a
    running sum numbers the runs — both windows and the run aggregate
    share ONE (vehicleId) shuffle. Dwell math runs on floored epoch
    seconds (exact int64 in both engines). Run cardinality <= ping
    count, so nothing downstream exceeds the input.
    """
    snapped = snap_pings(pings, cfg).withColumn(
        "es", epoch_s("eventTs")
    )
    w = Window.partitionBy("vehicleId").orderBy(F.asc("eventTs"), F.asc("event_id"))
    chg = F.when(
        F.lag("cell_id").over(w).isNull()
        | (F.lag("cell_id").over(w) != F.col("cell_id")),
        F.lit(1),
    ).otherwise(F.lit(0))
    runs = snapped.select(
        "vehicleId",
        "cell_id",
        "eventTs",
        "event_id",
        "es",
        chg.alias("chg"),
    ).withColumn(
        "run_id",
        F.sum("chg").over(
            Window.partitionBy("vehicleId")
            .orderBy(F.asc("eventTs"), F.asc("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        runs.groupBy("vehicleId", "run_id")
        .agg(
            F.min("cell_id").alias("cell_id"),  # constant within a run
            F.count(F.lit(1)).alias("n_pings"),
            F.min("es").alias("stay_start_es"),
            F.max("es").alias("stay_end_es"),
        )
        .filter(
            (F.col("n_pings") >= 2)
            & (F.col("stay_end_es") - F.col("stay_start_es") >= STAY_MIN_S)
        )
        .select(
            "vehicleId",
            "cell_id",
            "n_pings",
            "stay_start_es",
            "stay_end_es",
            (F.col("stay_end_es") - F.col("stay_start_es")).alias("dwell_sec"),
        )
    )


def stay_points_oracle(cfg: EngineConfig = DEFAULT) -> str:
    return f"""
        {snapped_oracle_cte(PINGS_ORACLE_SQL, cfg)},
        seq AS (
            SELECT vehicleId, cell_id, eventTs, event_id,
                   CAST(floor(epoch(eventTs)) AS BIGINT) AS es,
                   CASE WHEN lag(cell_id) OVER w IS NULL
                          OR lag(cell_id) OVER w <> cell_id
                        THEN 1 ELSE 0 END AS chg
            FROM snapped
            WINDOW w AS (PARTITION BY vehicleId
                         ORDER BY eventTs ASC NULLS FIRST, event_id ASC NULLS FIRST)
        ),
        runs AS (
            SELECT *, sum(chg) OVER (
                       PARTITION BY vehicleId
                       ORDER BY eventTs ASC NULLS FIRST, event_id ASC NULLS FIRST
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS run_id
            FROM seq
        ),
        stays AS (
            SELECT vehicleId, run_id,
                   min(cell_id) AS cell_id,
                   count(*) AS n_pings,
                   min(es) AS stay_start_es,
                   max(es) AS stay_end_es
            FROM runs GROUP BY vehicleId, run_id
        )
        SELECT vehicleId, cell_id, n_pings, stay_start_es, stay_end_es,
               stay_end_es - stay_start_es AS dwell_sec
        FROM stays
        WHERE n_pings >= 2 AND stay_end_es - stay_start_es >= {STAY_MIN_S}
    """


def q_stay_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stay_points(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Ping-gap (sensor outage) report
# --------------------------------------------------------------------------

# a reporting gap longer than this is an outage (vehicle off / out of
# coverage) — the data-quality dial for any downstream trajectory math
GAP_OUTAGE_S = 6 * 3600


def ping_gap_report(pings: DataFrame) -> DataFrame:
    """Per-vehicle reporting-cadence profile: gap count/extremes and the
    share of gaps that are outages (> ``GAP_OUTAGE_S``) in exact ppm.

    The lag window and the aggregate share ONE (vehicleId) shuffle; all
    gap math is int64 epoch seconds, so every emitted number is exact
    (`avg_gap_sec` is the only division, rounded identically on both
    engines). This is the coverage report a fleet operator reads before
    trusting ``resample_trajectories`` or ``stay_points`` output.
    """
    w = Window.partitionBy("vehicleId").orderBy(F.asc("eventTs"), F.asc("event_id"))
    gaps = (
        validate_pings(pings)
        .withColumn("es", epoch_s("eventTs"))
        .select(
            "vehicleId", (F.col("es") - F.lag("es").over(w)).alias("gap_s")
        )
        .filter(F.col("gap_s").isNotNull())
    )
    agged = gaps.groupBy("vehicleId").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.max("gap_s").alias("max_gap_sec"),
        # half-up float-domain rounding: the quotient of two exact ints is
        # the identical double in both engines, but an exactly-on-boundary
        # rational could still split the engines' native round()
        # implementations (r11, the min_cost class)
        F.expr(
            round_half_up_sql("CAST(sum(gap_s) AS DOUBLE) / count(1)", 6)
        ).alias("avg_gap_sec"),
        F.sum(F.when(F.col("gap_s") > GAP_OUTAGE_S, 1).otherwise(0)).alias("_n_out"),
    )
    # integer `div`, not float-divide-then-cast: Spark's double->long cast
    # truncates while DuckDB's rounds, so the float path is off by one on
    # any non-terminating ratio (counts are non-negative, no sign split)
    return agged.select(
        "vehicleId",
        "n_gaps",
        "max_gap_sec",
        "avg_gap_sec",
        F.expr("_n_out * 1000000 div n_gaps").alias("outage_ppm"),
    )


def ping_gap_report_oracle() -> str:
    return f"""
        WITH pings AS ({PINGS_ORACLE_SQL}),
        valid AS (SELECT * FROM pings WHERE {VALID_SQL}),
        gaps AS (
            SELECT vehicleId,
                   CAST(floor(epoch(eventTs)) AS BIGINT)
                   - lag(CAST(floor(epoch(eventTs)) AS BIGINT)) OVER (
                         PARTITION BY vehicleId
                         ORDER BY eventTs ASC NULLS FIRST, event_id ASC NULLS FIRST
                     ) AS gap_s
            FROM valid
        )
        SELECT vehicleId,
               count(*) AS n_gaps,
               max(gap_s) AS max_gap_sec,
               {round_half_up_sql('CAST(sum(gap_s) AS DOUBLE) / count(1)', 6)}
                   AS avg_gap_sec,
               CAST(sum(CASE WHEN gap_s > {GAP_OUTAGE_S} THEN 1 ELSE 0 END)
                    * 1000000 // count(*) AS BIGINT) AS outage_ppm
        FROM gaps WHERE gap_s IS NOT NULL
        GROUP BY vehicleId
    """


def q_ping_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ping_gap_report(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Per-cell congestion percentiles
# --------------------------------------------------------------------------


def cell_speed_percentiles(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Per-cell exact speed percentiles (p50/p75) — the congestion map.

    Reuses ``percentile_disc_exact`` (functions/percentiles.py) on its
    KEYED path: the distinct-(cell, speed) aggregate plus a spillable
    running-sum window, never the built-in's per-group value map — so a
    cell with corpus-scale distinct speeds degrades to disk, not OOM.
    percentile_disc picks an EXISTING value, so the doubles cross the
    engine boundary untouched (no accumulation-order hazard).
    """
    snapped = snap_pings(pings, cfg).filter(F.col("speedKmh").isNotNull())
    return percentile_disc_exact(
        snapped, ["cell_id"], "speedKmh", [0.5, 0.75], ["p50_speed", "p75_speed"]
    )


def cell_speed_percentiles_oracle(cfg: EngineConfig = DEFAULT) -> str:
    return f"""
        {snapped_oracle_cte(PINGS_ORACLE_SQL, cfg)}
        SELECT cell_id,
               quantile_disc(speedKmh, 0.5) AS p50_speed,
               quantile_disc(speedKmh, 0.75) AS p75_speed
        FROM snapped WHERE speedKmh IS NOT NULL
        GROUP BY cell_id
    """


def q_cell_speed_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cell_speed_percentiles(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Co-dwell pairs (interval-overlap join over stay points)
# --------------------------------------------------------------------------

# minimum overlap for a co-dwell, and the coarse time bucket the interval
# join is keyed on (the bucketed range-join pattern of zone_counts applied
# to TIME instead of space: stays explode into covering 6h buckets, the
# join is equi on (cell, bucket), and the exact overlap predicate trims)
CODWELL_MIN_S = 300
CODWELL_BUCKET_S = 6 * 3600
CODWELL_CAP = 50  # max stays per (cell, bucket) slice; above = depot, dropped


def co_dwell_pairs(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Vehicle pairs whose stay intervals overlap in the same cell —
    `encounter_pairs` asks "same place, same 5 minutes"; this asks
    "parked together": interval intersection >= ``CODWELL_MIN_S``.

    NEVER a per-cell all-pairs product: each stay explodes into its
    covering coarse time buckets (``sequence`` on the bucket ints — a
    stay covers dwell/6h + 1 of them), the self-join is equi on
    (cell, bucket) with a strict vehicle ordering, duplicates from
    multi-bucket overlaps collapse via ``distinct`` on the interval
    pair BEFORE the overlap math, and the exact predicate keeps true
    overlaps only. A depot cell with years of stays joins within 6h
    slices, not across its whole history.

    The stay-point relation is lineage-cut once before the bucket
    explode: the depot-size pre-filter and both sides of the self-join
    otherwise re-plan the whole decode + stay-window frontier (4 scans
    of one file in the r12 audit — each a full scan plus the vehicleId
    window shuffle at 100 TB). Stays are tiny relative to pings (run
    cardinality <= ping count, and only >=10-min dwells survive), so
    the materialization barrier is cheap; pinned in tests/test_plans.py.
    """
    stays = cut_lineage(
        stay_points(require_ts_domain(pings, "co_dwell_pairs"), cfg).select(
            "vehicleId", "cell_id", "stay_start_es", "stay_end_es"
        ),
        eager=False,
    )
    buckets = stays.select(
        "vehicleId",
        "cell_id",
        "stay_start_es",
        "stay_end_es",
        F.explode(
            F.expr(
                spine_guard_sql(
                    f"stay_start_es div {CODWELL_BUCKET_S}",
                    f"stay_end_es div {CODWELL_BUCKET_S}",
                    "1",
                    "co_dwell_pairs",
                )
            )
        ).alias("tb"),
    )
    # depot guard, same rationale as ENC_CAP: a (cell, 6h) slice holding
    # more stays than this is a terminal — its true co-dwell pairs are
    # quadratic IN THE OUTPUT, so the slice is dropped before the self
    # join rather than letting one hot slice emit C(n, 2) rows (the same
    # count + anti-join pre-filter _capped_sorted_buckets uses)
    sized = buckets.groupBy("cell_id", "tb").agg(F.count(F.lit(1)).alias("_n"))
    hot = sized.filter(F.col("_n") > CODWELL_CAP).select("cell_id", "tb")
    buckets = buckets.join(hot, ["cell_id", "tb"], "left_anti")
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.cell_id") == F.col("b.cell_id"))
            & (F.col("a.tb") == F.col("b.tb"))
            & (F.col("a.vehicleId") < F.col("b.vehicleId")),
        )
        .select(
            F.col("a.vehicleId").alias("vehicle_a"),
            F.col("b.vehicleId").alias("vehicle_b"),
            F.col("a.cell_id").alias("cell_id"),
            F.col("a.stay_start_es").alias("a0"),
            F.col("a.stay_end_es").alias("a1"),
            F.col("b.stay_start_es").alias("b0"),
            F.col("b.stay_end_es").alias("b1"),
        )
        .distinct()
    )
    overlap = F.least("a1", "b1") - F.greatest("a0", "b0")
    return (
        cand.withColumn("overlap_sec", overlap)
        .filter(F.col("overlap_sec") >= CODWELL_MIN_S)
        .groupBy("vehicle_a", "vehicle_b", "cell_id")
        .agg(
            F.count(F.lit(1)).alias("n_codwells"),
            F.sum("overlap_sec").alias("total_overlap_sec"),
            F.max("overlap_sec").alias("max_overlap_sec"),
        )
    )


def co_dwell_pairs_oracle(cfg: EngineConfig = DEFAULT) -> str:
    stays = stay_points_oracle(cfg)
    return f"""
        WITH stays AS ({stays}),
        buckets_all AS (
            SELECT vehicleId, cell_id, stay_start_es, stay_end_es,
                   unnest(generate_series(stay_start_es // {CODWELL_BUCKET_S},
                                          stay_end_es // {CODWELL_BUCKET_S})) AS tb
            FROM stays
        ),
        sized AS (
            SELECT *, count(*) OVER (PARTITION BY cell_id, tb) AS _n
            FROM buckets_all
        ),
        buckets AS (SELECT * FROM sized WHERE _n <= {CODWELL_CAP}),
        cand AS (
            SELECT DISTINCT
                   a.vehicleId AS vehicle_a, b.vehicleId AS vehicle_b,
                   a.cell_id AS cell_id,
                   a.stay_start_es AS a0, a.stay_end_es AS a1,
                   b.stay_start_es AS b0, b.stay_end_es AS b1
            FROM buckets a JOIN buckets b
              ON a.cell_id = b.cell_id AND a.tb = b.tb
             AND a.vehicleId < b.vehicleId
        ),
        ov AS (
            SELECT *, least(a1, b1) - greatest(a0, b0) AS overlap_sec
            FROM cand
        )
        SELECT vehicle_a, vehicle_b, cell_id,
               count(*) AS n_codwells,
               CAST(sum(overlap_sec) AS BIGINT) AS total_overlap_sec,
               max(overlap_sec) AS max_overlap_sec
        FROM ov WHERE overlap_sec >= {CODWELL_MIN_S}
        GROUP BY vehicle_a, vehicle_b, cell_id
    """


def q_co_dwell_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return co_dwell_pairs(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Tile anomaly (spike) report
# --------------------------------------------------------------------------

# spike = this bucket's count >= SPIKE_X times the mean of the trailing
# TRAIL_K observed buckets, after at least MIN_HISTORY observations
SPIKE_X = 3
TRAIL_K = 4
MIN_HISTORY = 2
ANOM_BUCKET_S = 600


def tile_anomaly_report(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Per-cell demand-spike detection against the cell's own trailing
    baseline — the ops alert behind the heatmap: which tiles are
    suddenly hot RELATIVE TO THEMSELVES (an absolute threshold only
    finds the always-busy downtown).

    Grain: 10-minute buckets; the baseline is the mean of the previous
    ``TRAIL_K`` OBSERVED buckets (empty buckets are absent, not
    zero-filled — the report reads "vs recent activity", robust to
    sparse cells). The spike test is pure integer cross-multiplication
    (count * trail_n >= SPIKE_X * trail_sum), so the flag is
    engine-exact with no division anywhere. One corpus shuffle for the
    (cell, bucket) count; the trailing window runs on the
    bucket-bounded aggregate.
    """
    snapped = snap_pings(pings, cfg)
    counts = snapped.groupBy(
        "cell_id",
        F.expr(f"({epoch_s_sql('eventTs')} div {ANOM_BUCKET_S}) * {ANOM_BUCKET_S}").alias(
            "bucket_epoch"
        ),
    ).agg(F.count(F.lit(1)).alias("ping_count"))
    w = (
        Window.partitionBy("cell_id")
        .orderBy(F.asc("bucket_epoch"))
        .rowsBetween(-TRAIL_K, -1)
    )
    trailed = counts.select(
        "cell_id",
        "bucket_epoch",
        "ping_count",
        F.coalesce(F.sum("ping_count").over(w), F.lit(0)).alias("trail_sum"),
        F.count("ping_count").over(w).alias("trail_n"),
    )
    return trailed.filter(F.col("trail_n") >= MIN_HISTORY).select(
        "cell_id",
        "bucket_epoch",
        "ping_count",
        "trail_sum",
        "trail_n",
        (
            F.col("ping_count") * F.col("trail_n")
            >= F.lit(SPIKE_X) * F.col("trail_sum")
        ).alias("is_spike"),
    )


def tile_anomaly_report_oracle(cfg: EngineConfig = DEFAULT) -> str:
    return f"""
        {snapped_oracle_cte(PINGS_ORACLE_SQL, cfg)},
        counts AS (
            SELECT cell_id,
                   (CAST(floor(epoch(eventTs)) AS BIGINT) // {ANOM_BUCKET_S})
                       * {ANOM_BUCKET_S} AS bucket_epoch,
                   count(*) AS ping_count
            FROM snapped GROUP BY 1, 2
        ),
        trailed AS (
            SELECT cell_id, bucket_epoch, ping_count,
                   coalesce(CAST(sum(ping_count) OVER w AS BIGINT), 0) AS trail_sum,
                   count(ping_count) OVER w AS trail_n
            FROM counts
            WINDOW w AS (PARTITION BY cell_id ORDER BY bucket_epoch ASC
                         ROWS BETWEEN {TRAIL_K} PRECEDING AND 1 PRECEDING)
        )
        SELECT cell_id, bucket_epoch, ping_count, trail_sum, trail_n,
               ping_count * trail_n >= {SPIKE_X} * trail_sum AS is_spike
        FROM trailed WHERE trail_n >= {MIN_HISTORY}
    """


def q_tile_anomaly_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tile_anomaly_report(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Convoy clusters (connected components over the encounter graph)
# --------------------------------------------------------------------------

# vehicles paired at least this many times form a convoy edge
CONVOY_MIN_ENC = 2


def convoy_clusters(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Convoys: connected components over the repeated-encounter graph
    (pairs with >= ``CONVOY_MIN_ENC`` co-locations), labeled by the
    component's minimum vehicleId — the fleet-level grouping built on
    ``encounter_pairs`` exactly the way ``dedup_clusters`` builds
    communities on the LSH pair graph, and literally REUSING its
    pointer-jumping label propagation (dedup.py — the edge relation is
    injected, so the iterative machinery, its convergence guard, and its
    per-round lineage cut are shared, not re-implemented). min/least are
    lexicographic on the string ids in both engines."""
    from .dedup import dedup_clusters

    edges = (
        encounter_pairs(pings, cfg)
        .filter(F.col("n_encounters") >= CONVOY_MIN_ENC)
        .select(F.col("vehicle_a").alias("doc_a"), F.col("vehicle_b").alias("doc_b"))
    )
    labeled = dedup_clusters(pings, edges=edges)
    return labeled.select(
        F.col("cluster_id").alias("convoy_id"),
        F.col("doc_id").alias("vehicleId"),
        F.col("cluster_size").alias("convoy_size"),
    )


def convoy_clusters_oracle(cfg: EngineConfig = DEFAULT) -> str:
    return f"""
        WITH RECURSIVE pairs AS ({encounter_pairs_oracle(cfg)}),
        conv AS (
            SELECT vehicle_a AS doc_a, vehicle_b AS doc_b FROM pairs
            WHERE n_encounters >= {CONVOY_MIN_ENC}
        ),
        edges AS (
            SELECT doc_a, doc_b FROM conv
            UNION SELECT doc_b, doc_a FROM conv
        ),
        nodes AS (SELECT DISTINCT doc_a AS doc_id FROM edges),
        walk (doc_id, r) AS (
            SELECT doc_id, doc_id FROM nodes
            UNION
            SELECT w.doc_id, e.doc_b FROM walk w JOIN edges e ON w.r = e.doc_a
        ),
        labeled AS (SELECT doc_id, min(r) AS convoy_id FROM walk GROUP BY doc_id)
        SELECT convoy_id, doc_id AS vehicleId,
               count(*) OVER (PARTITION BY convoy_id) AS convoy_size
        FROM labeled
    """


def q_convoy_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return convoy_clusters(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Tile gap fill (calendar-spine densification)
# --------------------------------------------------------------------------

# gap-fill grain and how many busiest cells get a filled series (the
# spine is bounded by GAPFILL_TOP_CELLS x the cell's active hour range)
GAPFILL_BUCKET_S = 3600
GAPFILL_TOP_CELLS = 20


def _hour_bucket() -> F.Column:
    return F.expr(
        f"({epoch_s_sql('eventTs')} div {GAPFILL_BUCKET_S}) * {GAPFILL_BUCKET_S}"
    ).alias("h")


def _top_cell_spine(counts: DataFrame) -> DataFrame:
    """Top-N busiest cells (deterministic: total desc, cell_id asc) ->
    one row per (cell, hour) over each cell's active range. Shared by
    tile_gap_fill and tile_speed_locf so the tie-break and the bucket
    math live in exactly one place (mirrored once in the oracle CTE
    builder below)."""
    top = (
        counts.groupBy("cell_id")
        .agg(F.sum("n").alias("tot"), F.min("h").alias("mn"), F.max("h").alias("mx"))
        .orderBy(F.desc("tot"), F.asc("cell_id"))
        .limit(GAPFILL_TOP_CELLS)
    )
    return top.select(
        "cell_id",
        F.explode(
            F.expr(spine_guard_sql("mn", "mx", str(GAPFILL_BUCKET_S), "tile_gap_fill"))
        ).alias("h"),
    )


def _spine_oracle_ctes(counts_body: str) -> str:
    """counts/top/spine CTE chain over a caller-supplied counts SELECT
    body (which must emit cell_id, h, n, ...)."""
    return f"""
        counts AS ({counts_body}),
        top AS (
            SELECT cell_id, min(h) AS mn, max(h) AS mx
            FROM counts GROUP BY cell_id
            ORDER BY sum(n) DESC, cell_id ASC LIMIT {GAPFILL_TOP_CELLS}
        ),
        spine AS (
            SELECT cell_id,
                   unnest(generate_series(mn, mx, {GAPFILL_BUCKET_S})) AS h
            FROM top
        )"""


def tile_gap_fill(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Zero-filled hourly series for the busiest cells — the calendar-
    spine densification every dashboard/forecasting consumer needs (a
    chart of observed-only buckets silently interpolates over outages;
    a forecast trained on them learns the wrong seasonality).

    Spine = ``sequence(min_hour, max_hour, 3600)`` per top cell, exploded
    and LEFT-joined back to the observed counts; missing buckets emit
    ping_count 0 with ``observed`` false. Output is bounded by
    TOP_CELLS × the time range — never corpus rows — and the top-cell
    pick is a deterministic bounded sort (total desc, cell_id asc).
    """
    snapped = snap_pings(require_ts_domain(pings, "tile_gap_fill"), cfg)
    counts = snapped.groupBy("cell_id", _hour_bucket()).agg(
        F.count(F.lit(1)).alias("n")
    )
    spine = _top_cell_spine(counts)
    return spine.join(counts, ["cell_id", "h"], "left").select(
        "cell_id",
        F.col("h").alias("hour_epoch"),
        F.coalesce("n", F.lit(0)).alias("ping_count"),
        F.col("n").isNotNull().alias("observed"),
    )


def tile_gap_fill_oracle(cfg: EngineConfig = DEFAULT) -> str:
    counts_body = f"""
            SELECT cell_id,
                   (CAST(floor(epoch(eventTs)) AS BIGINT) // {GAPFILL_BUCKET_S})
                       * {GAPFILL_BUCKET_S} AS h,
                   count(*) AS n
            FROM snapped GROUP BY 1, 2"""
    return f"""
        {snapped_oracle_cte(PINGS_ORACLE_SQL, cfg)},
        {_spine_oracle_ctes(counts_body)}
        SELECT s.cell_id, s.h AS hour_epoch,
               coalesce(c.n, 0) AS ping_count,
               c.n IS NOT NULL AS observed
        FROM spine s LEFT JOIN counts c ON c.cell_id = s.cell_id AND c.h = s.h
    """


def q_tile_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tile_gap_fill(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Forward-filled (LOCF) speed series
# --------------------------------------------------------------------------


def tile_speed_locf(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Hourly average speed per top cell with gaps forward-filled
    (last-observation-carried-forward) — the other half of the
    densification story: ``tile_gap_fill`` zero-fills COUNTS (absence of
    events IS zero), while a state variable like speed must CARRY the
    last observation across unobserved hours. The fill is the
    ``last(..., ignore nulls)`` running window — the IGNORE NULLS
    surface none of the other window queries exercise. Hours before a
    cell's first observation stay NULL (nothing to carry).

    Per-bucket averages use the int64 micro-unit sum (zone_counts'
    exactness pattern) so identical doubles enter the fill on both
    engines; everything after the one corpus shuffle is bounded by
    top-N cells × the hour range.
    """
    snapped = snap_pings(require_ts_domain(pings, "tile_speed_locf"), cfg)
    micro = micro_units("speedKmh")
    counts = snapped.groupBy("cell_id", _hour_bucket()).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(micro) / F.lit(1e6) / F.count("speedKmh"), 6).alias("avg_speed"),
    )
    joined = _top_cell_spine(counts).join(counts, ["cell_id", "h"], "left")
    w = (
        Window.partitionBy("cell_id")
        .orderBy(F.asc("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "cell_id",
        F.col("h").alias("hour_epoch"),
        "avg_speed",
        F.last("avg_speed", ignorenulls=True).over(w).alias("filled_speed"),
        F.col("n").isNotNull().alias("observed"),
    )


def tile_speed_locf_oracle(cfg: EngineConfig = DEFAULT) -> str:
    counts_body = f"""
            SELECT cell_id,
                   (CAST(floor(epoch(eventTs)) AS BIGINT) // {GAPFILL_BUCKET_S})
                       * {GAPFILL_BUCKET_S} AS h,
                   count(*) AS n,
                   round(sum(TRY_CAST(round(speedKmh * 1e6) AS BIGINT)) / 1e6
                         / count(speedKmh), 6) AS avg_speed
            FROM snapped GROUP BY 1, 2"""
    return f"""
        {snapped_oracle_cte(PINGS_ORACLE_SQL, cfg)},
        {_spine_oracle_ctes(counts_body)},
        joined AS (
            SELECT s.cell_id, s.h, c.n, c.avg_speed
            FROM spine s LEFT JOIN counts c ON c.cell_id = s.cell_id AND c.h = s.h
        )
        SELECT cell_id, h AS hour_epoch, avg_speed,
               last_value(avg_speed IGNORE NULLS) OVER (
                   PARTITION BY cell_id ORDER BY h ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_speed,
               n IS NOT NULL AS observed
        FROM joined
    """


def q_tile_speed_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tile_speed_locf(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Trip distance report (position-derived odometry)
# --------------------------------------------------------------------------

# flat-earth meters per degree at the fixture's latitude band (~42.5N):
# pure multiplications keep the math engine-exact where haversine's
# sin/cos would cross two different libm implementations (the
# weighted_sample lesson). Honest approximation for city-scale extents;
# a production geodesic would be a vectorized pandas_udf.
M_PER_DEG_LAT = 111320.0
M_PER_DEG_LON = 82110.0


def trip_distance_report(pings: DataFrame) -> DataFrame:
    """Per (vehicle, hour) odometry from consecutive positions: step
    count, total distance, and max single step — the speed-from-position
    cross-check against the reported speedKmh channel (a stuck GPS shows
    zero distance with nonzero reported speed; a teleporting sensor
    shows an absurd max step).

    Each step's length is sqrt of an exact-input sum of squares (IEEE
    sqrt is exactly rounded, so the step doubles match cross-engine),
    then fixed-pointed to integer MILLIMETERS before the per-group sum —
    int64 addition is order-free, so the aggregate never depends on
    Spark's partial-aggregation order. One (vehicleId) shuffle; the lag
    window and the (vehicle, hour) aggregate share it.
    """
    w = Window.partitionBy("vehicleId").orderBy(F.asc("eventTs"), F.asc("event_id"))
    dy = (F.col("lat") - F.lag("lat").over(w)) * F.lit(M_PER_DEG_LAT)
    dx = (F.col("lon") - F.lag("lon").over(w)) * F.lit(M_PER_DEG_LON)
    steps = (
        validate_pings(pings)
        .select(
            "vehicleId",
            F.date_trunc("hour", F.col("eventTs")).alias("trip_hour"),
            F.round(F.sqrt(dy * dy + dx * dx) * 1000).cast("long").alias("step_mm"),
        )
        .filter(F.col("step_mm").isNotNull())
    )
    return steps.groupBy("vehicleId", "trip_hour").agg(
        F.count(F.lit(1)).alias("n_steps"),
        F.round(F.sum("step_mm") / 1000.0, 3).alias("dist_m"),
        F.round(F.max("step_mm") / 1000.0, 3).alias("max_step_m"),
    )


def trip_distance_report_oracle() -> str:
    return f"""
        WITH pings AS ({PINGS_ORACLE_SQL}),
        valid AS (SELECT * FROM pings WHERE {VALID_SQL}),
        deltas AS (
            -- squares spelled as multiplication: DuckDB's pow() is a
            -- libm call and need not equal x*x bit-for-bit
            SELECT vehicleId,
                   date_trunc('hour', eventTs) AS trip_hour,
                   (lat - lag(lat) OVER w) * {M_PER_DEG_LAT} AS dy,
                   (lon - lag(lon) OVER w) * {M_PER_DEG_LON} AS dx
            FROM valid
            WINDOW w AS (PARTITION BY vehicleId
                         ORDER BY eventTs ASC NULLS FIRST, event_id ASC NULLS FIRST)
        ),
        steps AS (
            SELECT vehicleId, trip_hour,
                   CAST(round(sqrt(dy * dy + dx * dx) * 1000) AS BIGINT) AS step_mm
            FROM deltas
        )
        SELECT vehicleId, trip_hour,
               count(*) AS n_steps,
               round(CAST(sum(step_mm) AS BIGINT) / 1000.0, 3) AS dist_m,
               round(max(step_mm) / 1000.0, 3) AS max_step_m
        FROM steps WHERE step_mm IS NOT NULL
        GROUP BY vehicleId, trip_hour
    """


def q_trip_distance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trip_distance_report(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# One-row mobility-pipeline dashboard
# --------------------------------------------------------------------------


def mobility_pipeline_report(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """End-to-end movement-analytics summary — the one-row ops dashboard
    a fleet team reads after a day's sweep (``dedup_pipeline_report``'s
    composition pattern applied to the mobility family): valid-ping and
    vehicle volume, occupied-cell count, stay/encounter/OD-flow volumes,
    and how many tile buckets spiked.

    Each registered stage reduces to a 1-row aggregate; the report is a
    chain of 1-row cross joins — nothing wider than one row moves after
    the stage aggregates, and every number is an exact integer count.

    The decoded ping corpus is lineage-cut once at entry: all five
    stages start from the same decode/normalize frontier, and without
    the cut each branch re-plans the events scan + JSON decode (6 scans
    of one file in the r11 audit; pinned in tests/test_plans.py). The
    per-stage snap/window work above the cut still runs per branch —
    that part is genuinely different per stage.
    """
    pings = cut_lineage(pings, eager=False)
    snapped = snap_pings(pings, cfg)
    vol = snapped.agg(
        F.count(F.lit(1)).alias("n_valid_pings"),
        F.count_distinct("vehicleId").alias("n_vehicles"),
        F.count_distinct("cell_id").alias("n_cells"),
    )
    stays = stay_points(pings, cfg).agg(F.count(F.lit(1)).alias("n_stays"))
    enc = encounter_pairs(pings, cfg).agg(
        F.count(F.lit(1)).alias("n_encounter_pairs")
    )
    od = od_matrix(pings, cfg).agg(F.count(F.lit(1)).alias("n_od_flows"))
    spikes = tile_anomaly_report(pings, cfg).agg(
        F.sum(F.when(F.col("is_spike"), 1).otherwise(0))
        .cast("long")
        .alias("n_spike_buckets")
    )
    return vol.crossJoin(stays).crossJoin(enc).crossJoin(od).crossJoin(spikes)


def mobility_pipeline_report_oracle(cfg: EngineConfig = DEFAULT) -> str:
    return f"""
        WITH stays_t AS ({stay_points_oracle(cfg)}),
        enc_t AS ({encounter_pairs_oracle(cfg)}),
        od_t AS ({od_matrix_oracle(cfg)}),
        spikes_t AS ({tile_anomaly_report_oracle(cfg)}),
        {snapped_oracle_cte(PINGS_ORACLE_SQL, cfg).lstrip().removeprefix("WITH ")},
        vol AS (
            SELECT count(*) AS n_valid_pings,
                   count(DISTINCT vehicleId) AS n_vehicles,
                   count(DISTINCT cell_id) AS n_cells
            FROM snapped
        ),
        a AS (SELECT count(*) AS n_stays FROM stays_t),
        b AS (SELECT count(*) AS n_encounter_pairs FROM enc_t),
        c AS (SELECT count(*) AS n_od_flows FROM od_t),
        d AS (SELECT CAST(sum(CASE WHEN is_spike THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_spike_buckets FROM spikes_t)
        SELECT * FROM vol CROSS JOIN a CROSS JOIN b CROSS JOIN c CROSS JOIN d
    """


def q_mobility_pipeline_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mobility_pipeline_report(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# K-hop reachability over the cell-transition graph (recursive queries)
# --------------------------------------------------------------------------

# BFS horizon: how many transition hops out from the hub the service-area
# query walks. Bounded by design — an unbounded closure over a transit
# graph is dedup_clusters' pointer-jumping CC, already implemented.
REACH_HOPS = 4


def cell_transition_edges(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Directed cell-adjacency edges observed in the fleet: one edge per
    DISTINCT (from_cell, to_cell) pair of consecutive pings of the same
    vehicle that changed cell, under the engine-total (eventTs, event_id)
    order.

    The corpus crosses the wire ONCE (the per-vehicle lag window); the
    emitted edge relation is bounded by geography² — cells × observed
    out-degree — not by ping volume.
    """
    w = Window.partitionBy("vehicleId").orderBy(F.asc("eventTs"), F.asc("event_id"))
    moves = snap_pings(pings, cfg).select(
        "cell_id", F.lag("cell_id").over(w).alias("prev_cell")
    )
    return (
        moves.filter(
            F.col("prev_cell").isNotNull() & (F.col("prev_cell") != F.col("cell_id"))
        )
        .select(
            F.col("prev_cell").alias("from_cell"), F.col("cell_id").alias("to_cell")
        )
        .distinct()
    )


def cell_reachability(
    pings: DataFrame, cfg: EngineConfig = DEFAULT, max_hops: int = REACH_HOPS
) -> DataFrame:
    """Minimum-hop reachability from the busiest cell: which cells can a
    vehicle reach within ``max_hops`` observed transitions, and in how
    few — the service-area / isochrone primitive, and the engine's
    recursive-CTE capability (Spark has no WITH RECURSIVE; the oracle IS
    one, DuckDB's, proving the iterative dataflow computes the same
    fixpoint).

    Frontier BFS as a driver loop over DataFrame steps: ``visited``
    accumulates (cell, first-seen hop) — BFS discovery order makes the
    first hop the MINIMUM hop, so no re-relaxation round is ever needed
    (hop weights are uniform). Each round is one keyed join of the
    cells-bounded frontier against the geography²-bounded edge relation
    plus an anti-join against visited; lineage is cut per round so the
    plan stays constant-size. The only driver-side value is the
    frontier's emptiness (a LIMIT-1 count) for early exit — never row
    data. At 100 TB the corpus is touched once (edge build); all K
    rounds run on cell-cardinality relations.

    Seed = highest-ping-count cell, cell_id ascending as the engine-total
    tie-break (TakeOrderedAndProject, no global sort).
    """
    snapped = snap_pings(pings, cfg)
    edges = cut_lineage(cell_transition_edges(pings, cfg), eager=True)
    seed = (
        snapped.groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("cell_id"))
        .limit(1)
        .select("cell_id")
    )
    visited = cut_lineage(
        seed.withColumn("hops", F.lit(0).cast("int")), eager=True
    )
    # per-round layers stay separate checkpointed frames (r17): the old
    # loop re-checkpointed the whole visited union every round (one
    # extra eager job per hop); a union of already-cut layers costs
    # nothing to build, each reader scans cached RDD blocks, and the
    # plan still cannot grow with lineage — only with max_hops, which
    # is a constant
    layers = [visited]
    frontier = visited.select("cell_id")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier.cell_id == edges.from_cell)
            .select(F.col("to_cell").alias("cell_id"))
            .distinct()
        )
        seen = layers[0].select("cell_id")
        for lyr in layers[1:]:
            seen = seen.unionByName(lyr.select("cell_id"))
        new = cut_lineage(
            nxt.join(seen, "cell_id", "left_anti").withColumn(
                "hops", F.lit(h).cast("int")
            ),
            eager=True,
        )
        if new.limit(1).count() == 0:
            break
        layers.append(new)
        frontier = new.select("cell_id")
    out = layers[0]
    for lyr in layers[1:]:
        out = out.unionByName(lyr)
    return out


def cell_reachability_oracle(
    cfg: EngineConfig = DEFAULT, max_hops: int = REACH_HOPS
) -> str:
    base = snapped_oracle_cte(PINGS_ORACLE_SQL, cfg)
    return f"""
        {base.replace("WITH pings", "WITH RECURSIVE pings", 1)},
        moves AS (
            SELECT cell_id,
                   lag(cell_id) OVER (
                       PARTITION BY vehicleId
                       ORDER BY eventTs ASC NULLS FIRST, event_id ASC NULLS FIRST
                   ) AS prev_cell
            FROM snapped
        ),
        edges AS (
            SELECT DISTINCT prev_cell AS from_cell, cell_id AS to_cell
            FROM moves
            WHERE prev_cell IS NOT NULL AND prev_cell <> cell_id
        ),
        seed AS (
            SELECT cell_id FROM snapped
            GROUP BY cell_id
            ORDER BY count(*) DESC, cell_id ASC
            LIMIT 1
        ),
        reach(cell_id, hops) AS (
            SELECT cell_id, CAST(0 AS INTEGER) AS hops FROM seed
            UNION
            SELECT e.to_cell, CAST(r.hops + 1 AS INTEGER) AS hops
            FROM reach r JOIN edges e ON e.from_cell = r.cell_id
            WHERE r.hops < {max_hops}
        )
        SELECT cell_id, CAST(min(hops) AS INTEGER) AS hops
        FROM reach GROUP BY cell_id
    """


def q_cell_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cell_reachability(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Home / work location inference
# --------------------------------------------------------------------------

# local-clock hour buckets: night = [22, 06), day = [09, 17)
NIGHT_START, NIGHT_END = 22, 6
DAY_START, DAY_END = 9, 17


def home_work_locations(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Per-vehicle depot ("home") and duty ("work") cell inference: the
    modal grid cell during night hours [22,06) vs day hours [09,17) —
    the fleet-ops primitive behind depot assignment audits and commute
    OD seeding (the user-mobility literature's home/work detection
    applied to vehicles).

    One corpus shuffle into (vehicleId, cell_id) conditional counts;
    both modal picks are row_number windows over the SAME vehicleId
    partitioning (one exchange over the count-bounded relation, two
    sorts), ties broken by cell_id ascending; a vehicle appears iff it
    has pings in BOTH buckets. The winner columns fold out via ONE
    conditional aggregate on the same vehicleId key — no self-join, so
    the corpus subtree is never planned twice.
    """
    hr = F.hour("eventTs")
    night = (hr >= NIGHT_START) | (hr < NIGHT_END)
    day = (hr >= DAY_START) & (hr < DAY_END)
    counts = (
        snap_pings(pings, cfg)
        .groupBy("vehicleId", "cell_id")
        .agg(
            F.sum(F.when(night, 1).otherwise(0)).cast("long").alias("night_n"),
            F.sum(F.when(day, 1).otherwise(0)).cast("long").alias("day_n"),
        )
    )
    wn = Window.partitionBy("vehicleId").orderBy(F.desc("night_n"), F.asc("cell_id"))
    wd = Window.partitionBy("vehicleId").orderBy(F.desc("day_n"), F.asc("cell_id"))
    ranked = counts.select(
        "vehicleId",
        "cell_id",
        "night_n",
        "day_n",
        F.row_number().over(wn).alias("rn_night"),
        F.row_number().over(wd).alias("rn_day"),
    )
    is_home = (F.col("rn_night") == 1) & (F.col("night_n") > 0)
    is_work = (F.col("rn_day") == 1) & (F.col("day_n") > 0)
    return (
        ranked.groupBy("vehicleId")
        .agg(
            F.max(F.when(is_home, F.col("cell_id"))).alias("home_cell"),
            F.max(F.when(is_home, F.col("night_n"))).alias("home_pings"),
            F.max(F.when(is_work, F.col("cell_id"))).alias("work_cell"),
            F.max(F.when(is_work, F.col("day_n"))).alias("work_pings"),
        )
        .filter(F.col("home_cell").isNotNull() & F.col("work_cell").isNotNull())
    )


def home_work_locations_oracle(cfg: EngineConfig = DEFAULT) -> str:
    night = f"(hour(eventTs) >= {NIGHT_START} OR hour(eventTs) < {NIGHT_END})"
    day = f"(hour(eventTs) >= {DAY_START} AND hour(eventTs) < {DAY_END})"
    return f"""
        {snapped_oracle_cte(PINGS_ORACLE_SQL, cfg)},
        counts AS (
            SELECT vehicleId, cell_id,
                   CAST(sum(CASE WHEN {night} THEN 1 ELSE 0 END) AS BIGINT) AS night_n,
                   CAST(sum(CASE WHEN {day} THEN 1 ELSE 0 END) AS BIGINT) AS day_n
            FROM snapped
            GROUP BY vehicleId, cell_id
        ),
        ranked AS (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY vehicleId ORDER BY night_n DESC, cell_id ASC
                   ) AS rn_night,
                   row_number() OVER (
                       PARTITION BY vehicleId ORDER BY day_n DESC, cell_id ASC
                   ) AS rn_day
            FROM counts
        )
        SELECT vehicleId,
               max(CASE WHEN rn_night = 1 AND night_n > 0
                        THEN cell_id END) AS home_cell,
               max(CASE WHEN rn_night = 1 AND night_n > 0
                        THEN night_n END) AS home_pings,
               max(CASE WHEN rn_day = 1 AND day_n > 0
                        THEN cell_id END) AS work_cell,
               max(CASE WHEN rn_day = 1 AND day_n > 0
                        THEN day_n END) AS work_pings
        FROM ranked
        GROUP BY vehicleId
        HAVING home_cell IS NOT NULL AND work_cell IS NOT NULL
    """


def q_home_work_locations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return home_work_locations(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Per-cell speed trend (grouped OLS regression)
# --------------------------------------------------------------------------


# OLS input-domain bounds (see cell_speed_trend docstring): hours-offset
# and milli-km/h grids safe for n*max(x^2, y^2) << 2^63 at any corpus size
OLS_X_MAX = 1_000_000
OLS_Y_MAX = 1_000_000


def cell_speed_trend(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Per-cell least-squares trend of speed over time — the congestion
    drift detector ("is this block getting slower week over week?"), and
    the engine's grouped-regression capability: the cross-engine-exact
    twin of SQL's ``regr_slope``/``regr_r2`` (whose double accumulators
    are partition-order-dependent and therefore not hash-reproducible).

    Two-stage so the regression inputs are INTEGER-exact:
    1. per (cell, clock-hour): ping count + exact micro-km/h speed sum
       (the zone_counts int64 convention) — the corpus' one shuffle;
    2. per cell over its hourly means: x = hour index relative to the
       cell's first hour (a window over the SAME cell partitioning —
       no second corpus exchange), y = floor milli-km/h hourly mean
       (integer `div`, engine-identical for non-negative speeds). The
       six OLS sums are int64 aggregates of bounded terms (x ≤ corpus
       hours ≤ ~1e5/decade, y ≤ 2e5 for 200 km/h ⇒ every sum ≪ 2^63 at
       any corpus size, since stage 2 is hours-bounded per cell); slope
       and r² are then a fixed double expression over exact integers —
       deterministic in any IEEE engine. A cell with < 2 distinct hours
       (or zero x-variance) emits NULL slope/r².

    The six-sum core lives in ``functions.ols.grouped_ols`` (r10
    verdict item #8) so provider-/corridor-level trend queries reuse
    the float discipline instead of re-deriving it.

    The OLS caller contract (n·max(x²,y²) ≪ 2^63) is ENFORCED at the
    regression input (r17): hourly points outside |x| < 1e6 hours
    (~114 years of span) or |y| < 1e6 milli-km/h (1000 km/h) are
    excluded in BOTH engines — without the guard an out-of-wire-domain
    speed surviving the total micros recovery overflows Spark's ANSI
    int64 ``y*y`` while DuckDB errors differently (the r16 --xval
    error-shape split). In-contract corpora (speeds ≤ 200 km/h,
    hours-bounded spans) never touch the bound.
    """
    micro = micro_units("speedKmh")
    hourly = (
        snap_pings(pings, cfg)
        .groupBy(
            "cell_id", F.expr(f"{epoch_s_sql('eventTs')} div 3600").alias("hour_id")
        )
        .agg(F.sum(micro).alias("sum_micro"), F.count("speedKmh").alias("n"))
        .filter(F.col("n") > 0)
    )
    w = Window.partitionBy("cell_id")
    rel = hourly.select(
        "cell_id",
        (F.col("hour_id") - F.min("hour_id").over(w)).alias("x"),
        F.expr("(sum_micro div n) div 1000").alias("y"),
        "n",
    ).filter((F.abs(F.col("x")) < OLS_X_MAX) & (F.abs(F.col("y")) < OLS_Y_MAX))
    return grouped_ols(
        rel,
        ["cell_id"],
        slope_alias="slope_milli_kmh_per_hour",
        extra_aggs=[F.sum("n").alias("n_pings")],
    ).select(
        "cell_id",
        F.col("n_points").alias("n_hours"),
        "n_pings",
        "slope_milli_kmh_per_hour",
        "r2",
    )


def cell_speed_trend_oracle(cfg: EngineConfig = DEFAULT) -> str:
    return f"""
        {snapped_oracle_cte(PINGS_ORACLE_SQL, cfg)},
        hourly AS (
            SELECT cell_id,
                   CAST(floor(epoch(eventTs)) AS BIGINT) // 3600 AS hour_id,
                   CAST(sum(TRY_CAST(round(speedKmh * 1e6) AS BIGINT)) AS BIGINT)
                       AS sum_micro,
                   count(speedKmh) AS n
            FROM snapped
            GROUP BY 1, 2
            HAVING count(speedKmh) > 0
        ),
        rel AS (
            SELECT cell_id,
                   hour_id - min(hour_id) OVER (PARTITION BY cell_id) AS x,
                   (sum_micro // n) // 1000 AS y,
                   n
            FROM hourly
        ),
        stats AS (
            SELECT cell_id,
                   {OLS_SUMS_SQL},
                   CAST(sum(n) AS BIGINT) AS n_pings
            FROM rel WHERE abs(x) < 1000000 AND abs(y) < 1000000
            GROUP BY cell_id
        )
        SELECT cell_id, n_points AS n_hours, n_pings,
               {ols_select_sql(slope_alias="slope_milli_kmh_per_hour")}
        FROM stats
    """


def q_cell_speed_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cell_speed_trend(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Frequent route segments (sequential pattern mining)
# --------------------------------------------------------------------------

ROUTE_TOP_N = 100  # report the N most-traveled 3-cell corridors


def route_trigrams(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """The ``ROUTE_TOP_N`` most-traveled 3-cell corridors: consecutive
    (cell_a -> cell_b -> cell_c) transition trigrams mined from every
    vehicle's compressed cell sequence — sequential pattern mining at
    n=3, the corridor-discovery input for transit planning (which road
    segments carry the fleet).

    The per-vehicle cell sequence is first COMPRESSED to its transition
    points (rows whose cell differs from the previous ping's — dwell
    pings repeat no corridor), then two lag windows over the compressed
    sequence emit the trigrams. Both windows and the compression filter
    share one (vehicleId) exchange and one sort — the filter preserves
    the partitioning/ordering, so Catalyst plans a single Exchange.
    The trigram aggregate is keyed by cell triples (geography-bounded ×
    observed fanout), and the top-N is TakeOrderedAndProject with the
    (count desc, cells asc) engine-total order — never a global sort.
    """
    w = Window.partitionBy("vehicleId").orderBy(F.asc("eventTs"), F.asc("event_id"))
    compressed = (
        snap_pings(pings, cfg)
        .select(
            "vehicleId",
            "eventTs",
            "event_id",
            "cell_id",
            F.lag("cell_id").over(w).alias("prev_cell"),
        )
        .filter(F.col("prev_cell").isNull() | (F.col("prev_cell") != F.col("cell_id")))
    )
    tri = compressed.select(
        "vehicleId",
        F.lag("cell_id", 2).over(w).alias("cell_a"),
        F.lag("cell_id", 1).over(w).alias("cell_b"),
        F.col("cell_id").alias("cell_c"),
    ).filter(F.col("cell_a").isNotNull())
    return (
        tri.groupBy("cell_a", "cell_b", "cell_c")
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.count_distinct("vehicleId").alias("n_vehicles"),
        )
        .orderBy(
            F.desc("n_trips"), F.asc("cell_a"), F.asc("cell_b"), F.asc("cell_c")
        )
        .limit(ROUTE_TOP_N)
    )


def route_trigrams_oracle(cfg: EngineConfig = DEFAULT) -> str:
    return f"""
        {snapped_oracle_cte(PINGS_ORACLE_SQL, cfg)},
        marked AS (
            SELECT vehicleId, eventTs, event_id, cell_id,
                   lag(cell_id) OVER (
                       PARTITION BY vehicleId
                       ORDER BY eventTs ASC NULLS FIRST, event_id ASC NULLS FIRST
                   ) AS prev_cell
            FROM snapped
        ),
        compressed AS (
            SELECT vehicleId, eventTs, event_id, cell_id
            FROM marked
            WHERE prev_cell IS NULL OR prev_cell <> cell_id
        ),
        tri AS (
            SELECT vehicleId,
                   lag(cell_id, 2) OVER (
                       PARTITION BY vehicleId
                       ORDER BY eventTs ASC NULLS FIRST, event_id ASC NULLS FIRST
                   ) AS cell_a,
                   lag(cell_id, 1) OVER (
                       PARTITION BY vehicleId
                       ORDER BY eventTs ASC NULLS FIRST, event_id ASC NULLS FIRST
                   ) AS cell_b,
                   cell_id AS cell_c
            FROM compressed
        )
        SELECT cell_a, cell_b, cell_c,
               count(*) AS n_trips,
               count(DISTINCT vehicleId) AS n_vehicles
        FROM tri
        WHERE cell_a IS NOT NULL
        GROUP BY cell_a, cell_b, cell_c
        ORDER BY n_trips DESC, cell_a ASC, cell_b ASC, cell_c ASC
        LIMIT {ROUTE_TOP_N}
    """


def q_route_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return route_trigrams(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# GPS jump / teleport QA
# --------------------------------------------------------------------------

# a leg whose position-implied speed exceeds this is a sensor glitch,
# not a vehicle (the fleet is urban transit)
JUMP_KMH = 150


def gps_jump_report(pings: DataFrame) -> DataFrame:
    """Per-vehicle teleport audit — the spatial half of the sensor-QA
    pair (``ping_gap_report`` covers silence in TIME; this covers
    impossible motion in SPACE): legs whose position-implied speed
    exceeds ``JUMP_KMH`` are GPS glitches (multipath, cold-start fixes,
    ID reuse). Reports per vehicle the leg count, jump count, jump share
    (integer ppm) and the worst implied speed.

    The violation test is the division-free integer cross-multiplication
    ``step_mm * 36 > JUMP_KMH * 1e4 * gap_s`` (exact at any magnitude;
    a zero-gap leg with nonzero displacement — two fixes at the same
    instant in different places — is flagged by the same inequality).
    The worst speed is emitted in integer milli-km/h via truncating
    division, gap>0 legs only. Same step math as
    ``trip_distance_report`` (exact-input IEEE sqrt, millimeter
    fixed-point); the lag window and the vehicle aggregate share one
    (vehicleId) exchange.
    """
    w = Window.partitionBy("vehicleId").orderBy(F.asc("eventTs"), F.asc("event_id"))
    dy = (F.col("lat") - F.lag("lat").over(w)) * F.lit(M_PER_DEG_LAT)
    dx = (F.col("lon") - F.lag("lon").over(w)) * F.lit(M_PER_DEG_LON)
    es = epoch_s("eventTs")
    legs = (
        validate_pings(pings)
        .select(
            "vehicleId",
            F.round(F.sqrt(dy * dy + dx * dx) * 1000).cast("long").alias("step_mm"),
            (es - F.lag(es).over(w)).alias("gap_s"),
        )
        .filter(F.col("step_mm").isNotNull())
    )
    is_jump = F.col("step_mm") * 36 > F.lit(JUMP_KMH) * 10_000 * F.col("gap_s")
    return legs.groupBy("vehicleId").agg(
        F.count(F.lit(1)).alias("n_legs"),
        F.sum(F.when(is_jump, 1).otherwise(0)).cast("long").alias("n_jumps"),
        F.expr(
            f"sum(CASE WHEN step_mm * 36 > {JUMP_KMH} * 10000 * gap_s "
            "THEN 1 ELSE 0 END) * 1000000 div count(*)"
        ).alias("jump_ppm"),
        F.max(
            F.when(
                F.col("gap_s") > 0,
                F.expr("(step_mm * 18) div (gap_s * 5)"),
            )
        ).alias("max_implied_milli_kmh"),
    )


def gps_jump_report_oracle() -> str:
    return f"""
        WITH pings AS ({PINGS_ORACLE_SQL}),
        valid AS (SELECT * FROM pings WHERE {VALID_SQL}),
        deltas AS (
            -- squares spelled as multiplication: DuckDB's pow() is a
            -- libm call and need not equal x*x bit-for-bit
            SELECT vehicleId,
                   (lat - lag(lat) OVER w) * {M_PER_DEG_LAT} AS dy,
                   (lon - lag(lon) OVER w) * {M_PER_DEG_LON} AS dx,
                   CAST(floor(epoch(eventTs)) AS BIGINT)
                   - lag(CAST(floor(epoch(eventTs)) AS BIGINT)) OVER w AS gap_s
            FROM valid
            WINDOW w AS (PARTITION BY vehicleId
                         ORDER BY eventTs ASC NULLS FIRST, event_id ASC NULLS FIRST)
        ),
        legs AS (
            SELECT vehicleId,
                   CAST(round(sqrt(dy * dy + dx * dx) * 1000) AS BIGINT) AS step_mm,
                   gap_s
            FROM deltas
        )
        SELECT vehicleId,
               count(*) AS n_legs,
               CAST(sum(CASE WHEN step_mm * 36 > {JUMP_KMH} * 10000 * gap_s
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_jumps,
               (CAST(sum(CASE WHEN step_mm * 36 > {JUMP_KMH} * 10000 * gap_s
                         THEN 1 ELSE 0 END) AS BIGINT) * 1000000) // count(*)
                   AS jump_ppm,
               max(CASE WHEN gap_s > 0
                        THEN (step_mm * 18) // (gap_s * 5) END)
                   AS max_implied_milli_kmh
        FROM legs WHERE step_mm IS NOT NULL
        GROUP BY vehicleId
    """


def q_gps_jump_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gps_jump_report(pings_from_events(spark, sf_dir))
