"""Mobility-science statistics over the ping stream — the published
human-mobility descriptors (radius of gyration, visit entropy, jump-length
distribution) plus an integer-exact CUSUM anomaly detector on the daily
volume series.

The reference's surface stops at per-cell densities and latest positions
(heatmap_stream.py:96-132); a fleet analyst's standard next step is the
mobility-pattern literature's per-entity descriptors (Gonzalez et al.,
"Understanding individual human mobility patterns", Nature 2008: radius of
gyration and the truncated-power-law jump-length distribution; Song et al.,
"Limits of predictability in human mobility", Science 2010: visit entropy).
The CUSUM detector is Page's classic sequential test, restated as the
prefix-sum/running-extreme identity so it is two window functions, not a
recursive loop.

Scale shapes (same discipline as flows.py):
- ``radius_of_gyration``: per-vehicle centroid via a partition-only window
  and the deviation aggregate share ONE (vehicleId) exchange; output is
  |vehicles| rows.
- ``location_entropy``: two-level aggregate (vehicleId, cell_id) ->
  (vehicleId); the first shuffle is the only corpus-sized one and
  map-side combines; the second runs on |vehicles x cells-visited| rows.
- ``jump_length_report``: the lag window is one (vehicleId) exchange; the
  bin aggregate map-side combines into <= N_BINS rows, and the share
  window runs on those N_BINS rows only.
- ``cusum_anomaly_report``: the daily aggregate is one corpus shuffle with
  partial aggregation (|providers x days| output); both CUSUM windows run
  per provider over a days-bounded series — a single task per provider,
  bounded by calendar length, never by ping volume.

Float discipline (SCALE.md "cross-engine value contract"): distances are
millimeter fixed-point through IEEE-exact sqrt (the ``trip_distance_report``
pattern); entropy is emitted in integer micro-nats (the ``lm_score``
pattern — ln() of identical integer inputs, summed over a per-vehicle
cell list that is hundreds long, leaves ~1e-11 nats of order noise against
a 1e-6 rounding grid); the CUSUM series is pure BIGINT arithmetic. The
one rounded-double output is ``radius_of_gyration.rg_m`` (round 3): the
window-avg centroid differs between engines only by summation order
(~1e-9 m against a 1e-3 m grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..functions.guards import spine_guard_days_sql
from ..operators.flows import M_PER_DEG_LAT, M_PER_DEG_LON
from ..operators.tiles import snap_pings, snapped_oracle_cte
from ..operators.validate import VALID_SQL, require_ts_domain, validate_pings
from ..sources.tables import PINGS_ORACLE_SQL, pings_from_events

# jump-length histogram: decade bins in millimeters. A leg shorter than a
# meter is GPS jitter; beyond 10 km it's a teleport (gps_jump_report's
# territory). Decade edges as INTEGER thresholds — binning never touches a
# float comparison.
JUMP_BIN_EDGES_MM = (1_000, 10_000, 100_000, 1_000_000, 10_000_000)

# CUSUM slack: the per-step drift allowance k is ref/20 (5% of the
# provider's mean daily volume), the usual "half the shift you want to
# detect" tuned to flag sustained ~10% excursions.
CUSUM_SLACK_DIV = 20


# --------------------------------------------------------------------------
# Radius of gyration
# --------------------------------------------------------------------------


# offsets that make the fixed-point coordinates nonnegative (lat >= -90,
# lon >= -180 after validation), so the centroid's integer division has
# positive operands — where DuckDB's floor `//` and Spark's truncating
# `div` agree. Deviations are offset-invariant.
_OFF_Y_MM = 90 * 111320 * 1000
_OFF_X_MM = 180 * 82110 * 1000


def radius_of_gyration(pings: DataFrame) -> DataFrame:
    """Per-vehicle radius of gyration in meters: the RMS distance of a
    vehicle's pings from its own centroid (the size of the territory it
    actually covers — THE single-number mobility descriptor of Gonzalez
    et al. 2008).

    Two-pass shape without a second shuffle: the centroid is a
    partition-only window aggregate over (vehicleId) and the deviation
    aggregate groups by the same key — Catalyst plans one exchange.

    ENGINE-EXACT end to end (a float window-avg centroid flipped a
    round-3 boundary on real data — summation order alone moves avg by
    ~1e-5 m at city magnitudes): coordinates are millimeter BIGINTs
    (one shared exactly-rounded double product chain, then round), the
    centroid is an exact integer division of an exact DECIMAL/HUGEINT
    sum (offset keeps operands positive, where floor == truncate), and
    dev^2 sums are exact integers. The ONLY double is the final
    CAST(exact integer AS DOUBLE) — correctly rounded to the identical
    value in both engines — followed by exactly-rounded /, sqrt, and
    round, so the emitted rg_m is bit-deterministic.
    """
    wv = "(PARTITION BY vehicleId)"
    base = validate_pings(pings).select(
        "vehicleId",
        F.expr(
            f"CAST(round(lat * {M_PER_DEG_LAT} * 1000) AS BIGINT) + {_OFF_Y_MM}"
        ).alias("y_mm"),
        F.expr(
            f"CAST(round(lon * {M_PER_DEG_LON} * 1000) AS BIGINT) + {_OFF_X_MM}"
        ).alias("x_mm"),
    )
    cent = base.select(
        "vehicleId",
        "y_mm",
        "x_mm",
        F.expr(
            f"CAST(sum(CAST(y_mm AS DECIMAL(38,0))) OVER {wv}"
            f" div count(*) OVER {wv} AS BIGINT)"
        ).alias("cy"),
        F.expr(
            f"CAST(sum(CAST(x_mm AS DECIMAL(38,0))) OVER {wv}"
            f" div count(*) OVER {wv} AS BIGINT)"
        ).alias("cx"),
    )
    # dev fits DECIMAL(11,0) (planet-wide span < 4.4e10 mm); squares are
    # DECIMAL(23,0), their sum DECIMAL(34,0) — exact at any fleet size
    dev2 = cent.select(
        "vehicleId",
        F.expr(
            "CAST(y_mm - cy AS DECIMAL(11,0)) * CAST(y_mm - cy AS DECIMAL(11,0))"
            " + CAST(x_mm - cx AS DECIMAL(11,0)) * CAST(x_mm - cx AS DECIMAL(11,0))"
        ).alias("dev2"),
    )
    return dev2.groupBy("vehicleId").agg(
        F.count(F.lit(1)).alias("n_pings"),
        F.expr(
            "round(sqrt(CAST(sum(dev2) AS DOUBLE) / CAST(count(*) AS DOUBLE))"
            " / 1000, 3)"
        ).alias("rg_m"),
        F.expr("round(sqrt(CAST(max(dev2) AS DOUBLE)) / 1000, 3)").alias("max_dev_m"),
    )


def radius_of_gyration_oracle() -> str:
    return f"""
        WITH pings AS ({PINGS_ORACLE_SQL}),
        valid AS (SELECT * FROM pings WHERE {VALID_SQL}),
        proj AS (
            SELECT vehicleId,
                   CAST(round(lat * {M_PER_DEG_LAT} * 1000) AS BIGINT)
                       + {_OFF_Y_MM} AS y_mm,
                   CAST(round(lon * {M_PER_DEG_LON} * 1000) AS BIGINT)
                       + {_OFF_X_MM} AS x_mm
            FROM valid
        ),
        cent AS (
            SELECT vehicleId, y_mm, x_mm,
                   CAST(sum(y_mm) OVER w // count(*) OVER w AS BIGINT) AS cy,
                   CAST(sum(x_mm) OVER w // count(*) OVER w AS BIGINT) AS cx
            FROM proj
            WINDOW w AS (PARTITION BY vehicleId)
        ),
        dev AS (
            SELECT vehicleId,
                   CAST(y_mm - cy AS HUGEINT) * (y_mm - cy)
                 + CAST(x_mm - cx AS HUGEINT) * (x_mm - cx) AS dev2
            FROM cent
        )
        SELECT vehicleId,
               count(*) AS n_pings,
               round(sqrt(CAST(sum(dev2) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                     / 1000, 3) AS rg_m,
               round(sqrt(CAST(max(dev2) AS DOUBLE)) / 1000, 3) AS max_dev_m
        FROM dev
        GROUP BY vehicleId
    """


def q_radius_of_gyration(spark: SparkSession, sf_dir: str) -> DataFrame:
    return radius_of_gyration(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Location entropy
# --------------------------------------------------------------------------


def location_entropy(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Per-vehicle Shannon entropy of the visited-cell distribution, in
    integer micro-nats (Song et al. 2010's "random entropy" S_unc — the
    upper bound on how unpredictable a vehicle's location is), plus the
    top-cell concentration in integer ppm.

    H = ln(n) - (sum_i c_i ln c_i) / n over the per-cell visit counts
    c_i. Float discipline (r10 advice #3, the ``lm_score`` pattern):
    each per-cell contribution c*ln(c) is fixed-pointed to an integer
    micro-nat BEFORE the per-vehicle sum, so the aggregate accumulates
    exact BIGINTs and cross-engine summation order / libm-ln ulp drift
    cannot move the result; the single remaining ln(n) term runs on one
    exact integer per group. The final division is integer (truncating
    in both engines — operands are non-negative).
    """
    cells = (
        snap_pings(pings, cfg)
        .groupBy("vehicleId", "cell_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "u",
            # half-up via floor(x + 0.5) — the shared engine-exact form
            # (r12: native integer round() is repr-based in Spark vs
            # float-domain in DuckDB; the term is non-negative)
            F.expr(
                "CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))"
                " * 1000000 + 5e-1) AS BIGINT)"
            ),
        )
    )
    return cells.groupBy("vehicleId").agg(
        F.sum("c").alias("n_pings"),
        F.count(F.lit(1)).alias("n_cells"),
        F.expr(
            "CAST(floor(ln(CAST(sum(c) AS DOUBLE)) * 1000000 + 5e-1) AS BIGINT)"
            " - (sum(u) div sum(c))"
        ).alias("entropy_unats"),
        F.expr("max(c) * 1000000 div sum(c)").alias("top_share_ppm"),
    )


def location_entropy_oracle(cfg: EngineConfig = DEFAULT) -> str:
    return f"""
        {snapped_oracle_cte(PINGS_ORACLE_SQL, cfg)},
        cells AS (
            SELECT vehicleId, cell_id, count(*) AS c,
                   CAST(floor(count(*) * ln(CAST(count(*) AS DOUBLE))
                        * 1000000 + 5e-1) AS BIGINT) AS u
            FROM snapped
            GROUP BY vehicleId, cell_id
        )
        SELECT vehicleId,
               CAST(sum(c) AS BIGINT) AS n_pings,
               count(*) AS n_cells,
               CAST(floor(ln(CAST(sum(c) AS DOUBLE)) * 1000000 + 5e-1) AS BIGINT)
                   - (CAST(sum(u) AS BIGINT) // CAST(sum(c) AS BIGINT))
                   AS entropy_unats,
               (max(c) * 1000000) // CAST(sum(c) AS BIGINT) AS top_share_ppm
        FROM cells
        GROUP BY vehicleId
    """


def q_location_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return location_entropy(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Jump-length distribution
# --------------------------------------------------------------------------


def jump_length_report(pings: DataFrame) -> DataFrame:
    """Fleet-wide distribution of per-leg displacements, decade-binned —
    the jump-length histogram whose truncated-power-law shape is the
    signature finding of the human-mobility literature, and the fleet-QA
    complement of ``gps_jump_report`` (that flags implausible legs per
    vehicle; this shows where the mass of ALL legs lives).

    Legs reuse ``trip_distance_report``'s millimeter fixed-point step
    (IEEE-exact sqrt, then integer everywhere): decade binning is pure
    BIGINT comparison, the mean is an exact DECIMAL(38,0) sum divided
    with integer ``div`` (a plain BIGINT sum of worst-case steps would
    overflow past ~2e8 legs per bin), and shares are integer ppm. The
    lag window is one (vehicleId) exchange; the bin aggregate map-side
    combines to <= 6 rows and the share window runs on those rows only.
    """
    w = Window.partitionBy("vehicleId").orderBy(F.asc("eventTs"), F.asc("event_id"))
    dy = (F.col("lat") - F.lag("lat").over(w)) * F.lit(M_PER_DEG_LAT)
    dx = (F.col("lon") - F.lag("lon").over(w)) * F.lit(M_PER_DEG_LON)
    legs = (
        validate_pings(pings)
        .select(
            "vehicleId",
            F.round(F.sqrt(dy * dy + dx * dx) * 1000).cast("long").alias("step_mm"),
        )
        .filter(F.col("step_mm").isNotNull())
    )
    edges = JUMP_BIN_EDGES_MM
    bin_id = F.when(F.col("step_mm") < edges[0], 0)
    for i, e in enumerate(edges[1:], start=1):
        bin_id = bin_id.when(F.col("step_mm") < e, i)
    bin_id = bin_id.otherwise(len(edges))
    lo_mm = F.when(F.col("bin_id") == 0, 0)
    for i, e in enumerate(edges):
        lo_mm = lo_mm.when(F.col("bin_id") == i + 1, e)
    binned = (
        legs.select(bin_id.alias("bin_id"), "step_mm")
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_legs"),
            F.expr(
                "CAST(sum(CAST(step_mm AS DECIMAL(38,0))) div count(*) AS BIGINT)"
            ).alias("mean_step_mm"),
        )
    )
    wall = Window.partitionBy()
    return binned.select(
        "bin_id",
        lo_mm.cast("long").alias("lo_mm"),
        "n_legs",
        F.sum("n_legs").over(wall).alias("_total"),
        "mean_step_mm",
    ).select(
        "bin_id",
        "lo_mm",
        "n_legs",
        # integer div on BOTH engines: Spark CAST(double AS LONG) truncates
        # while DuckDB CAST rounds, so a float share can never be cast here
        F.expr("n_legs * 1000000 div _total").alias("share_ppm"),
        "mean_step_mm",
    )


def jump_length_report_oracle() -> str:
    edges = JUMP_BIN_EDGES_MM
    bin_case = "CASE WHEN step_mm < 1000 THEN 0 " + " ".join(
        f"WHEN step_mm < {e} THEN {i}" for i, e in enumerate(edges[1:], start=1)
    ) + f" ELSE {len(edges)} END"
    lo_case = "CASE WHEN bin_id = 0 THEN 0 " + " ".join(
        f"WHEN bin_id = {i + 1} THEN {e}" for i, e in enumerate(edges)
    ) + " END"
    return f"""
        WITH pings AS ({PINGS_ORACLE_SQL}),
        valid AS (SELECT * FROM pings WHERE {VALID_SQL}),
        deltas AS (
            SELECT vehicleId,
                   (lat - lag(lat) OVER w) * {M_PER_DEG_LAT} AS dy,
                   (lon - lag(lon) OVER w) * {M_PER_DEG_LON} AS dx
            FROM valid
            WINDOW w AS (PARTITION BY vehicleId
                         ORDER BY eventTs ASC NULLS FIRST, event_id ASC NULLS FIRST)
        ),
        legs AS (
            SELECT vehicleId,
                   CAST(round(sqrt(dy * dy + dx * dx) * 1000) AS BIGINT) AS step_mm
            FROM deltas
            WHERE dy IS NOT NULL
        ),
        binned AS (
            SELECT {bin_case} AS bin_id,
                   count(*) AS n_legs,
                   CAST(sum(step_mm) // count(*) AS BIGINT) AS mean_step_mm
            FROM legs
            GROUP BY 1
        )
        SELECT bin_id,
               CAST({lo_case} AS BIGINT) AS lo_mm,
               n_legs,
               CAST((n_legs * 1000000) // CAST(sum(n_legs) OVER () AS BIGINT)
                    AS BIGINT) AS share_ppm,
               mean_step_mm
        FROM binned
    """


def q_jump_length_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jump_length_report(pings_from_events(spark, sf_dir))


# --------------------------------------------------------------------------
# CUSUM anomaly detection on the daily volume series
# --------------------------------------------------------------------------


def cusum_anomaly_report(pings: DataFrame) -> DataFrame:
    """Page's CUSUM sequential change detector over each provider's daily
    ping-count series, pure BIGINT end to end.

    The textbook recursion S_t = max(0, S_{t-1} + x_t - ref - k) is not
    window-expressible, but its closed form is: with C_t the prefix sum
    of (x_t - ref - k), S_t = C_t - least(0, min_{j<=t} C_j). That turns
    the detector into one cumulative sum plus one cumulative extreme —
    two frames over the SAME ordered window, and the downward detector
    mirrors it with max. ref (the provider's mean daily volume) and the
    slack k are integer divisions, so the whole series is exact 64-bit
    arithmetic — no float ever enters the comparison with the alarm
    threshold.

    A day's ``spike_flag`` fires when the accumulated excess exceeds one
    full average day of volume (h = ref), the "one extra day's worth of
    traffic" alarm; ``drop_flag`` is the mirror-image outage alarm.

    Calendar densification (r10 advice #2): a fully-silent day produces
    no aggregate row at all, so without densification a TOTAL outage
    would be invisible to ``drop_flag`` (and would inflate ``ref``) —
    each provider's daily series is therefore completed to its full
    [min(day), max(day)] calendar with zero-count rows BEFORE the
    reference mean and the CUSUM windows. Single-pass shape: the
    natural calendar-LEFT-JOIN-observed formulation plans the corpus
    aggregate into BOTH branches (two full scans at 100 TB), so instead
    ONE per-provider aggregate folds the observed days into a
    day->count map (bounded: days-per-provider is the corpus time span,
    ~4k entries/decade) and the exploded calendar looks counts up with
    ``element_at`` — no join, one corpus exchange, and the resulting
    (provider) partitioning feeds the CUSUM windows without a further
    shuffle. The DuckDB oracle keeps the equivalent join formulation.
    """
    observed = (
        validate_pings(require_ts_domain(pings, "cusum_anomaly_report"))
        .groupBy("provider", F.date_trunc("day", F.col("eventTs")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n_pings"))
    )
    daily = (
        observed.groupBy("provider")
        .agg(
            F.min("day").alias("_d0"),
            F.max("day").alias("_d1"),
            F.map_from_entries(
                F.collect_list(F.struct("day", "n_pings"))
            ).alias("_counts"),
        )
        .select(
            "provider",
            F.explode(
                F.expr(spine_guard_days_sql("_d0", "_d1", "cusum_anomaly_report"))
            ).alias("day"),
            "_counts",
        )
        .select(
            "provider",
            "day",
            F.coalesce(F.element_at("_counts", F.col("day")), F.lit(0)).alias(
                "n_pings"
            ),
        )
    )
    wp = Window.partitionBy("provider")
    wcum = (
        Window.partitionBy("provider")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # integer div for ref (Spark CAST(double) truncates, DuckDB CAST rounds
    # — a float ref can never be cast): totals as columns, then `div`
    with_ref = (
        daily.select(
            "provider",
            "day",
            "n_pings",
            F.sum("n_pings").over(wp).alias("_tot"),
            F.count(F.lit(1)).over(wp).alias("_days"),
        )
        .withColumn("ref_pings", F.expr("_tot div _days"))
        .withColumn("k", F.expr(f"ref_pings div {CUSUM_SLACK_DIV}"))
    )
    c_up = F.sum(F.col("n_pings") - F.col("ref_pings") - F.col("k")).over(wcum)
    c_dn = F.sum(F.col("n_pings") - F.col("ref_pings") + F.col("k")).over(wcum)
    scored = with_ref.select(
        "provider",
        "day",
        "n_pings",
        "ref_pings",
        c_up.alias("c_up"),
        c_dn.alias("c_dn"),
    ).select(
        "provider",
        "day",
        "n_pings",
        "ref_pings",
        (F.col("c_up") - F.least(F.lit(0), F.min("c_up").over(wcum))).alias("cusum_up"),
        (F.greatest(F.lit(0), F.max("c_dn").over(wcum)) - F.col("c_dn")).alias(
            "cusum_down"
        ),
    )
    return scored.select(
        "provider",
        "day",
        "n_pings",
        "ref_pings",
        "cusum_up",
        "cusum_down",
        (F.col("cusum_up") > F.col("ref_pings")).alias("spike_flag"),
        (F.col("cusum_down") > F.col("ref_pings")).alias("drop_flag"),
    )


def cusum_anomaly_report_oracle() -> str:
    return f"""
        WITH pings AS ({PINGS_ORACLE_SQL}),
        valid AS (SELECT * FROM pings WHERE {VALID_SQL}),
        observed AS (
            SELECT provider,
                   CAST(CAST(eventTs AS DATE) AS TIMESTAMP) AS day,
                   count(*) AS n_pings
            FROM valid
            GROUP BY 1, 2
        ),
        calendar AS (
            SELECT provider,
                   unnest(generate_series(min(day), max(day),
                                          INTERVAL 1 DAY)) AS day
            FROM observed
            GROUP BY provider
        ),
        daily AS (
            SELECT calendar.provider, calendar.day,
                   coalesce(observed.n_pings, 0) AS n_pings
            FROM calendar
            LEFT JOIN observed
              ON calendar.provider = observed.provider
             AND calendar.day = observed.day
        ),
        refd AS (
            SELECT provider, day, n_pings,
                   CAST(CAST(sum(n_pings) OVER w AS BIGINT)
                        // CAST(count(*) OVER w AS BIGINT) AS BIGINT) AS ref_pings
            FROM daily
            WINDOW w AS (PARTITION BY provider)
        ),
        cum AS (
            SELECT provider, day, n_pings, ref_pings,
                   CAST(sum(n_pings - ref_pings - ref_pings // {CUSUM_SLACK_DIV})
                        OVER wc AS BIGINT) AS c_up,
                   CAST(sum(n_pings - ref_pings + ref_pings // {CUSUM_SLACK_DIV})
                        OVER wc AS BIGINT) AS c_dn
            FROM refd
            WINDOW wc AS (PARTITION BY provider ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        scored AS (
            SELECT provider, day, n_pings, ref_pings,
                   c_up - least(0, min(c_up) OVER wc) AS cusum_up,
                   greatest(0, max(c_dn) OVER wc) - c_dn AS cusum_down
            FROM cum
            WINDOW wc AS (PARTITION BY provider ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT provider, day, n_pings, ref_pings, cusum_up, cusum_down,
               cusum_up > ref_pings AS spike_flag,
               cusum_down > ref_pings AS drop_flag
        FROM scored
    """


def q_cusum_anomaly_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cusum_anomaly_report(pings_from_events(spark, sf_dir))
