"""Window-family generalizations beyond the reference's single tumbling
window (SURVEY.md §2.5 — the reference roadmap hints at multi-window merges;
a real deployment needs sliding and session windows, and hot-cell skew
handling).

- sliding window: ``window(ts, width, slide)`` — each event lands in
  width/slide buckets. Oracle: union of shifted tumbling buckets.
- session window: ``session_window(ts, gap)`` — per-key activity sessions.
  Oracle: classic gaps-and-islands (lag + cumulative session counter).
- salted aggregation: two-phase groupBy that pre-splits hot keys across
  ``N_SALTS`` partial groups before the final combine. Result is identical
  to the plain aggregate (the oracle IS the plain aggregate) — the point is
  the shuffle shape: a hot cell's rows spread over N_SALTS reducers instead
  of one.
- percentiles: exact interpolated percentiles (Spark ``percentile`` ==
  DuckDB ``quantile_cont``) + approx variant (rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..lineage import cut_lineage
from ..functions.rounding import (
    avg_2dec_exact_sql,
    fixed_units,
    fixed_units_sql,
    round0,
    round_half_up,
    round_half_up_sql,
)
from ..operators.tiles import snap_pings, snapped_oracle_cte
from ..operators.validate import VALID_SQL, require_event_time, validate_pings
from ..sources.tables import PINGS_ORACLE_SQL, load_table, pings_from_events

# engine-exact per-group mean speed (r11): speeds are 2-decimal by wire
# contract, so the sum accumulates exact int64 CENTS (order-free,
# associative) and both engines divide the identical exact values once —
# a plain round(avg(DOUBLE), 6) sums ulp-drifting doubles in
# engine-specific order AND natively rounds a boundary-capable rational.
# One fragment, valid in both Spark SQL and DuckDB.
AVG_SPEED_EXACT = avg_2dec_exact_sql("speedKmh", 6)

SLIDE_MIN = 5
WIDTH_MIN = 10
SESSION_GAP_MIN = 30
N_SALTS = 8


def sliding_cell_counts(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """10-minute windows sliding every 5: overlapping hot-spot smoothing."""
    snapped = snap_pings(pings, cfg)
    return (
        snapped.groupBy(
            F.window("eventTs", f"{WIDTH_MIN} minutes", f"{SLIDE_MIN} minutes").alias("w"),
            "cell_id",
        )
        .agg(
            F.count(F.lit(1)).alias("ping_count"),
            F.expr(AVG_SPEED_EXACT).alias("avg_speed_kmh"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cell_id",
            "ping_count",
            "avg_speed_kmh",
        )
    )


def sliding_cell_counts_oracle(cfg: EngineConfig = DEFAULT) -> str:
    # each event belongs to WIDTH/SLIDE = 2 sliding windows: the one whose
    # start is its 5-min bucket, and the one starting 5 minutes earlier
    shifts = ", ".join(str(k * SLIDE_MIN) for k in range(WIDTH_MIN // SLIDE_MIN))
    return f"""
        {snapped_oracle_cte(PINGS_ORACLE_SQL, cfg)},
        assigned AS (
            SELECT s.*,
                   time_bucket(INTERVAL '{SLIDE_MIN} minutes', eventTs)
                       - to_minutes(shift.s) AS window_start
            FROM snapped s, (SELECT unnest([{shifts}]) AS s) shift
        )
        SELECT window_start,
               window_start + INTERVAL '{WIDTH_MIN} minutes' AS window_end,
               cell_id,
               count(*) AS ping_count,
               {AVG_SPEED_EXACT} AS avg_speed_kmh
        FROM assigned
        GROUP BY window_start, cell_id
    """


def vehicle_sessions(pings: DataFrame) -> DataFrame:
    """Per-vehicle activity sessions: a new session starts after a
    >30-minute silence. Streaming twin: ``F.session_window`` (same gap
    semantics; Spark merges windows in state)."""
    s = F.session_window("eventTs", f"{SESSION_GAP_MIN} minutes")
    # sessions run on VALIDATED pings (r12): the streaming twin always
    # validated at ingestion, so a NULL-provider row reached its state
    # store never but the batch aggregate always — the r12 NULL-provider
    # perturbed sweep caught the 62-session split. Batch, stream, and
    # oracle now share the validity conjunction. No require_event_time
    # wrapper here (r12 advice): validation IS the NULL-eventTs boundary
    # (its isNotNull conjunct drops the row, matching the oracle's WHERE),
    # and wrapping the guard INSIDE validate_pings would make the filter
    # evaluate the raising CASE column — a NULL ts would error instead of
    # being dropped, diverging from the oracle.
    return (
        validate_pings(pings)
        .groupBy("provider", "vehicleId", s.alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n_pings"),
            F.expr(AVG_SPEED_EXACT).alias("avg_speed_kmh"),
        )
        .select(
            "provider",
            "vehicleId",
            F.col("s.start").alias("session_start"),
            "n_pings",
            "avg_speed_kmh",
        )
    )


def vehicle_sessions_oracle(pings_sql: str = PINGS_ORACLE_SQL) -> str:
    """Parameterized on the pings SELECT so the streaming twin can pass
    the bounded stream event-time domain (streaming/sources.py)."""
    return f"""
        WITH pings AS ({pings_sql}),
        flagged AS (
            SELECT provider, vehicleId, eventTs, speedKmh,
                   CASE WHEN eventTs - lag(eventTs) OVER w > INTERVAL '{SESSION_GAP_MIN} minutes'
                             OR lag(eventTs) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM pings
            WHERE {VALID_SQL}
            WINDOW w AS (PARTITION BY provider, vehicleId ORDER BY eventTs)
        ),
        numbered AS (
            SELECT *, sum(new_session) OVER (PARTITION BY provider, vehicleId ORDER BY eventTs) AS session_no
            FROM flagged
        )
        SELECT provider, vehicleId,
               min(eventTs) AS session_start,
               count(*) AS n_pings,
               {AVG_SPEED_EXACT} AS avg_speed_kmh
        FROM numbered
        GROUP BY provider, vehicleId, session_no
    """


def vehicle_trips(pings: DataFrame) -> DataFrame:
    """Batch twin of the ``applyInPandasWithState`` trip detector
    (streaming/stateful.py): segment each vehicle's pings into trips at
    >``SESSION_GAP_MIN``-minute silences — gap flag via ``lag``, trip
    number via a running sum, one aggregate per trip. Same semantics as
    the stateful operator's state machine (a test asserts the streaming
    detector's closed trips equal this relation), but expressible as two
    window passes over ONE shuffle+sort per vehicle partition, which is
    how the backfill of a streaming pipeline should run. Oracle-checked
    (the stateful operator itself is not SQL-expressible; this twin is
    the bridge that makes its semantics hash-verifiable)."""
    w = Window.partitionBy("provider", "vehicleId").orderBy("eventTs", "event_id")
    gap = F.col("eventTs").cast("long") - F.lag(F.col("eventTs").cast("long")).over(w)
    new_trip = F.when(
        gap.isNull() | (gap > SESSION_GAP_MIN * 60), F.lit(1)
    ).otherwise(F.lit(0))
    numbered = require_event_time(pings).select(
        "provider", "vehicleId", "eventTs", "event_id",
        F.sum(new_trip).over(w).alias("trip_no"),
    )
    return numbered.groupBy("provider", "vehicleId", "trip_no").agg(
        F.min("eventTs").alias("trip_start"),
        F.max("eventTs").alias("trip_end"),
        F.count(F.lit(1)).alias("n_pings"),
    )


VEHICLE_TRIPS_ORACLE = f"""
    WITH pings AS ({PINGS_ORACLE_SQL}),
    flagged AS (
        SELECT provider, vehicleId, eventTs, event_id,
               CASE WHEN lag(eventTs) OVER w IS NULL
                         OR eventTs - lag(eventTs) OVER w > INTERVAL '{SESSION_GAP_MIN} minutes'
                    THEN 1 ELSE 0 END AS new_trip
        FROM pings
        WINDOW w AS (PARTITION BY provider, vehicleId ORDER BY eventTs, event_id)
    ),
    numbered AS (
        -- (eventTs, event_id) is unique, so the default RANGE frame of the
        -- running sum degenerates to ROWS — same as Spark's
        -- CAST: DuckDB window SUM(int) yields HUGEINT, which pandas renders as
        -- float64 and the driver's value-hash then sees 5.0 != Spark's 5.
        SELECT *, CAST(sum(new_trip) OVER (PARTITION BY provider, vehicleId
                                           ORDER BY eventTs, event_id) AS BIGINT) AS trip_no
        FROM flagged
    )
    SELECT provider, vehicleId, trip_no,
           min(eventTs) AS trip_start,
           max(eventTs) AS trip_end,
           count(*) AS n_pings
    FROM numbered
    GROUP BY provider, vehicleId, trip_no
"""


def q_vehicle_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vehicle_trips(pings_from_events(spark, sf_dir))


def salted_cell_counts(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Skew-resistant two-phase aggregate for hot cells (a city-center cell
    is the classic skew key — SURVEY.md §7). Phase 1 groups on
    (cell, salt) so a hot cell's rows land on N_SALTS reducers; phase 2
    combines the partials. Output == plain groupBy (the oracle)."""
    snapped = snap_pings(pings, cfg).withColumn(
        "__salt", F.pmod(F.xxhash64("vehicleId", "eventTs"), F.lit(N_SALTS))
    )
    partial = snapped.groupBy("cell_id", "__salt").agg(
        F.count(F.lit(1)).alias("c"),
        # exact cents partials (r17): a raw double sum is partition-order
        # dependent, so the salted two-phase plan could legally disagree
        # with the oracle's single-phase sum on extreme values; guarded
        # int64 cents in DECIMAL(38,0) are order-free and total
        F.sum(fixed_units("speedKmh", 100).cast("decimal(38,0)")).alias("s"),
    )
    # sum (not avg): per-cell ping counts here are powers of two, so an avg
    # terminates exactly on the round() half-boundary where Spark
    # (BigDecimal HALF_UP) and DuckDB (binary rounding) legitimately differ
    return partial.groupBy("cell_id").agg(
        F.sum("c").alias("ping_count"),
        round_half_up(F.sum("s").cast("double") / 100, 2).alias("sum_speed_kmh"),
    )


def salted_cell_counts_oracle(cfg: EngineConfig = DEFAULT) -> str:
    return f"""
        {snapped_oracle_cte(PINGS_ORACLE_SQL, cfg)}
        SELECT cell_id, count(*) AS ping_count,
               {round_half_up_sql(
                   f"CAST(sum({fixed_units_sql('speedKmh', '100')}) AS DOUBLE)"
                   " / 100", 2)} AS sum_speed_kmh
        FROM snapped GROUP BY cell_id
    """


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact interpolated percentiles of event value per event_type."""
    return events.groupBy("event_type").agg(
        round0(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        round0(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        round0(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


VALUE_PERCENTILES_ORACLE = """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) + CAST(0.0 AS DOUBLE) AS p50,
           round(quantile_cont(value, 0.95), 6) + CAST(0.0 AS DOUBLE) AS p95,
           round(quantile_cont(value, 0.99), 6) + CAST(0.0 AS DOUBLE) AS p99
    FROM events GROUP BY event_type
"""


def approx_value_percentiles(events: DataFrame) -> DataFrame:
    """Sketch-based percentiles (KLL-style approx_percentile): the 100 TB
    path — mergeable constant-size state. Rows-only check (sketch results
    are engine-specific); the array result is split into scalar columns so
    row-count/schema harnesses can still process the output."""
    agg = events.groupBy("event_type").agg(
        F.expr("approx_percentile(value, array(0.5, 0.95, 0.99), 1000)").alias("p")
    )
    return agg.select(
        "event_type",
        F.col("p").getItem(0).alias("p50_approx"),
        F.col("p").getItem(1).alias("p95_approx"),
        F.col("p").getItem(2).alias("p99_approx"),
    )


PCTL_QS = ((50, "p50"), (95, "p95"), (99, "p99"))


def approx_percentile_accuracy(events: DataFrame) -> DataFrame:
    """Oracle-checkable accuracy report for the percentile sketch (r7
    verdict item #4): per event_type, the exact non-null count plus one
    RANK-error flag per quantile. ``approx_percentile(value, q, acc)``
    guarantees it returns a dataset element whose rank is within
    n/acc of ceil(q*n); the flag re-derives that element's true rank
    interval [cnt_lt+1, cnt_le] from one extra aggregate pass and checks
    the target rank lands inside it, widened by the sketch margin
    (2*n/acc + 1 for safety). The estimates themselves never appear in
    the output — the oracle asserts TRUE and the hash fails exactly when
    a sketch violates its rank guarantee.

    Scale: the sketch aggregate output is one row per event_type (a
    domain-bounded relation), broadcast back into the fact scan; total
    cost is two passes over events, no expand."""
    agg = events.groupBy("event_type").agg(
        F.expr("approx_percentile(value, array(0.5, 0.95, 0.99), 1000)").alias("p"),
        F.count("value").alias("n"),
    )
    est = agg.select(
        "event_type",
        "n",
        *[F.col("p").getItem(i).alias(f"est_{name}") for i, (_, name) in enumerate(PCTL_QS)],
    )
    # eqNullSafe: groupBy emits a NULL event_type group and est carries
    # its row — a null-unsafe equi-join would silently drop that group
    # while the oracle's GROUP BY still emits it (r8 advice #1)
    ev = events.select("event_type", "value").withColumnRenamed("event_type", "ev_type")
    joined = ev.join(F.broadcast(est), F.col("ev_type").eqNullSafe(F.col("event_type")))
    rank_aggs = []
    for _, name in PCTL_QS:
        rank_aggs += [
            F.sum((F.col("value") < F.col(f"est_{name}")).cast("long")).alias(f"lt_{name}"),
            F.sum((F.col("value") <= F.col(f"est_{name}")).cast("long")).alias(f"le_{name}"),
        ]
    ranks = joined.groupBy("event_type", "n").agg(*rank_aggs)
    # rank check scaled by 100 (t100 = q100*n, margin100 = 2*n/1000*100
    # + 100 = n/5 + 100); magnitudes stay far below 2^53, so the double
    # division in m100 is exact enough for a >=1-unit-wide margin
    out_cols = [F.col("event_type"), F.col("n")]
    for q100, name in PCTL_QS:
        t100 = F.col("n") * q100
        m100 = F.col("n") / 5 + 100
        ok = (F.col(f"lt_{name}") * 100 < t100 + m100) & (
            F.col(f"le_{name}") * 100 >= t100 - m100
        )
        # an all-NULL value group has n = 0, NULL estimates, and NULL
        # rank sums -> ok would be NULL while the oracle emits TRUE; the
        # bound holds vacuously for an empty sample
        out_cols.append(F.when(F.col("n") == 0, F.lit(True)).otherwise(ok).alias(f"{name}_ok"))
    return ranks.select(*out_cols)


APPROX_PERCENTILE_ACCURACY_ORACLE = """
    SELECT event_type, count(value) AS n,
           TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
    FROM events GROUP BY event_type
"""


HIST_BINS = 20
HIST_LO, HIST_HI = 0.0, 500.0  # fixture events.value spans 0.01..490


# width_bucket spelled out as shared arithmetic (DuckDB 1.0 lacks the
# builtin): below-range -> 0, above-range -> nbins+1, else 1-based bin
_STEP = (HIST_HI - HIST_LO) / HIST_BINS
_BIN_SQL = (
    f"CASE WHEN value < {HIST_LO} THEN 0 "
    f"WHEN value >= {HIST_HI} THEN {HIST_BINS + 1} "
    f"ELSE CAST(floor((value - {HIST_LO}) / CAST({_STEP} AS DOUBLE)) AS BIGINT) + 1 END"
)


def value_histogram(events: DataFrame) -> DataFrame:
    """Fixed-width histogram of event value per event_type — the binning
    aggregate behind any server-side distribution chart. The bucket is a
    pure column expression, so the whole thing is one map-side bucketed
    hash aggregate; bin count (not row count) crosses the shuffle."""
    return (
        events.groupBy("event_type", F.expr(_BIN_SQL).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bin",
            (F.lit(HIST_LO) + (F.col("bin") - 1) * F.lit(_STEP)).alias("bin_lo"),
            "n",
        )
    )


VALUE_HISTOGRAM_ORACLE = f"""
    SELECT event_type,
           {_BIN_SQL} AS bin,
           {HIST_LO} + ({_BIN_SQL} - 1) * CAST({_STEP} AS DOUBLE) AS bin_lo,
           count(*) AS n
    FROM events
    GROUP BY event_type, {_BIN_SQL}
"""


# DOUBLE min/max are emitted as NUMERIC columns, not strings (r15
# --xval): double->VARCHAR rendering is engine-specific outside the
# plain-decimal band (Spark flips to E-notation at 1e7 and prints
# 'E308' where DuckDB prints 'e+308'), so a profile that stringifies a
# double column hash-splits on magnitudes both engines agree on. The
# numeric cells carry the exact value; string cells stay for the types
# whose casts are engine-identical (ints, timestamps, varchar).
def _profile_cell(c: str) -> str:
    if c == "value":  # the DOUBLE column
        return (
            f"'{c}', {c}__null_rate, {c}__n_distinct, CAST(NULL AS STRING), "
            f"CAST(NULL AS STRING), CAST({c}__min AS DOUBLE), CAST({c}__max AS DOUBLE)"
        )
    return (
        f"'{c}', {c}__null_rate, {c}__n_distinct, {c}__min, {c}__max, "
        f"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)"
    )


def table_profile(events: DataFrame) -> DataFrame:
    """Column-profile aggregate (null rate, distinct count, min/max as
    strings) — the data-quality pass a pipeline runs before training,
    unpivoted executor-side via stack().

    The six exact ``count_distinct`` columns compile to a 6-way Expand;
    keeping the cheap profiles (nulls, min/max) in a separate no-Expand
    pass and cross-joining the two 1-row results halved the measured
    cost vs the fused wide aggregate (same trick as
    ``table_profile_accuracy``)."""
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    cheap_aggs, exact_aggs = [], []
    for c in cols:
        cheap_aggs += [
            round_half_up(F.avg(F.col(c).isNull().cast("double")), 6).alias(f"{c}__null_rate"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
        exact_aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__n_distinct"))
    wide = events.agg(*cheap_aggs).crossJoin(F.broadcast(events.agg(*exact_aggs)))
    stack_args = ", ".join(_profile_cell(c) for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, null_rate, n_distinct, min_str, max_str, min_num, max_num)"
    )


def table_profile_approx(events: DataFrame) -> DataFrame:
    """The 100 TB variant of ``table_profile``: distinct counts via
    ``approx_count_distinct`` (HyperLogLog++, default 5% rsd).

    The exact profile's six ``count_distinct`` columns compile to a 6-way
    Expand — six full-cardinality shuffles, which is the one plan in this
    module not shippable at 100 TB. HLL sketches are fixed-size partial
    aggregates: one scan, map-side combine, one tiny shuffle, no Expand.
    Estimates are engine-specific, so this entry is rows-only at the
    driver; the exact twin stays oracle-checked and an accuracy-bound
    pytest pins the estimates to within HLL tolerance of the exact
    counts (same pattern as ``approx_distinct_vehicles``)."""
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    aggs = []
    for c in cols:
        aggs += [
            round_half_up(F.avg(F.col(c).isNull().cast("double")), 6).alias(f"{c}__null_rate"),
            F.approx_count_distinct(F.col(c)).alias(f"{c}__n_distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = events.agg(*aggs)
    stack_args = ", ".join(_profile_cell(c) for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, null_rate, n_distinct, min_str, max_str, min_num, max_num)"
    )


def q_table_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table_profile_approx(load_table(spark, sf_dir, "events"))


def table_profile_accuracy(events: DataFrame) -> DataFrame:
    """Oracle-checkable accuracy report for the HLL column profile (r7
    verdict item #4): the exact profile columns plus one within-bound
    flag comparing ``approx_count_distinct`` (default 5% rsd) against
    the exact distinct count. The estimate itself never appears in the
    output — the oracle asserts TRUE per column and the driver hash
    fails exactly when a sketch violates its 3-sigma bound (±15%
    relative, absolute slack 3, exact integer arithmetic).

    Two aggregate passes, not one: the six exact ``count_distinct``
    columns compile to a 6-way Expand, and fusing the sketch/min/max
    work into that aggregate would drag it through 6x the rows — so the
    cheap single-pass profile (nulls, sketches, min/max) and the
    Expand-paying exact-distinct pass run separately and their 1-row
    results cross-join (bench: 5.6s fused -> split recovers the
    ``table_profile`` baseline + the sketch pass)."""
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    cheap_aggs, exact_aggs = [], []
    for c in cols:
        cheap_aggs += [
            round_half_up(F.avg(F.col(c).isNull().cast("double")), 6).alias(f"{c}__null_rate"),
            F.approx_count_distinct(F.col(c)).alias(f"{c}__est"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
        exact_aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__n_distinct"))
    wide = events.agg(*cheap_aggs).crossJoin(F.broadcast(events.agg(*exact_aggs)))
    bound_args = ", ".join(
        f"{_profile_cell(c)}, "
        f"abs({c}__est - {c}__n_distinct) * 100 <= greatest({c}__n_distinct * 15, 300)"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {bound_args}) AS "
        "(column_name, null_rate, n_distinct, min_str, max_str, min_num, max_num, "
        "distinct_within_bound)"
    )


def table_profile_accuracy_oracle() -> str:
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    selects = [
        f"""SELECT '{c}' AS column_name,
                   {round_half_up_sql(f'avg(CASE WHEN {c} IS NULL THEN 1.0 ELSE 0.0 END)', 6)} AS null_rate,
                   count(DISTINCT {c}) AS n_distinct,
                   {_profile_minmax_duck(c)},
                   TRUE AS distinct_within_bound
            FROM events"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(selects)


def q_table_profile_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table_profile_accuracy(load_table(spark, sf_dir, "events"))


def q_approx_percentile_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_percentile_accuracy(load_table(spark, sf_dir, "events"))


def _profile_minmax_duck(c: str) -> str:
    if c == "value":
        return (
            "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str, "
            f"CAST(min({c}) AS DOUBLE) AS min_num, CAST(max({c}) AS DOUBLE) AS max_num"
        )
    return (
        f"CAST(min({c}) AS VARCHAR) AS min_str, CAST(max({c}) AS VARCHAR) AS max_str, "
        "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num"
    )


def table_profile_oracle() -> str:
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    selects = [
        f"""SELECT '{c}' AS column_name,
                   {round_half_up_sql(f'avg(CASE WHEN {c} IS NULL THEN 1.0 ELSE 0.0 END)', 6)} AS null_rate,
                   count(DISTINCT {c}) AS n_distinct,
                   {_profile_minmax_duck(c)}
            FROM events"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(selects)


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_histogram(load_table(spark, sf_dir, "events"))


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table_profile(load_table(spark, sf_dir, "events"))


def vehicle_travel_stats(pings: DataFrame) -> DataFrame:
    """Per-vehicle trajectory stats from consecutive-ping deltas (lag
    windows): leg count, total and max Manhattan displacement in degrees.
    One shuffle+sort per (provider, vehicleId) partition; the lag frame
    is tie-broken on event_id so legs are deterministic."""
    from pyspark.sql import Window

    w = Window.partitionBy("provider", "vehicleId").orderBy("eventTs", "event_id")
    leg = (
        F.abs(F.col("lat") - F.lag("lat").over(w))
        + F.abs(F.col("lon") - F.lag("lon").over(w))
    )
    with_leg = require_event_time(pings).select("provider", "vehicleId", leg.alias("leg"))
    # total displacement accumulates as exact integer micro-degrees:
    # int64 sums are associative, so partition/engine summation order can
    # never flip the 6-decimal rounding (the recent_tiles_merged lesson);
    # max is order-independent, so it rounds the raw double directly
    micro = F.round(F.col("leg") * 1e6).cast("long")
    return (
        with_leg.filter(F.col("leg").isNotNull())
        .groupBy("provider", "vehicleId")
        .agg(
            F.count(F.lit(1)).alias("n_legs"),
            # identity rounding: sum(micro)/1e6 has exactly 6 decimals,
            # so this native round can never sit on a boundary
            F.round(F.sum(micro) / F.lit(1e6), 6).alias("total_disp_deg"),
            # max(leg) is an identical arbitrary double in both engines;
            # half-up float-domain rounding so an exactly-on-boundary
            # value can't split the engines' native round() (r11)
            round_half_up(F.max("leg"), 6).alias("max_leg_deg"),
        )
    )


VEHICLE_TRAVEL_STATS_ORACLE = f"""
    WITH pings AS ({PINGS_ORACLE_SQL}),
    legs AS (
        SELECT provider, vehicleId,
               abs(lat - lag(lat) OVER w) + abs(lon - lag(lon) OVER w) AS leg
        FROM pings
        WINDOW w AS (PARTITION BY provider, vehicleId ORDER BY eventTs, event_id)
    )
    SELECT provider, vehicleId,
           count(*) AS n_legs,
           round(sum(CAST(round(leg * 1e6) AS BIGINT)) / 1e6, 6) AS total_disp_deg,
           {round_half_up_sql('max(leg)', 6)} AS max_leg_deg
    FROM legs WHERE leg IS NOT NULL
    GROUP BY provider, vehicleId
"""


def q_vehicle_travel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vehicle_travel_stats(pings_from_events(spark, sf_dir))


def q_sliding_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_cell_counts(pings_from_events(spark, sf_dir))


def q_vehicle_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vehicle_sessions(pings_from_events(spark, sf_dir))


def q_salted_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return salted_cell_counts(pings_from_events(spark, sf_dir))


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_percentiles(load_table(spark, sf_dir, "events"))


def q_approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_value_percentiles(load_table(spark, sf_dir, "events"))


def scd2_user_segments(events: DataFrame) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event stream (the
    CDC pattern a training pipeline uses to version document/user
    metadata): per user, each CHANGE of event_type opens a new
    effective-dated segment row; the next change closes it.

    Shape: one shuffle on user_id feeds all three window passes (lag for
    change detection, row_number for version, lead to close the
    interval) — Spark plans them in a single sort since the
    partitioning/ordering agree. Deterministic tie-break on event_id, so
    the dimension is reproducible from any replay of the log. The open
    row per user has effective_to NULL / is_current true — the join-key
    shape a point-in-time lookup (asof join, already registered) probes.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # change detection is NULL-DISTINCT (r12): "first row for the user"
    # is detected via lag(event_id) (a non-null key), and segment change
    # via null-safe inequality. A plain prev != seg is NULL for NULL
    # segments, which both missed NULL-segment transitions AND broke the
    # merge path's compression idempotence (a kept row whose lag
    # happened to be a NULL segment re-compressed away) — the r12
    # NULL-provider perturbed sweep caught the incremental/full split.
    changes = (
        events.select(
            "user_id", F.col("event_type").alias("segment"), "ts", "event_id"
        )
        .withColumn("prev_segment", F.lag("segment").over(w))
        .withColumn("prev_event", F.lag("event_id").over(w))
        .filter(
            F.col("prev_event").isNull()
            | ~F.col("prev_segment").eqNullSafe(F.col("segment"))
        )
        .drop("prev_event")
    )
    return (
        changes.withColumn("version", F.row_number().over(w))
        .withColumn("effective_to", F.lead("ts").over(w))
        .select(
            "user_id",
            "segment",
            F.col("ts").alias("effective_from"),
            "effective_to",
            "version",
            F.col("effective_to").isNull().alias("is_current"),
        )
    )


SCD2_USER_SEGMENTS_ORACLE = """
    WITH changes AS (
        SELECT user_id, segment, ts, event_id FROM (
            SELECT user_id, event_type AS segment, ts, event_id,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_segment,
                   lag(event_id) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_event
            FROM events
        ) WHERE prev_event IS NULL OR prev_segment IS DISTINCT FROM segment
    )
    SELECT user_id, segment, ts AS effective_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS effective_to,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS version,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               AS is_current
    FROM changes
"""


def q_scd2_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_user_segments(load_table(spark, sf_dir, "events"))


SCD2_CUTOFF = "2024-01-24"  # history/delta split inside the fixture range


def _scd2_changes(rows: DataFrame) -> DataFrame:
    """Change-detect a (user_id, segment, ts, event_id) stream: keep the
    rows where the segment differs from the user's previous row. Input
    may be raw events OR an already-compressed change set unioned with
    new raw rows — compression is idempotent, so re-detection over a
    merged stream reproduces exactly the full-history change set."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NULL-DISTINCT change detection (see scd2_user_segments): only this
    # form is idempotent over an already-compressed set with NULL
    # segments, which the merge path's exactness proof relies on
    return (
        rows.withColumn("prev_segment", F.lag("segment").over(w))
        .withColumn("prev_event", F.lag("event_id").over(w))
        .filter(
            F.col("prev_event").isNull()
            | ~F.col("prev_segment").eqNullSafe(F.col("segment"))
        )
        .select("user_id", "segment", "ts", "event_id")
    )


def _scd2_finalize(changes: DataFrame) -> DataFrame:
    """Version + effective-date a change set (the scd2_user_segments
    output shape)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.withColumn("version", F.row_number().over(w))
        .withColumn("effective_to", F.lead("ts").over(w))
        .select(
            "user_id",
            "segment",
            F.col("ts").alias("effective_from"),
            "effective_to",
            "version",
            F.col("effective_to").isNull().alias("is_current"),
        )
    )


def scd2_merge_apply(events: DataFrame) -> DataFrame:
    """Incremental Type-2 dimension maintenance — the MERGE that absorbs
    a new event batch into a stored SCD2 dimension WITHOUT rescanning
    history events (``rollup_delta_merge``'s pattern applied to
    effective-dated dimensions, the nightly-dim job at 100 TB).

    The stored snapshot is the compressed change set (one row per
    segment change — it carries ``event_id`` so the engine-total
    tie-break survives storage; recomputed here from the pre-cutoff
    events only for self-containment). The merge touches ONLY users
    present in the delta: their snapshot rows union the delta's raw
    rows and flow through the same change detection — compression is
    idempotent and every delta row sorts after the user's history, so
    the first delta event is compared against the user's last stored
    segment, exactly as a full rebuild would. Untouched users'
    rows pass through (re-finalized here; stored as-is in production).

    Cost: the delta aggregate is batch-sized; the rebuild shuffle is
    keyed on TOUCHED users' change rows + delta rows, never history
    events. The oracle is the FULL REBUILD over all events
    (``SCD2_USER_SEGMENTS_ORACLE``) — hash-equality proves the
    incremental path exact.
    """
    shaped = events.select(
        "user_id", F.col("event_type").alias("segment"), "ts", "event_id"
    )
    cutoff = F.lit(SCD2_CUTOFF).cast("timestamp")
    # both materialized once (r17): the snapshot feeds the untouched-keep
    # anti-join AND the touched-rebuild semi-join (each previously re-ran
    # the history scan + change-detect window), and the delta feeds the
    # touched-user distinct AND the merge union (guide §2.4 — 5 events
    # scans in the before plan, 1 after)
    snapshot = cut_lineage(
        _scd2_changes(shaped.filter(F.col("ts") < cutoff)), eager=False
    )
    delta = cut_lineage(shaped.filter(F.col("ts") >= cutoff), eager=False)
    touched = delta.select("user_id").distinct()
    keep = _scd2_finalize(snapshot.join(touched, "user_id", "left_anti"))
    merged = snapshot.join(touched, "user_id", "left_semi").unionByName(delta)
    rebuilt = _scd2_finalize(_scd2_changes(merged))
    return keep.unionByName(rebuilt)


def q_scd2_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_merge_apply(load_table(spark, sf_dir, "events"))
