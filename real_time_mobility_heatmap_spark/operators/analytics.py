"""Event-analytics operators over the ``events`` table.

Warehouse-standard user-behavior queries the reference's serving layer
would grow into: cohort retention, behavioral transition matrices, and
statistical outlier flagging. The reference models vehicles emitting a
keyed event stream (heatmap_stream.py:79-107); these are the same
keyed-stream analytics applied to users instead of vehicles.

All arithmetic that crosses the oracle boundary is integer (epoch-second
buckets, parts-per-million shares) or rounded to 6 dp, the repo-wide
cross-engine convention.

Scale notes (100 TB posture):
- ``cohort_retention``: one shuffle keyed on user_id (window min), one on
  (cohort, offset); the cohort-size side of the final join is bounded by
  the number of calendar weeks in the corpus -> broadcast is safe.
- ``markov_transitions``: one shuffle keyed on user_id for the lag window;
  the transition matrix is |event_type|^2 rows -> the per-prev total is a
  tiny window, never a driver collect.
- ``zscore_outliers``: per-type moments via one map-side-combined hash
  aggregate (5 groups); stats join back is a broadcast of |event_type|
  rows, so the flagging pass is map-side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.epochs import epoch_s_sql
from ..functions.percentiles import percentile_disc_exact
from ..functions.rounding import fixed_units, fixed_units_sql, round0, round0_sql
from ..functions.rounding import round_half_up, round_half_up_sql
from ..lineage import cut_lineage
from ..sources.tables import load_table

WEEK_S = 7 * 24 * 3600  # cohort bucket width, epoch seconds


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users active N weeks after their first week.

    ``cohort_epoch`` is the epoch-aligned week of a user's first event;
    ``week_offset`` counts weeks since; ``retention_ppm`` is the share of
    the cohort still active, in parts-per-million (integer-exact).
    """
    per_user = events.select(
        "user_id",
        F.expr(f"({epoch_s_sql('ts')} div {WEEK_S}) * {WEEK_S}").alias("week_epoch"),
    )
    w = Window.partitionBy("user_id")
    active = (
        per_user.withColumn("cohort_epoch", F.min("week_epoch").over(w))
        .select("user_id", "cohort_epoch", "week_epoch")
        .distinct()
    )
    counts = active.groupBy(
        "cohort_epoch",
        F.expr(f"(week_epoch - cohort_epoch) div {WEEK_S}").alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("n_active"))
    # offset-0 row counts every cohort member (a user is active in their own
    # first week by construction) -> cohort size; bounded by corpus weeks.
    sizes = counts.filter(F.col("week_offset") == 0).select(
        "cohort_epoch", F.col("n_active").alias("cohort_size")
    )
    return counts.join(F.broadcast(sizes), "cohort_epoch").select(
        "cohort_epoch",
        "week_offset",
        "n_active",
        F.expr("n_active * 1000000 div cohort_size").alias("retention_ppm"),
    )


COHORT_RETENTION_ORACLE = f"""
    WITH pu AS (
        SELECT user_id,
               (CAST(floor(epoch(ts)) AS BIGINT) // {WEEK_S}) * {WEEK_S} AS week_epoch
        FROM events
    ),
    act AS (
        SELECT DISTINCT user_id, week_epoch,
               min(week_epoch) OVER (PARTITION BY user_id) AS cohort_epoch
        FROM pu
    ),
    counts AS (
        SELECT cohort_epoch,
               (week_epoch - cohort_epoch) // {WEEK_S} AS week_offset,
               count(*) AS n_active
        FROM act GROUP BY 1, 2
    )
    SELECT c.cohort_epoch, c.week_offset, c.n_active,
           (c.n_active * 1000000) // s.cohort_size AS retention_ppm
    FROM counts c
    JOIN (SELECT cohort_epoch, n_active AS cohort_size
          FROM counts WHERE week_offset = 0) s USING (cohort_epoch)
"""


def markov_transitions(events: DataFrame) -> DataFrame:
    """Per-user event-type transition matrix with integer-ppm probabilities.

    The behavioral model behind next-event prediction / funnel design:
    order each user's stream by (ts, event_id), count (prev -> next)
    transitions, and normalize per source state.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    per_prev = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.expr("n_transitions * 1000000").alias("_num"),
        F.sum("n_transitions").over(per_prev).alias("_den"),
    ).select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.expr("_num div _den").alias("prob_ppm"),
    )


MARKOV_TRANSITIONS_ORACLE = """
    WITH t AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type,
               event_type AS next_type
        FROM events
    ),
    counts AS (
        SELECT prev_type, next_type, count(*) AS n_transitions
        FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n_transitions,
           CAST((n_transitions * 1000000)
               // CAST(sum(n_transitions) OVER (PARTITION BY prev_type)
                       AS BIGINT) AS BIGINT) AS prob_ppm
    FROM counts
"""


def zscore_outliers(events: DataFrame) -> DataFrame:
    """Per-event-type z-score outlier flags on ``value``.

    Moments are computed once per type (sum / sum-of-squares, sample
    variance) and joined back broadcast, so the row-level pass stays
    map-side. z is rounded to 6 dp BEFORE thresholding so the outlier
    flag is a deterministic function of the rounded score in both engines.
    """
    # r12: value is 2-decimal by wire contract — moments accumulate
    # exact int64 CENTS (s1) and an exact DECIMAL(38,0) sum of CENTS^2
    # (s2), so mean/std are identical doubles in both engines regardless
    # of partition sum order, and z rounds via the shared half-up form
    # (the double-sum moments were the stronger order-dependent class).
    # s2 is decimal, not int64 (r12 advice): at the 100 TB design scale
    # (~1e12 rows/type at cents~1e5, cents^2~1e10) an int64 sum exceeds
    # 2^63 and Spark sum(long) WRAPS silently while DuckDB promotes
    # BIGINT sums to HUGEINT — the exact silent-divergence class the
    # cents form exists to kill. Per-row cents^2 stays exact in
    # decimal(19,0)^2 -> (38,0), and sum(decimal(38,0)) is an exact
    # order-free integer up to 1e38 (~1e26 rows/type of headroom); the
    # single decimal->double conversion mirrors HUGEINT->DOUBLE
    # (round-to-nearest on the same exact integer).
    # n is the NON-NULL value count (r12 advice): s1/s2 skip NULLs, so
    # dividing by count(*) under a NULL-carrying corpus biased every
    # moment — standard avg/stddev semantics divide by count(value).
    cents = fixed_units("value", 100)
    cents_dec = cents.cast("decimal(19,0)")
    stats = events.groupBy("event_type").agg(
        F.count(F.col("value")).alias("_n"),
        F.sum(cents).alias("_s1c"),
        F.sum(cents_dec * cents_dec).alias("_s2c"),
    )
    stats = stats.select(
        "event_type",
        (F.col("_s1c").cast("double") / 100 / F.col("_n")).alias("_mean"),
        F.sqrt(
            (
                F.col("_s2c").cast("double") / 10000
                - (F.col("_s1c").cast("double") / 100)
                * (F.col("_s1c").cast("double") / 100)
                / F.col("_n")
            )
            / (F.col("_n") - 1)
        ).alias("_std"),
    )
    flagged = (
        events.select("event_id", "event_type", "value")
        .join(F.broadcast(stats), "event_type")
        .withColumn(
            "zscore",
            round_half_up((F.col("value") - F.col("_mean")) / F.col("_std"), 6),
        )
    )
    return flagged.select(
        "event_id",
        "event_type",
        "value",
        "zscore",
        (F.abs(F.col("zscore")) > 2.0).alias("is_outlier"),
    )


ZSCORE_OUTLIERS_ORACLE = f"""
    WITH s AS (
        SELECT event_type,
               count(value) AS n,
               sum({fixed_units_sql('value', '100')}) AS s1c,
               sum(CAST({fixed_units_sql('value', '100')} AS HUGEINT)
                   * CAST({fixed_units_sql('value', '100')} AS HUGEINT)) AS s2c
        FROM events GROUP BY 1
    ),
    m AS (
        SELECT event_type, CAST(s1c AS DOUBLE) / 100 / n AS mean_v,
               sqrt((CAST(s2c AS DOUBLE) / 10000
                     - (CAST(s1c AS DOUBLE) / 100)
                       * (CAST(s1c AS DOUBLE) / 100) / n) / (n - 1)) AS std_v
        FROM s
    )
    SELECT e.event_id, e.event_type, e.value,
           {round_half_up_sql('(e.value - m.mean_v) / m.std_v', 6)} AS zscore,
           abs({round_half_up_sql('(e.value - m.mean_v) / m.std_v', 6)}) > 2.0 AS is_outlier
    FROM events e JOIN m USING (event_type)
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cohort_retention(load_table(spark, sf_dir, "events"))


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return markov_transitions(load_table(spark, sf_dir, "events"))


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zscore_outliers(load_table(spark, sf_dir, "events"))


MAD_K = 3  # flag |value - median| > MAD_K * MAD


def mad_outliers(events: DataFrame) -> DataFrame:
    """Robust outlier detection per event_type: median / MAD instead of
    ``zscore_outliers``' mean / stddev — the variant that survives the
    very outliers it hunts (a single 1e9 reading inflates a stddev
    threshold into uselessness but moves a median by one rank).

    Determinism: both statistics are discrete percentiles (an ELEMENT of
    the data, engine-identical — verified against DuckDB quantile_disc),
    and the flag compares IEEE-exact |v - med| against MAD_K * mad, so
    no accumulation-order or libm drift exists anywhere. Two bounded
    stats aggregates (|event_type| rows each) broadcast back into the
    scan; rows with NULL value can never flag (NULL comparison).

    Scale (r8 verdict item #3): the medians are computed with
    ``percentile_disc_exact`` — distinct-value counts plus a spillable
    running-sum window — NOT the built-in ``percentile_disc``, whose
    per-group value->count aggregation buffer must FIT in one executor's
    memory (an OOM once a per-event_type group's distinct values are
    corpus-scale). Memory here is bounded by distinct values per group
    in a hash aggregate and the window sort is disk-backed; semantics
    are pinned identical to the built-in by tests/test_analytics.py.
    """
    med = percentile_disc_exact(events, ["event_type"], "value", [0.5], ["med"])
    with_med = events.join(F.broadcast(med), "event_type")
    mad = percentile_disc_exact(
        with_med.withColumn("dev", F.abs(F.col("value") - F.col("med"))),
        ["event_type"],
        "dev",
        [0.5],
        ["mad"],
    )
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .filter(F.abs(F.col("value") - F.col("med")) > MAD_K * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            round0("value", 6).alias("value"),
            round0("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            F.round(F.abs(F.col("value") - F.col("med")), 6).alias("deviation"),
        )
    )


MAD_OUTLIERS_ORACLE = f"""
    WITH med AS (
        SELECT event_type, quantile_disc(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    wm AS (
        SELECT e.*, m.med FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_disc(abs(value - med), 0.5) AS mad
        FROM wm GROUP BY event_type
    )
    SELECT w.event_id, w.event_type,
           {round0_sql('w.value', 6)} AS value,
           {round0_sql('w.med', 6)} AS med,
           round(d.mad, 6) AS mad,
           round(abs(w.value - w.med), 6) AS deviation
    FROM wm w JOIN mad d USING (event_type)
    WHERE abs(w.value - w.med) > {MAD_K} * d.mad
"""


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mad_outliers(load_table(spark, sf_dir, "events"))


EWMA_ALPHA_NUM, EWMA_ALPHA_DEN = 1, 2  # alpha = 1/2: binary-exact smoothing


def ewma_speed(events: DataFrame) -> DataFrame:
    """Per-user exponentially-weighted moving average of ``value`` — the
    order-SENSITIVE sequential aggregate (exponential smoothing /
    control-chart center line) that windowed means can't express:
    ewma_t = α·x_t + (1-α)·ewma_{t-1}, seeded with the first value.

    α = 1/2 makes every multiplication binary-exact, so the fold is
    engine-identical given the same order — pinned by the (ts, event_id)
    sort inside one per-user collect (the ``rolling_fingerprint``
    seed-with-first convention, since DuckDB's list_reduce has no init).
    One user-keyed shuffle; state per user is one double.
    """
    arr = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "value"))
    )
    folded = F.expr(
        "aggregate(slice(vals, 2, size(vals) - 1), element_at(vals, 1),"
        " (acc, x) -> acc / 2.0D + x / 2.0D)"
    )
    per = (
        events.groupBy("user_id")
        .agg(arr.alias("seq"))
        .select(
            "user_id",
            F.expr("transform(seq, s -> s.value)").alias("vals"),
        )
        .select(
            "user_id",
            F.size("vals").alias("n_events"),
            F.element_at("vals", -1).alias("last_value"),
            round0(folded, 6).alias("ewma"),
        )
    )
    return per.withColumn(
        "last_above_trend", F.col("last_value") > F.col("ewma")
    )


EWMA_SPEED_ORACLE = """
    WITH seq AS (
        SELECT user_id, list(value ORDER BY ts, event_id) AS vals
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS INTEGER) AS n_events,
           vals[-1] AS last_value,
           round(list_reduce(vals, (acc, x) -> acc / 2.0 + x / 2.0), 6)
               + CAST(0.0 AS DOUBLE) AS ewma,
           vals[-1] > round(list_reduce(vals, (acc, x) -> acc / 2.0 + x / 2.0), 6)
               AS last_above_trend
    FROM seq
"""


def q_ewma_speed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ewma_speed(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------

RFM_BUCKETS = 5


def rfm_segments(orders: DataFrame) -> DataFrame:
    """Classic recency/frequency/monetary segmentation over the orders
    fact: per customer, days since last order (vs the corpus max date),
    order count, and lifetime spend, each scored into ``RFM_BUCKETS``
    quintiles — the standard CRM slicing a warehouse user expects from
    any analytics engine.

    Exactness: spend is summed in integer CENTS (o_totalprice is a
    double; a float sum's accumulation order differs between engines),
    and every ntile ordering carries o_custkey as the total tie-break.
    Plan: one map-side-combined aggregate on o_custkey (|customers|
    output), a 1-row max-date broadcast, then three ntile windows over
    the aggregate. The global ntile windows are single-task over
    |customers| rows — the documented percentile caveat applies; a
    corpus-scale deployment buckets by histogram thresholds
    (quality_decile_report's pattern) instead.
    """
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(cents).alias("monetary_cents"),
    )
    mx = orders.agg(F.max("o_orderdate").alias("corpus_max"))
    scored = per_cust.crossJoin(F.broadcast(mx)).withColumn(
        "recency_days", F.datediff("corpus_max", "last_order")
    )
    r_w = Window.orderBy(F.asc("recency_days"), F.asc("o_custkey"))
    f_w = Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    m_w = Window.orderBy(F.desc("monetary_cents"), F.asc("o_custkey"))
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        F.round(F.col("monetary_cents") / 100.0, 2).alias("monetary"),
        F.ntile(RFM_BUCKETS).over(r_w).alias("r_score"),
        F.ntile(RFM_BUCKETS).over(f_w).alias("f_score"),
        F.ntile(RFM_BUCKETS).over(m_w).alias("m_score"),
    )


RFM_SEGMENTS_ORACLE = f"""
    WITH per_cust AS (
        SELECT o_custkey,
               max(o_orderdate) AS last_order,
               count(*) AS frequency,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS monetary_cents
        FROM orders GROUP BY o_custkey
    ),
    mx AS (SELECT max(o_orderdate) AS corpus_max FROM orders)
    SELECT o_custkey,
           date_diff('day', last_order, corpus_max) AS recency_days,
           frequency,
           round(monetary_cents / 100.0, 2) AS monetary,
           ntile({RFM_BUCKETS}) OVER (
               ORDER BY date_diff('day', last_order, corpus_max)
                            ASC NULLS FIRST,
                        o_custkey ASC
           ) AS r_score,
           ntile({RFM_BUCKETS}) OVER (
               ORDER BY frequency DESC NULLS LAST, o_custkey ASC) AS f_score,
           ntile({RFM_BUCKETS}) OVER (
               ORDER BY monetary_cents DESC NULLS LAST, o_custkey ASC
           ) AS m_score
    FROM per_cust CROSS JOIN mx
"""


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rfm_segments(load_table(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Co-purchase affinity (association rules)
# ---------------------------------------------------------------------------

AFFINITY_MIN_SUPPORT = 2  # pair must co-occur in at least this many orders
BASKET_CAP = 50  # defensive: a basket beyond this is a data bug, dropped


def copurchase_affinity(lineitem: DataFrame) -> DataFrame:
    """Association-rule mining over order baskets: for every part pair
    co-purchased in >= ``AFFINITY_MIN_SUPPORT`` orders, the support and
    lift in exact integer ppm — the "customers also bought" primitive.

    Baskets are DISTINCT parts per order grouped with the dedup
    family's capped sorted-bucket builder (a basket is naturally tiny —
    TPC-H maxes at 7 lines — the cap only guards corrupted data), pairs
    stream via the two-level explode. Lift is the overflow-safe
    two-step integer division
    (((support * 1e9 div orders_a) * n_orders) div orders_b) div 1e3 —
    the naive support * n_orders * 1e6 numerator overflows int64 at
    billions of orders, while each step here is bounded by
    1e9 * n_orders. The inner quotient carries ppb precision, so the
    two-step truncation error is under 1 ppm of the exact ratio; the
    identical formula runs in the oracle (the rounding is part of the
    metric's definition).
    """
    from .dedup import _capped_sorted_buckets, _explode_pairs_ids
    # materialized once (r17): this distinct basket relation is read four
    # times (order count, part counts, bucket builder's hot-key count +
    # collect) and each read previously re-ran the scan + distinct
    # (guide §2.4 duplicated subtrees — 10 parquet scans in the before
    # plan, 2 after)
    baskets_src = cut_lineage(
        lineitem.select("l_orderkey", "l_partkey").distinct(), eager=False
    )
    n_orders_df = baskets_src.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    part_counts = baskets_src.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("part_orders")
    )
    buckets = _capped_sorted_buckets(
        baskets_src, ["l_orderkey"], "l_partkey", BASKET_CAP
    )
    pairs = (
        _explode_pairs_ids(buckets)
        .groupBy(F.col("doc_a").alias("part_a"), F.col("doc_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("support_orders"))
        .filter(F.col("support_orders") >= AFFINITY_MIN_SUPPORT)
    )
    ca = part_counts.select(
        F.col("l_partkey").alias("part_a"), F.col("part_orders").alias("orders_a")
    )
    cb = part_counts.select(
        F.col("l_partkey").alias("part_b"), F.col("part_orders").alias("orders_b")
    )
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n_orders_df))
        .select(
            "part_a",
            "part_b",
            "support_orders",
            F.expr("support_orders * 1000000 div n_orders").alias("support_ppm"),
            F.expr(
                "(((support_orders * 1000000000 div orders_a) * n_orders)"
                " div orders_b) div 1000"
            ).alias("lift_ppm"),
        )
    )


COPURCHASE_AFFINITY_ORACLE = f"""
    WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_orders_t AS (
        SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets
    ),
    sized AS (
        SELECT *, count(*) OVER (PARTITION BY l_orderkey) AS _n FROM baskets
    ),
    kept AS (SELECT * FROM sized WHERE _n <= {BASKET_CAP}),
    part_counts AS (
        SELECT l_partkey, count(*) AS part_orders FROM baskets GROUP BY 1
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS support_orders
        FROM kept a JOIN kept b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {AFFINITY_MIN_SUPPORT}
    )
    SELECT part_a, part_b, support_orders,
           CAST(support_orders * 1000000 // n_orders AS BIGINT) AS support_ppm,
           CAST((((support_orders * 1000000000 // ca.part_orders) * n_orders)
                // cb.part_orders) // 1000 AS BIGINT) AS lift_ppm
    FROM pairs
    JOIN part_counts ca ON ca.l_partkey = part_a
    JOIN part_counts cb ON cb.l_partkey = part_b
    CROSS JOIN n_orders_t
"""


def q_copurchase_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return copurchase_affinity(load_table(spark, sf_dir, "lineitem"))


# --------------------------------------------------------------------------
# Hourly-series autocorrelation
# --------------------------------------------------------------------------

# ACF horizon: lag-1..6 hours — the short-range structure a capacity
# forecaster (ewma_speed / forecast_revenue_change) needs to pick its
# smoothing window
ACF_MAX_LAG = 6


def autocorrelation_report(events: DataFrame) -> DataFrame:
    """Lag-k autocorrelation (k = 1..{ACF_MAX_LAG}) of the hourly
    event-count series — the seasonality diagnostic behind window-size
    choices for the EWMA/forecast operators.

    The series is the hour-bucketed count aggregate (time-range-bounded:
    one row per clock hour, never corpus-scale), so the corpus crosses
    the wire exactly once. Lag pairs come from a 6-row lag dimension
    broadcast against the series and an equi-join on the shifted
    hour_id — a keyed join, never a range/cross product. Pearson r per
    lag is computed from six integer-exact sums (counts and their
    products, all < 2^53); the only floating-point ops are the final
    per-lag expression, written with the identical association in both
    engines — every input is integer-exact, so +,-,*,/ and IEEE-exact
    sqrt round identically and the emitted double is bit-reproducible.
    A lag with zero variance on either side (or no overlapping hours)
    emits NULL acf rather than a division by zero.
    """
    # r17: the hourly series is lazily lineage-cut — it feeds both the
    # lag-shifted side and the join's right side, so uncut the corpus
    # aggregate re-planned into each (2 events scans before; guide §2.4).
    # The cut relation is one row per hour, bounded by the time span.
    hourly = cut_lineage(
        events.groupBy(F.expr(f"{epoch_s_sql('ts')} div 3600").alias("hour_id"))
        .agg(F.count(F.lit(1)).alias("n")),
        eager=False,
    )
    lags = (
        events.sparkSession.range(1, ACF_MAX_LAG + 1)
        .select(F.col("id").cast("int").alias("lag"))
    )
    shifted = hourly.crossJoin(F.broadcast(lags)).select(
        (F.col("hour_id") + F.col("lag")).alias("hour_id"),
        "lag",
        F.col("n").alias("n_prev"),
    )
    stats = (
        shifted.join(hourly, "hour_id")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("n_prev").alias("sx"),
            F.sum("n").alias("sy"),
            F.sum(F.col("n_prev") * F.col("n_prev")).alias("sxx"),
            F.sum(F.col("n") * F.col("n")).alias("syy"),
            F.sum(F.col("n_prev") * F.col("n")).alias("sxy"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731 — local shorthand
    num = d("n_pairs") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(
        (d("n_pairs") * d("sxx") - d("sx") * d("sx"))
        * (d("n_pairs") * d("syy") - d("sy") * d("sy"))
    )
    return stats.select(
        "lag",
        "n_pairs",
        F.when(den > 0, num / den).alias("acf"),
    )


AUTOCORRELATION_REPORT_ORACLE = f"""
    WITH hourly AS (
        SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour_id,
               count(*) AS n
        FROM events GROUP BY 1
    ),
    lags AS (
        SELECT CAST(r AS INTEGER) AS lag FROM range(1, {ACF_MAX_LAG + 1}) t(r)
    ),
    stats AS (
        SELECT l.lag,
               count(*) AS n_pairs,
               CAST(sum(a.n) AS BIGINT) AS sx,
               CAST(sum(b.n) AS BIGINT) AS sy,
               CAST(sum(a.n * a.n) AS BIGINT) AS sxx,
               CAST(sum(b.n * b.n) AS BIGINT) AS syy,
               CAST(sum(a.n * b.n) AS BIGINT) AS sxy
        FROM hourly a
        CROSS JOIN lags l
        JOIN hourly b ON b.hour_id = a.hour_id + l.lag
        GROUP BY l.lag
    )
    SELECT lag, n_pairs,
           CASE WHEN sqrt(
                    (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                ) > 0
                THEN (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt(
                    (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                )
           END AS acf
    FROM stats
"""


def q_autocorrelation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return autocorrelation_report(load_table(spark, sf_dir, "events"))
