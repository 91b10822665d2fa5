"""Trajectory resampling — pandas-surface operator with an exact oracle.

Per-vehicle linear interpolation of (lat, lon) onto a fixed global time
grid: the trajectory-alignment step of any fleet-analytics or
map-matching pipeline. Per-group sorted interpolation is awkward as SQL
(it needs both an as-of backward AND forward join per grid instant) but
is a few vectorized lines in pandas.

Two implementations, identical results (tested):

- ``resample_trajectories`` (registered): repartition+sort by key, then
  ONE ``mapInPandas`` pass per partition that walks group boundaries in
  numpy. With many small groups this is the scalable form — measured
  ~10x faster than grouped-map at sf0.1, because ``applyInPandas``
  dispatches one Arrow round-trip PER GROUP (7,500 groups = seconds of
  pure dispatch overhead) while this form pays one per partition.
- ``resample_trajectories_grouped``: the idiomatic ``applyInPandas``
  grouped-map spelling, kept for the API surface and as the readable
  reference implementation.

Cross-engine exactness: the DuckDB oracle computes the same result with
backward+forward ASOF joins; the pandas body mirrors the oracle's
arithmetic literally — microsecond integers, ``frac = (g - t0) /
(t1 - t0)`` as one double division, ``v0 + (v1 - v0) * frac`` — so
rounded outputs hash-match (no ``np.interp``, whose internal formula
could differ in the last ulp).

Ties: several pings of one vehicle can share a timestamp; both engines
deterministically keep the min-event_id row per (vehicle, ts) first.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.epochs import epoch_s_sql
from ..functions.guards import MAX_SPINE_STEPS, spine_guard_sql
from ..functions.rounding import (
    avg_2dec_exact_sql,
    fixed_units,
    fixed_units_sql,
    round_half_up,
    round_half_up_sql,
)
from ..lineage import cut_lineage
from ..operators.validate import require_event_time, require_ts_domain
from ..sources.tables import PINGS_ORACLE_SQL, pings_from_events, spread

RESAMPLE_MINUTES = 360  # 6-hour grid: fixture pings are ~13/vehicle/month
_STEP_US = RESAMPLE_MINUTES * 60 * 1_000_000

_OUT_SCHEMA = "provider string, vehicleId string, grid_us long, lat_i double, lon_i double"


def _round_half_away(x: np.ndarray, decimals: int = 6) -> np.ndarray:
    """Vectorized round-HALF-AWAY at ``decimals`` — the convention of
    Spark's F.round and DuckDB's round(), which this mapInPandas path
    must match. np.round is half-EVEN: the r14 ties sweep (seed 1410)
    caught interpolated longitudes landing EXACTLY on the scaled .5
    boundary (hour-snapped ties give exact dyadic fracs over cents-grid
    endpoints, e.g. -71.6828125), where np.round said ...812 and the
    oracle said ...813. Guarantee (scoped, r14 advice): floor(|s|+0.5)
    matches the engines' shared multiply-then-round DOUBLE algorithm at
    coordinate magnitudes — both also compute on s = x*scale, so any
    rounding inside the scaling itself is shared — and the +0.5 step is
    exact wherever 0.5 is a multiple of ulp(|s|) (true for the ~1e8
    scaled coordinates here). It is NOT a universal half-away: for |s|
    just below 0.5 (coordinates near 5e-7) the addition itself rounds
    up and disagrees with true half-away, so don't lift this helper to
    magnitude-unconstrained inputs."""
    scale = 10.0**decimals
    s = x * scale
    return np.copysign(np.floor(np.abs(s) + 0.5), s) / scale


def _interp_one(ts: np.ndarray, lat: np.ndarray, lon: np.ndarray):
    """Grid + interpolated coordinates for ONE vehicle's sorted unique ts."""
    start = -(-int(ts[0]) // _STEP_US) * _STEP_US  # ceil to grid
    end = (int(ts[-1]) // _STEP_US) * _STEP_US     # floor to grid
    if end < start:
        return None
    if (end - start) // _STEP_US > MAX_SPINE_STEPS:
        # same fail-fast posture as the SQL spine guards: one
        # out-of-domain timestamp must not np.arange an unbounded grid
        # in the Python worker (functions/guards.py)
        raise ValueError(
            f"resample_trajectories: time-spine span of "
            f"{(end - start) // _STEP_US} steps exceeds "
            f"MAX_SPINE_STEPS={MAX_SPINE_STEPS}; an out-of-domain event "
            f"timestamp violates the event-time ingestion contract - "
            f"validate or filter the feed"
        )
    grid = np.arange(start, end + 1, _STEP_US, dtype=np.int64)
    nxt = np.searchsorted(ts, grid, side="left")
    prv = np.searchsorted(ts, grid, side="right") - 1
    t0, t1 = ts[prv], ts[nxt]
    span = (t1 - t0).astype(np.float64)
    frac = np.where(t1 > t0, (grid - t0).astype(np.float64) / np.where(span == 0, 1.0, span), 0.0)
    lat_i = _round_half_away(lat[prv] + (lat[nxt] - lat[prv]) * frac)
    lon_i = _round_half_away(lon[prv] + (lon[nxt] - lon[prv]) * frac)
    return grid, lat_i, lon_i


def _dedup_sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort by (key, ts, event_id) and keep the min-event_id row per
    (key, ts) — the deterministic tie rule shared with the oracle."""
    pdf = pdf.sort_values(["provider", "vehicleId", "ts_us", "event_id"], ignore_index=True)
    return pdf.drop_duplicates(["provider", "vehicleId", "ts_us"], keep="first")


def _resample_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    pdfs = [b for b in batches if len(b)]
    if not pdfs:
        return
    pdf = _dedup_sorted(pd.concat(pdfs, ignore_index=True))
    prov = pdf["provider"].to_numpy()
    veh = pdf["vehicleId"].to_numpy()
    ts = pdf["ts_us"].to_numpy(dtype=np.int64)
    lat = pdf["lat"].to_numpy(dtype=np.float64)
    lon = pdf["lon"].to_numpy(dtype=np.float64)
    # group boundaries over the sorted (provider, vehicleId) spine
    change = np.flatnonzero((prov[1:] != prov[:-1]) | (veh[1:] != veh[:-1])) + 1
    bounds = np.concatenate(([0], change, [len(pdf)]))
    out = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        res = _interp_one(ts[lo:hi], lat[lo:hi], lon[lo:hi])
        if res is None:
            continue
        grid, lat_i, lon_i = res
        out.append(
            pd.DataFrame(
                {
                    "provider": prov[lo],
                    "vehicleId": veh[lo],
                    "grid_us": grid,
                    "lat_i": lat_i,
                    "lon_i": lon_i,
                }
            )
        )
    if out:
        yield pd.concat(out, ignore_index=True)


def _ping_projection(pings: DataFrame) -> DataFrame:
    # NULL grouping keys are dropped EXPLICITLY on both sides (r12): the
    # pandas group walk would treat NULL-provider rows as groups (SQL
    # GROUP BY semantics) while the oracle's equi/asof joins on the key
    # silently drop them — the validity conjunction makes NULL keys
    # invalid upstream anyway, so the trajectory contract enforces it.
    return spread(
        require_event_time(pings).filter(
            F.col("provider").isNotNull() & F.col("vehicleId").isNotNull()
        )
    ).select(
        "provider",
        "vehicleId",
        "event_id",
        F.unix_micros("eventTs").alias("ts_us"),
        "lat",
        "lon",
    )


def _finalize(out: DataFrame) -> DataFrame:
    return out.select(
        "provider",
        "vehicleId",
        F.timestamp_micros("grid_us").alias("grid_ts"),
        "lat_i",
        "lon_i",
    )


def resample_trajectories(pings: DataFrame) -> DataFrame:
    """pings -> per-vehicle positions interpolated onto the global grid
    (one mapInPandas pass over key-sorted partitions)."""
    p = _ping_projection(require_ts_domain(pings, "resample_trajectories"))
    pre = p.repartition("provider", "vehicleId").sortWithinPartitions(
        "provider", "vehicleId", "ts_us", "event_id"
    )
    return _finalize(pre.mapInPandas(_resample_partition, _OUT_SCHEMA))


def resample_trajectories_grouped(pings: DataFrame) -> DataFrame:
    """The applyInPandas grouped-map spelling (same results; see module
    docstring for the dispatch-overhead tradeoff)."""

    def one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = _dedup_sorted(pdf)
        res = _interp_one(
            pdf["ts_us"].to_numpy(dtype=np.int64),
            pdf["lat"].to_numpy(dtype=np.float64),
            pdf["lon"].to_numpy(dtype=np.float64),
        )
        if res is None:
            return pd.DataFrame(columns=["provider", "vehicleId", "grid_us", "lat_i", "lon_i"])
        grid, lat_i, lon_i = res
        return pd.DataFrame(
            {
                "provider": pdf["provider"].iloc[0],
                "vehicleId": pdf["vehicleId"].iloc[0],
                "grid_us": grid,
                "lat_i": lat_i,
                "lon_i": lon_i,
            }
        )

    out = _ping_projection(
        require_ts_domain(pings, "resample_trajectories")
    ).groupBy("provider", "vehicleId").applyInPandas(
        one_group, _OUT_SCHEMA
    )
    return _finalize(out)


def resample_trajectories_oracle() -> str:
    step_min = RESAMPLE_MINUTES
    return f"""
        WITH pings AS ({PINGS_ORACLE_SQL}),
        dedup AS (
            SELECT provider, vehicleId, eventTs, lat, lon
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY provider, vehicleId, eventTs ORDER BY event_id
                ) AS rn
                FROM pings
                WHERE provider IS NOT NULL AND vehicleId IS NOT NULL
            ) WHERE rn = 1
        ),
        bounds AS (
            SELECT provider, vehicleId,
                   to_timestamp(ceil(epoch(min(eventTs)) / {step_min * 60}.0)
                       * {step_min * 60})::TIMESTAMP AS g0,
                   to_timestamp(floor(epoch(max(eventTs)) / {step_min * 60}.0)
                       * {step_min * 60})::TIMESTAMP AS g1
            FROM dedup GROUP BY provider, vehicleId
        ),
        grid AS (
            SELECT provider, vehicleId,
                   unnest(generate_series(g0, g1, INTERVAL '{step_min} minutes')) AS grid_ts
            FROM bounds WHERE g0 <= g1
        ),
        prv AS (
            SELECT g.provider, g.vehicleId, g.grid_ts,
                   p.eventTs AS t0, p.lat AS lat0, p.lon AS lon0
            FROM grid g
            ASOF LEFT JOIN dedup p
              ON g.provider = p.provider AND g.vehicleId = p.vehicleId
             AND g.grid_ts >= p.eventTs
        ),
        nxt AS (
            SELECT g.provider, g.vehicleId, g.grid_ts,
                   p.eventTs AS t1, p.lat AS lat1, p.lon AS lon1
            FROM grid g
            ASOF LEFT JOIN dedup p
              ON g.provider = p.provider AND g.vehicleId = p.vehicleId
             AND g.grid_ts <= p.eventTs
        )
        SELECT a.provider, a.vehicleId, a.grid_ts,
               round(lat0 + (lat1 - lat0) * (CASE WHEN t1 > t0
                   THEN CAST(epoch_us(a.grid_ts) - epoch_us(t0) AS DOUBLE)
                        / CAST(epoch_us(t1) - epoch_us(t0) AS DOUBLE)
                   ELSE 0.0 END), 6) AS lat_i,
               round(lon0 + (lon1 - lon0) * (CASE WHEN t1 > t0
                   THEN CAST(epoch_us(a.grid_ts) - epoch_us(t0) AS DOUBLE)
                        / CAST(epoch_us(t1) - epoch_us(t0) AS DOUBLE)
                   ELSE 0.0 END), 6) AS lon_i
        FROM prv a JOIN nxt b
          ON a.provider = b.provider AND a.vehicleId = b.vehicleId
         AND a.grid_ts = b.grid_ts
    """


def q_resample_trajectories(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resample_trajectories(pings_from_events(spark, sf_dir))


TS_BUCKET_S = 2 * 86400   # profile resolution: 2-day buckets (~15 per fixture month)
TS_N_QUERIES = 3          # user_id < 3 are the probe profiles
TS_TOP_K = 3


def similar_speed_profiles(events: DataFrame) -> DataFrame:
    """Time-series similarity search over behavior profiles (the
    UCR-subsequence pattern, whole-series variant): each user's speed
    history resamples onto a fixed time grid, and probe users retrieve
    their nearest neighbors by Euclidean profile distance.

    Shape: the dense (user, bucket) grid comes from one aggregate plus a
    users × buckets cross join (buckets are a constant-sized series —
    the calendar, not the data); distances stay in LONG format — probe
    rows join the grid per bucket, so the comparison is a keyed join
    whose left side is bounded by the probe set, never an all-pairs
    blowup. Bucket means round at 6dp before differencing so distances
    are engine-deterministic.
    """
    from pyspark.sql import Window

    # `per` feeds three readers (span, users, the grid join) and `grid`
    # two (probes, d2) — without lineage cuts each reader re-plans the
    # events scan + bucket aggregate (6 scans of one file in the r11
    # audit; pinned in tests/test_plans.py). Both relations are
    # (user, bucket)-sized — calendar x users, far below the corpus —
    # so one materialization each is the right 100 TB shape.
    events = require_ts_domain(events, "similar_speed_profiles", "ts")
    b = F.expr(f"({epoch_s_sql('ts')} div {TS_BUCKET_S}) * {TS_BUCKET_S}")
    per = cut_lineage(
        events.select("user_id", b.alias("bucket"), "value").groupBy(
            "user_id", "bucket"
        ).agg(F.expr(avg_2dec_exact_sql("value", 6)).alias("v")),
        eager=False,
    )
    span = per.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    users = per.select("user_id").distinct()
    grid = cut_lineage(
        users.crossJoin(F.broadcast(span))
        .select(
            "user_id",
            F.explode(
                F.expr(
                    spine_guard_sql(
                        "lo", "hi", str(TS_BUCKET_S), "similar_speed_profiles"
                    )
                )
            ).alias("bucket"),
        )
        .join(per, ["user_id", "bucket"], "left")
        .select("user_id", "bucket", F.coalesce("v", F.lit(0.0)).alias("v")),
        eager=False,
    )
    probes = grid.filter(F.col("user_id") < TS_N_QUERIES).select(
        F.col("user_id").alias("query_user"),
        "bucket",
        F.col("v").alias("qv"),
    )
    d2 = (
        grid.join(F.broadcast(probes), "bucket")
        .filter(F.col("user_id") != F.col("query_user"))
        .groupBy("query_user", F.col("user_id").alias("cand_user"))
        .agg(
            # v/qv are 6-decimal by construction: difference in exact
            # int64 MICROS, square/sum in exact DECIMAL(38,0) (r13, the
            # zscore_outliers treatment: a long sum of squared micros
            # wraps past 2^63 at ~1e6 buckets x 2e8-micro diffs — a
            # decade of 5-min calendar — while DuckDB's BIGINT sum
            # promotes to HUGEINT; decimal keeps both sides the same
            # exact order-free integer), then sqrt/scale the identical
            # value in both engines and shared half-up
            round_half_up(
                F.sqrt(
                    F.sum(
                        (
                            fixed_units(F.col("qv"), 1e6)
                            - fixed_units(F.col("v"), 1e6)
                        ).cast("decimal(19,0)")
                        * (
                            fixed_units(F.col("qv"), 1e6)
                            - fixed_units(F.col("v"), 1e6)
                        ).cast("decimal(19,0)")
                    ).cast("double")
                )
                / F.lit(1e6),
                6,
            ).alias("dist")
        )
    )
    w = Window.partitionBy("query_user").orderBy(F.asc("dist"), F.asc("cand_user"))
    return (
        d2.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TS_TOP_K)
        .select("query_user", "cand_user", "dist", "rank")
    )


SIMILAR_SPEED_PROFILES_ORACLE = f"""
    WITH per AS (
        SELECT user_id,
               (CAST(floor(epoch(ts)) AS BIGINT) // {TS_BUCKET_S}) * {TS_BUCKET_S}
                   AS bucket,
               {avg_2dec_exact_sql('value', 6)} AS v
        FROM events GROUP BY 1, 2
    ),
    span AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM per),
    grid AS (
        SELECT u.user_id, s.bucket, coalesce(p.v, 0.0) AS v
        FROM (SELECT DISTINCT user_id FROM per) u
        CROSS JOIN (SELECT unnest(generate_series(lo, hi, {TS_BUCKET_S}))
                        AS bucket FROM span) s
        LEFT JOIN per p ON p.user_id = u.user_id AND p.bucket = s.bucket
    ),
    probes AS (
        SELECT user_id AS query_user, bucket, v AS qv FROM grid
        WHERE user_id < {TS_N_QUERIES}
    ),
    d2 AS (
        SELECT p.query_user, g.user_id AS cand_user,
               {round_half_up_sql(
                   "sqrt(CAST(sum("
                   f"CAST(({fixed_units_sql('p.qv', '1e6')}"
                   f" - {fixed_units_sql('g.v', '1e6')}) AS HUGEINT)"
                   f" * CAST(({fixed_units_sql('p.qv', '1e6')}"
                   f" - {fixed_units_sql('g.v', '1e6')}) AS HUGEINT)"
                   ") AS DOUBLE)) / 1e6", 6)} AS dist
        FROM grid g JOIN probes p ON p.bucket = g.bucket
        WHERE g.user_id != p.query_user
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_user
                      ORDER BY dist ASC, cand_user ASC) AS rank
        FROM d2
    )
    SELECT query_user, cand_user, dist, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {TS_TOP_K}
"""


def q_similar_speed_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    return similar_speed_profiles(load_table(spark, sf_dir, "events"))
