"""Trajectory resampling — grouped-map ``applyInPandas`` surface.

Per-vehicle linear interpolation of (lat, lon) onto a fixed global time
grid: the trajectory-alignment step of any fleet-analytics or
map-matching pipeline. This is the one operator family where grouped
pandas is genuinely the idiomatic Spark form — per-group sorted
interpolation is awkward as SQL (it needs both an as-of backward AND
forward join per grid instant) but is a few vectorized lines per group.

Cross-engine exactness: the DuckDB oracle computes the same result with
two ASOF joins; the pandas body mirrors the oracle's arithmetic
literally — microsecond integers, ``frac = (g - t0) / (t1 - t0)`` as one
double division, ``v0 + (v1 - v0) * frac`` — so rounded outputs
hash-match (no ``np.interp``, whose internal formula could differ in the
last ulp).

Ties: several pings of one vehicle can share a timestamp; both engines
deterministically keep the min-event_id row per (vehicle, ts) first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import PINGS_ORACLE_SQL, pings_from_events, spread

RESAMPLE_MINUTES = 360  # 6-hour grid: fixture pings are ~13/vehicle/month
_STEP_US = RESAMPLE_MINUTES * 60 * 1_000_000

RESAMPLED_SCHEMA = T.StructType(
    [
        T.StructField("provider", T.StringType()),
        T.StructField("vehicleId", T.StringType()),
        T.StructField("grid_ts", T.TimestampType()),
        T.StructField("lat_i", T.DoubleType()),
        T.StructField("lon_i", T.DoubleType()),
    ]
)


def _resample_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("event_id").sort_values("ts_us", kind="stable")
    # min event_id per duplicate ts (stable sort keeps event_id order)
    pdf = pdf.drop_duplicates("ts_us", keep="first")
    ts = pdf["ts_us"].to_numpy(dtype=np.int64)
    if len(ts) == 0:
        return pd.DataFrame(columns=["provider", "vehicleId", "grid_ts", "lat_i", "lon_i"])
    lat = pdf["lat"].to_numpy(dtype=np.float64)
    lon = pdf["lon"].to_numpy(dtype=np.float64)
    start = -(-int(ts[0]) // _STEP_US) * _STEP_US        # ceil to grid
    end = (int(ts[-1]) // _STEP_US) * _STEP_US           # floor to grid
    if end < start:
        return pd.DataFrame(columns=["provider", "vehicleId", "grid_ts", "lat_i", "lon_i"])
    grid = np.arange(start, end + 1, _STEP_US, dtype=np.int64)
    # prev index: rightmost ts <= g; next index: leftmost ts >= g
    nxt = np.searchsorted(ts, grid, side="left")
    prv = np.searchsorted(ts, grid, side="right") - 1
    t0, t1 = ts[prv], ts[nxt]
    span = (t1 - t0).astype(np.float64)
    frac = np.where(t1 > t0, (grid - t0).astype(np.float64) / np.where(span == 0, 1.0, span), 0.0)
    lat_i = np.round(lat[prv] + (lat[nxt] - lat[prv]) * frac, 6)
    lon_i = np.round(lon[prv] + (lon[nxt] - lon[prv]) * frac, 6)
    return pd.DataFrame(
        {
            "provider": pdf["provider"].iloc[0],
            "vehicleId": pdf["vehicleId"].iloc[0],
            "grid_ts": pd.to_datetime(grid, unit="us"),
            "lat_i": lat_i,
            "lon_i": lon_i,
        }
    )


def resample_trajectories(pings: DataFrame) -> DataFrame:
    """pings -> per-vehicle positions interpolated onto the global grid."""
    p = spread(pings).select(
        "provider",
        "vehicleId",
        "event_id",
        F.unix_micros("eventTs").alias("ts_us"),
        "lat",
        "lon",
    )
    return p.groupBy("provider", "vehicleId").applyInPandas(
        lambda pdf: _resample_group(pdf), RESAMPLED_SCHEMA
    )


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
