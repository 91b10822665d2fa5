from __future__ import annotations

import datetime as dt

import pytest

import duckdb
from pyspark.sql import Row
from pyspark.sql import functions as F

from real_time_mobility_heatmap_spark.config import EngineConfig
from real_time_mobility_heatmap_spark.operators.tiles import snap_pings, tile_aggregate
from real_time_mobility_heatmap_spark.schema import PING_SCHEMA
from real_time_mobility_heatmap_spark.sources.tables import pings_from_events


def _ping(provider="mbta", vid="v1", ts="2024-01-01T10:02:00", lat=42.35, lon=-71.06, speed=20.0):
    return Row(
        provider=provider,
        vehicleId=vid,
        eventTs=dt.datetime.fromisoformat(ts),
        lat=lat,
        lon=lon,
        speedKmh=speed,
        event_id=1,
        props=None,
    )


def test_validate_drops_bad_rows(spark):
    rows = [
        _ping(),
        _ping(provider=None),
        _ping(vid=None),
        _ping(lat=95.0),
        _ping(lon=-185.0),
        _ping(lat=None),
    ]
    df = spark.createDataFrame(rows, PING_SCHEMA)
    snapped = snap_pings(df)
    assert snapped.count() == 1
    assert snapped.first()["cell_id"] == "847:-1422"  # floor(42.35*20)=847, floor(-71.06*20)=-1422


def test_require_event_time_fails_loudly_on_null_ts(spark):
    """The NULL event-time axis contract, promoted into code (r10
    verdict item #7): an event-time operator fed a NULL timestamp must
    raise at task time — Spark and DuckDB disagree on NULL ordering in
    ascending windows, so letting the row through would hash-diverge
    silently. Conforming data passes through bit-unchanged, and the
    guard must survive Catalyst (a raise inside a filter predicate is
    never pruned)."""
    from pyspark.sql import Row

    from real_time_mobility_heatmap_spark.operators.validate import (
        require_event_time,
    )
    from real_time_mobility_heatmap_spark.operators.trajectory import (
        resample_trajectories,
    )
    from real_time_mobility_heatmap_spark.operators.windows import (
        vehicle_sessions,
        vehicle_trips,
    )

    clean = spark.createDataFrame(
        [_ping(), _ping(ts="2024-01-01T11:00:00")], PING_SCHEMA
    )
    assert require_event_time(clean).collect() == clean.collect()
    assert vehicle_sessions(clean).count() == 2  # >30 min gap -> 2 sessions

    bad_row = Row(
        provider="mbta", vehicleId="v1", eventTs=None, lat=42.35,
        lon=-71.06, speedKmh=20.0, event_id=9, props=None,
    )
    dirty = spark.createDataFrame([_ping(), bad_row], PING_SCHEMA)
    ops = (require_event_time, vehicle_trips, resample_trajectories)
    for op in ops:
        with pytest.raises(Exception, match="event-time contract violated"):
            op(dirty).collect()
    # vehicle_sessions sits DOWNSTREAM of validate_pings (r12), so its
    # NULL-eventTs boundary is the validity filter: the row is DROPPED,
    # matching the oracle's WHERE — not raised (r12 advice: wrapping the
    # guard inside validate_pings made the filter evaluate the raising
    # CASE column, an engine/oracle divergence on NULL ts).
    assert vehicle_sessions(dirty).count() == 1


def test_tile_aggregate_small(spark):
    cfg = EngineConfig()
    rows = [
        _ping(ts="2024-01-01T10:02:00", speed=10.0),
        _ping(ts="2024-01-01T10:04:59", speed=30.0),   # same 10:00 window, same cell
        _ping(ts="2024-01-01T10:05:00", speed=50.0),   # next window
        _ping(ts="2024-01-01T10:03:00", lat=40.0, lon=-70.0, speed=None),  # other cell, null speed
    ]
    out = {r["tile_id"]: r for r in tile_aggregate(spark.createDataFrame(rows, PING_SCHEMA), cfg).collect()}
    k1 = "boston|grid20|847:-1422|2024-01-01T10:00:00Z"
    assert out[k1]["ping_count"] == 2
    assert out[k1]["avg_speed_kmh"] == 20.0
    assert out[k1]["window_end"] == dt.datetime(2024, 1, 1, 10, 5)
    assert out[k1]["stale_at"] == dt.datetime(2024, 1, 1, 10, 50)
    k2 = "boston|grid20|847:-1422|2024-01-01T10:05:00Z"
    assert out[k2]["ping_count"] == 1
    # null speed -> avg over zero non-null values -> null (avg skips nulls)
    k3 = "boston|grid20|800:-1400|2024-01-01T10:00:00Z"
    assert out[k3]["avg_speed_kmh"] is None


def test_window_alignment_matches_duckdb_time_bucket(spark):
    """Spark window() bucket starts == DuckDB time_bucket for 5-min widths."""
    ts = [
        "2024-01-01T00:00:00", "2024-01-01T00:04:59", "2024-01-01T00:05:00",
        "2024-02-29T23:57:31", "2024-07-04T12:34:56",
    ]
    df = spark.createDataFrame([(dt.datetime.fromisoformat(t),) for t in ts], "ts timestamp")
    spark_starts = sorted(
        r[0] for r in df.select(F.window("ts", "5 minutes").start.alias("s")).distinct().collect()
    )
    duck = sorted(
        r[0] for r in duckdb.sql(
            "SELECT DISTINCT time_bucket(INTERVAL '5 minutes', CAST(t AS TIMESTAMP)) "
            "FROM (SELECT UNNEST(?) AS t)", params=[ts]
        ).fetchall()
    )
    assert spark_starts == duck


def test_pings_loader(spark, sf_dir):
    pings = pings_from_events(spark, sf_dir)
    assert pings.columns[:6] == ["provider", "vehicleId", "eventTs", "lat", "lon", "speedKmh"]
    row = pings.orderBy("event_id").first()
    assert 42.0 <= row["lat"] <= 43.0 and -72.0 <= row["lon"] <= -71.0
    assert pings.count() == 1000


def test_hierarchical_rollups_cascade_equals_direct(spark, sf_dir):
    """Rollup-from-rollup must equal rollup-from-raw: int64 partial sums
    are associative, so deriving 1-hour buckets from 10-min buckets loses
    nothing vs aggregating the raw pings directly."""
    from pyspark.sql import functions as F

    from real_time_mobility_heatmap_spark.operators import tiles
    from real_time_mobility_heatmap_spark.sources.tables import pings_from_events

    pings = pings_from_events(spark, sf_dir)
    out = tiles.hierarchical_rollups(pings)
    hourly = out.filter(F.col("grain") == "1hour").select(
        "cell_id", "bucket_epoch", "n_pings", "sum_speed_micro"
    )
    snapped = tiles.snap_pings(pings)
    direct = (
        snapped.select(
            "cell_id",
            F.expr("(unix_timestamp(eventTs) div 3600) * 3600").alias("bucket_epoch"),
            F.round(F.col("speedKmh") * 1e6).cast("long").alias("micro"),
        )
        .groupBy("cell_id", "bucket_epoch")
        .agg(
            F.count(F.lit(1)).alias("n_pings"),
            F.sum("micro").alias("sum_speed_micro"),
        )
    )
    assert sorted(map(tuple, hourly.collect())) == sorted(map(tuple, direct.collect()))
    # grain row counts shrink monotonically up the cascade
    counts = {
        r["grain"]: r["n"]
        for r in out.groupBy("grain").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts["1min"] >= counts["10min"] >= counts["1hour"] >= 1


def _install_fake_h3(monkeypatch, api: str):
    """Register a deterministic fake ``h3`` module exposing only the
    requested API generation. The cell function is defined HERE (not in
    the fake module) so cloudpickle ships it by value to the Python
    workers — the workers never import the fake."""
    import sys
    import types

    def cell(lat, lon, res):
        return f"h3/{res}/{round(lat, 4)}/{round(lon, 4)}"

    mod = types.ModuleType("h3")
    if api == "new":
        mod.latlng_to_cell = cell
    else:
        mod.geo_to_h3 = cell
    monkeypatch.setitem(sys.modules, "h3", mod)
    return cell


@pytest.mark.parametrize("api", ["new", "old"])
def test_h3_udf_plumbing_with_fake_h3(spark, monkeypatch, api):
    """The real ``h3`` wheel is absent from this container (pip installs
    are disallowed), so H3 *index parity* cannot be executed here — that
    blocker is recorded in SCALE.md. What IS testable, and what this
    test pins, is every Spark-side piece of the plug-in (reference
    heatmap_stream.py:65-75 parity): the version-adaptive dispatch
    (latlng_to_cell preferred, geo_to_h3 fallback), the Arrow batch
    signature, null propagation, and the out-of-range coordinate mask —
    via a deterministic fake h3 with exactly one API generation."""
    from real_time_mobility_heatmap_spark.functions.grid import h3_cell_udf

    _install_fake_h3(monkeypatch, api)
    snap = h3_cell_udf(resolution=8)
    df = spark.createDataFrame(
        [
            (1, 42.36, -71.06),     # valid -> fake cell id
            (2, None, -71.06),      # null lat -> null cell
            (3, 42.36, None),       # null lon -> null cell
            (4, 95.0, -71.06),      # lat out of range -> null cell
            (5, 42.36, 181.0),      # lon out of range -> null cell
        ],
        "id long, lat double, lon double",
    )
    got = {r["id"]: r["cell"] for r in df.select("id", snap("lat", "lon").alias("cell")).collect()}
    assert got[1] == "h3/8/42.36/-71.06"
    assert got[2] is None and got[3] is None and got[4] is None and got[5] is None


def test_h3_udf_raises_cleanly_without_h3(spark):
    """Without the h3 package the plug-in must fail at CONSTRUCTION with
    ImportError (callers fall back to the grid snapper), never at
    execution time on the workers. Skipped on environments where the
    real h3 wheel IS installed — there the construction legitimately
    succeeds (and the plumbing test above covers behavior)."""
    import importlib.util

    from real_time_mobility_heatmap_spark.functions.grid import h3_cell_udf

    if importlib.util.find_spec("h3") is not None:
        pytest.skip("real h3 package installed; constructor succeeds by design")
    with pytest.raises(ImportError, match="grid snapper"):
        h3_cell_udf(resolution=8)
