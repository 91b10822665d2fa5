"""Unit semantics for the movement-flow family (operators/flows.py):
OD endpoints and tie-breaks, encounter pairing + the depot cap,
k-ring kernel math, and empty-input totality for all three."""

from __future__ import annotations

import datetime as dt

import pyarrow.parquet as pq
from pyspark.sql import Row

from real_time_mobility_heatmap_spark.operators.flows import (
    ENC_CAP,
    encounter_pairs,
    kring_smooth,
    od_matrix,
)
from real_time_mobility_heatmap_spark.schema import PING_SCHEMA

import __spark_entry__ as entry_mod


def _ping(vid="v1", ts="2024-01-01T10:02:00", lat=42.35, lon=-71.06, eid=1):
    return Row(
        provider="mbta",
        vehicleId=vid,
        eventTs=dt.datetime.fromisoformat(ts),
        lat=lat,
        lon=lon,
        speedKmh=20.0,
        event_id=eid,
        props=None,
    )


# ---- od_matrix -----------------------------------------------------------


def test_od_endpoints_and_hour_grain(spark):
    rows = [
        # v1, hour 10: starts in cell A (42.35 -> 847), ends in cell B (42.40 -> 848)
        _ping(ts="2024-01-01T10:01:00", lat=42.35, eid=1),
        _ping(ts="2024-01-01T10:30:00", lat=42.38, eid=2),  # middle ping, ignored
        _ping(ts="2024-01-01T10:59:00", lat=42.40, eid=3),
        # v1, hour 11: single ping -> origin == dest
        _ping(ts="2024-01-01T11:05:00", lat=42.35, eid=4),
    ]
    out = {
        (r["origin_cell"], r["dest_cell"]): r
        for r in od_matrix(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    }
    assert out[("847:-1422", "848:-1422")]["n_trips"] == 1
    assert out[("847:-1422", "847:-1422")]["n_trips"] == 1  # stationary hour
    assert len(out) == 2


def test_od_tie_break_on_event_id(spark):
    # two pings with IDENTICAL eventTs: event_id must decide first/last
    rows = [
        _ping(ts="2024-01-01T10:00:00", lat=42.35, eid=2),
        _ping(ts="2024-01-01T10:00:00", lat=42.40, eid=1),
    ]
    (r,) = od_matrix(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert r["origin_cell"] == "848:-1422"  # eid=1 is first
    assert r["dest_cell"] == "847:-1422"  # eid=2 is last


# ---- encounter_pairs -----------------------------------------------------


def test_encounters_pair_and_count(spark):
    rows = [
        # v1+v2 share cell/window twice (two windows), v3 is elsewhere
        _ping(vid="v1", ts="2024-01-01T10:01:00", eid=1),
        _ping(vid="v2", ts="2024-01-01T10:03:00", eid=2),
        _ping(vid="v1", ts="2024-01-01T10:06:00", eid=3),
        _ping(vid="v2", ts="2024-01-01T10:08:00", eid=4),
        _ping(vid="v3", ts="2024-01-01T10:01:00", lat=42.90, eid=5),
    ]
    out = encounter_pairs(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert len(out) == 1
    (r,) = out
    assert (r["vehicle_a"], r["vehicle_b"]) == ("v1", "v2")
    assert r["n_encounters"] == 2
    assert r["n_cells"] == 1
    assert r["first_seen"] == dt.datetime.fromisoformat("2024-01-01T10:00:00")


def test_encounters_depot_bucket_dropped(spark):
    # ENC_CAP+1 vehicles parked in one cell/window -> the depot bucket is
    # dropped entirely; two vehicles in a normal bucket still pair
    rows = [
        _ping(vid=f"depot{i:03d}", ts="2024-01-01T10:01:00", eid=i)
        for i in range(ENC_CAP + 1)
    ] + [
        _ping(vid="a", ts="2024-01-01T12:01:00", eid=900),
        _ping(vid="b", ts="2024-01-01T12:02:00", eid=901),
    ]
    out = encounter_pairs(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert [(r["vehicle_a"], r["vehicle_b"]) for r in out] == [("a", "b")]


def test_encounters_dedup_within_window(spark):
    # many pings of the same two vehicles inside ONE window = one encounter
    rows = [
        _ping(vid="v1", ts=f"2024-01-01T10:0{s}:00", eid=s) for s in range(5)
    ] + [
        _ping(vid="v2", ts=f"2024-01-01T10:0{s}:30", eid=10 + s) for s in range(5)
    ]
    (r,) = encounter_pairs(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert r["n_encounters"] == 1


# ---- kring_smooth --------------------------------------------------------


def test_kring_isolated_cell_is_its_own_neighborhood(spark):
    rows = [_ping(eid=i) for i in range(3)]
    (r,) = kring_smooth(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert r["ping_count"] == 3
    assert r["smoothed_count"] == 3
    assert r["share_ppm"] == 1_000_000


def test_kring_adjacent_cells_sum(spark):
    # cells 847 and 848 on the same column are 8-neighbors: each sees both
    rows = [_ping(lat=42.35, eid=1), _ping(lat=42.35, eid=2), _ping(lat=42.40, eid=3)]
    out = {
        r["cell_id"]: r
        for r in kring_smooth(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    }
    assert out["847:-1422"]["smoothed_count"] == 3
    assert out["848:-1422"]["smoothed_count"] == 3
    assert out["847:-1422"]["share_ppm"] == 666_667  # round(2/3 * 1e6)
    assert out["848:-1422"]["share_ppm"] == 333_333


def test_kring_far_cells_unsmoothed(spark):
    rows = [_ping(lat=42.35, eid=1), _ping(lat=42.90, eid=2)]
    out = {
        r["cell_id"]: r
        for r in kring_smooth(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    }
    assert all(r["smoothed_count"] == 1 for r in out.values())


# ---- totality ------------------------------------------------------------


def test_flows_total_on_empty_fixtures(spark, tmp_path):
    src = "/root/testdata/sf0.001/events.parquet"
    pq.write_table(pq.read_table(src).slice(0, 0), str(tmp_path / "events.parquet"))
    qs = entry_mod.queries()
    for name in ("od_matrix", "encounter_pairs", "kring_smooth"):
        df = qs[name](spark, str(tmp_path))
        assert df.collect() == []
        assert df.schema.fieldNames()
