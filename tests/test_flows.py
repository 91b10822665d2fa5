"""Unit semantics for the movement-flow family (operators/flows.py):
OD endpoints and tie-breaks, encounter pairing + the depot cap,
k-ring kernel math, and empty-input totality for all three."""

from __future__ import annotations

import datetime as dt

import pyarrow.parquet as pq
from pyspark.sql import Row

from real_time_mobility_heatmap_spark.operators.flows import (
    ENC_CAP,
    GAP_OUTAGE_S,
    cell_speed_percentiles,
    co_dwell_pairs,
    encounter_pairs,
    kring_smooth,
    od_matrix,
    ping_gap_report,
    stay_points,
    tile_anomaly_report,
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


# ---- stay_points ---------------------------------------------------------


def test_stay_points_detects_dwell_and_filters_short(spark):
    rows = [
        # 15-minute stay in one cell (3 pings) -> one stay row
        _ping(ts="2024-01-01T10:00:00", eid=1),
        _ping(ts="2024-01-01T10:07:00", eid=2),
        _ping(ts="2024-01-01T10:15:00", eid=3),
        # move away: 5-minute stay elsewhere -> below STAY_MIN_S, dropped
        _ping(ts="2024-01-01T11:00:00", lat=42.40, eid=4),
        _ping(ts="2024-01-01T11:05:00", lat=42.40, eid=5),
        # single-ping run -> dropped (n_pings < 2)
        _ping(ts="2024-01-01T12:00:00", lat=42.90, eid=6),
    ]
    out = stay_points(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert len(out) == 1
    (r,) = out
    assert r["cell_id"] == "847:-1422"
    assert r["n_pings"] == 3
    assert r["dwell_sec"] == 900


def test_stay_points_return_visit_is_a_new_run(spark):
    # leave and come back: two runs in the SAME cell, counted separately
    rows = [
        _ping(ts="2024-01-01T10:00:00", eid=1),
        _ping(ts="2024-01-01T10:20:00", eid=2),
        _ping(ts="2024-01-01T11:00:00", lat=42.40, eid=3),  # away
        _ping(ts="2024-01-01T12:00:00", eid=4),
        _ping(ts="2024-01-01T12:30:00", eid=5),
    ]
    out = stay_points(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert len(out) == 2
    assert {r["dwell_sec"] for r in out} == {1200, 1800}


# ---- ping_gap_report -----------------------------------------------------


def test_ping_gap_report_exact_integer_stats(spark):
    # gaps: 600s, 7h (outage), 600s -> 3 gaps, 1 outage -> 333333 ppm
    rows = [
        _ping(ts="2024-01-01T10:00:00", eid=1),
        _ping(ts="2024-01-01T10:10:00", eid=2),
        _ping(ts="2024-01-01T17:10:00", eid=3),
        _ping(ts="2024-01-01T17:20:00", eid=4),
    ]
    (r,) = ping_gap_report(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert r["n_gaps"] == 3
    assert r["max_gap_sec"] == 7 * 3600
    assert r["outage_ppm"] == 333_333  # truncating div, not round
    assert r["max_gap_sec"] > GAP_OUTAGE_S


def test_ping_gap_single_ping_vehicle_emits_nothing(spark):
    rows = [_ping(vid="only", eid=1)]
    assert ping_gap_report(spark.createDataFrame(rows, PING_SCHEMA)).collect() == []


# ---- cell_speed_percentiles ------------------------------------------------


def test_cell_speed_percentiles_pick_existing_values(spark):
    # speeds 10,20,30,40 in one cell: p50 = 2nd value, p75 = 3rd
    rows = [
        _ping(ts=f"2024-01-01T10:0{i}:00", eid=i) for i in range(4)
    ]
    import pyspark.sql.functions as F

    df = spark.createDataFrame(rows, PING_SCHEMA).withColumn(
        "speedKmh", (F.col("event_id") * 10.0).cast("double")
    )
    (r,) = cell_speed_percentiles(df).collect()
    assert r["p50_speed"] == 10.0  # eids 0..3 -> speeds 0,10,20,30; ceil(.5*4)=2nd
    assert r["p75_speed"] == 20.0  # ceil(.75*4)=3rd value


# ---- co_dwell_pairs --------------------------------------------------------


def _stay(vid, t0, t1, eid0, lat=42.35):
    """Two pings framing a stay interval [t0, t1] in one cell."""
    return [
        _ping(vid=vid, ts=t0, lat=lat, eid=eid0),
        _ping(vid=vid, ts=t1, lat=lat, eid=eid0 + 1),
    ]


def test_co_dwell_overlap_math(spark):
    rows = (
        # v1 stays 10:00-11:00, v2 stays 10:30-11:30 -> overlap 30 min
        _stay("v1", "2024-01-01T10:00:00", "2024-01-01T11:00:00", 1)
        + _stay("v2", "2024-01-01T10:30:00", "2024-01-01T11:30:00", 10)
        # v3 stays in the same cell but 13:00-14:00 -> no overlap
        + _stay("v3", "2024-01-01T13:00:00", "2024-01-01T14:00:00", 20)
    )
    out = co_dwell_pairs(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert len(out) == 1
    (r,) = out
    assert (r["vehicle_a"], r["vehicle_b"]) == ("v1", "v2")
    assert r["total_overlap_sec"] == 1800
    assert r["n_codwells"] == 1


def test_co_dwell_bucket_straddle_not_double_counted(spark):
    # overlap straddles a 6h bucket boundary (18:00): the pair appears in
    # two (cell, bucket) slices but must emit ONE codwell
    rows = _stay("v1", "2024-01-01T17:00:00", "2024-01-01T19:00:00", 1) + _stay(
        "v2", "2024-01-01T17:30:00", "2024-01-01T19:30:00", 10
    )
    (r,) = co_dwell_pairs(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert r["n_codwells"] == 1
    assert r["total_overlap_sec"] == 5400  # 17:30-19:00


def test_co_dwell_short_overlap_dropped(spark):
    # 2-minute overlap < CODWELL_MIN_S
    rows = _stay("v1", "2024-01-01T10:00:00", "2024-01-01T10:32:00", 1) + _stay(
        "v2", "2024-01-01T10:30:00", "2024-01-01T11:10:00", 10
    )
    assert co_dwell_pairs(spark.createDataFrame(rows, PING_SCHEMA)).collect() == []


# ---- tile_anomaly_report ---------------------------------------------------


def test_tile_anomaly_spike_flag_exact(spark):
    # 4 buckets of 1 ping, then a bucket of 9 -> 9 * 4 >= 3 * 4 -> spike;
    # buckets are 10 min apart so each lands in its own ANOM bucket
    rows = [
        _ping(ts=f"2024-01-01T1{h}:0{m}:00", eid=h * 10 + m)
        for h, m in [(0, 0), (1, 0), (2, 0), (3, 0)]
    ] + [_ping(ts="2024-01-01T14:00:00", eid=100 + i) for i in range(9)]
    out = {r["bucket_epoch"]: r for r in tile_anomaly_report(
        spark.createDataFrame(rows, PING_SCHEMA)
    ).collect()}
    spike_rows = [r for r in out.values() if r["is_spike"]]
    assert len(spike_rows) == 1
    (r,) = spike_rows
    assert r["ping_count"] == 9
    assert r["trail_n"] == 4 and r["trail_sum"] == 4


def test_tile_anomaly_needs_history(spark):
    # a single bucket has no trailing history -> filtered out entirely
    rows = [_ping(ts="2024-01-01T10:00:00", eid=1)]
    assert tile_anomaly_report(spark.createDataFrame(rows, PING_SCHEMA)).collect() == []


# ---- totality ------------------------------------------------------------


def test_flows_total_on_empty_fixtures(spark, tmp_path):
    src = "/root/testdata/sf0.001/events.parquet"
    pq.write_table(pq.read_table(src).slice(0, 0), str(tmp_path / "events.parquet"))
    qs = entry_mod.queries()
    for name in (
        "od_matrix",
        "encounter_pairs",
        "kring_smooth",
        "stay_points",
        "ping_gap_report",
        "cell_speed_percentiles",
        "co_dwell_pairs",
        "tile_anomaly_report",
    ):
        df = qs[name](spark, str(tmp_path))
        assert df.collect() == []
        assert df.schema.fieldNames()


# ---- convoy_clusters -------------------------------------------------------


def test_convoy_transitive_closure(spark):
    from real_time_mobility_heatmap_spark.operators.flows import convoy_clusters

    # v1-v2 pair twice; v2-v3 pair twice (different windows); v4 only once
    # with v1 -> convoy {v1,v2,v3}; v4 excluded (below CONVOY_MIN_ENC)
    def enc(v, w_h, w_m, eid):
        return _ping(vid=v, ts=f"2024-01-01T{w_h:02d}:{w_m:02d}:00", eid=eid)

    rows = [
        enc("v1", 10, 1, 1), enc("v2", 10, 2, 2),
        enc("v1", 11, 1, 3), enc("v2", 11, 2, 4),
        enc("v2", 12, 1, 5), enc("v3", 12, 2, 6),
        enc("v2", 13, 1, 7), enc("v3", 13, 2, 8),
        enc("v1", 14, 1, 9), enc("v4", 14, 2, 10),
    ]
    out = convoy_clusters(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert {r["vehicleId"] for r in out} == {"v1", "v2", "v3"}
    assert {r["convoy_id"] for r in out} == {"v1"}
    assert all(r["convoy_size"] == 3 for r in out)


# ---- tile_gap_fill ---------------------------------------------------------


def test_tile_gap_fill_zero_fills_missing_hours(spark):
    from real_time_mobility_heatmap_spark.operators.flows import tile_gap_fill

    # pings at 10:00 and 13:00 -> hours 11 and 12 must appear zero-filled
    rows = [_ping(ts="2024-01-01T10:05:00", eid=1), _ping(ts="2024-01-01T13:05:00", eid=2)]
    out = sorted(
        tile_gap_fill(spark.createDataFrame(rows, PING_SCHEMA)).collect(),
        key=lambda r: r["hour_epoch"],
    )
    assert len(out) == 4
    assert [r["ping_count"] for r in out] == [1, 0, 0, 1]
    assert [r["observed"] for r in out] == [True, False, False, True]


def test_co_dwell_depot_slice_dropped(spark):
    from real_time_mobility_heatmap_spark.operators.flows import CODWELL_CAP

    # CODWELL_CAP+1 vehicles all staying together in one (cell, 6h) slice
    # -> the slice is a depot, dropped entirely; a normal pair elsewhere
    # (different cell) survives
    rows = []
    for i in range(CODWELL_CAP + 1):
        rows += _stay(f"d{i:03d}", "2024-01-01T01:00:00", "2024-01-01T02:00:00", 10 * i)
    rows += _stay("x1", "2024-01-02T01:00:00", "2024-01-02T02:00:00", 2000, lat=42.90)
    rows += _stay("x2", "2024-01-02T01:00:00", "2024-01-02T02:00:00", 2010, lat=42.90)
    out = co_dwell_pairs(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert [(r["vehicle_a"], r["vehicle_b"]) for r in out] == [("x1", "x2")]


def test_tile_speed_locf_carries_last_observation(spark):
    from real_time_mobility_heatmap_spark.operators.flows import tile_speed_locf

    # speeds 20 at 10:00 and 40 at 13:00; 11:00/12:00 unobserved -> carry 20
    rows = [_ping(ts="2024-01-01T10:05:00", eid=1), _ping(ts="2024-01-01T13:05:00", eid=2)]
    import pyspark.sql.functions as F

    df = spark.createDataFrame(rows, PING_SCHEMA).withColumn(
        "speedKmh", F.when(F.col("event_id") == 1, 20.0).otherwise(40.0)
    )
    out = sorted(tile_speed_locf(df).collect(), key=lambda r: r["hour_epoch"])
    assert [r["filled_speed"] for r in out] == [20.0, 20.0, 20.0, 40.0]
    assert [r["avg_speed"] for r in out] == [20.0, None, None, 40.0]
    assert [r["observed"] for r in out] == [True, False, False, True]


def test_trip_distance_exact_millimeter_steps(spark):
    from real_time_mobility_heatmap_spark.operators.flows import (
        M_PER_DEG_LAT,
        trip_distance_report,
    )

    # one vehicle, one hour: 0.01 deg north then 0.01 deg north again
    rows = [
        _ping(ts="2024-01-01T10:00:00", lat=42.35, eid=1),
        _ping(ts="2024-01-01T10:10:00", lat=42.36, eid=2),
        _ping(ts="2024-01-01T10:20:00", lat=42.37, eid=3),
    ]
    (r,) = trip_distance_report(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    step_m = round(0.01 * M_PER_DEG_LAT, 3)
    assert r["n_steps"] == 2
    assert abs(r["dist_m"] - 2 * step_m) < 0.005  # two mm-exact steps
    assert abs(r["max_step_m"] - step_m) < 0.005


def test_trip_distance_stationary_vehicle_zero(spark):
    from real_time_mobility_heatmap_spark.operators.flows import trip_distance_report

    rows = [_ping(ts=f"2024-01-01T10:0{i}:00", eid=i) for i in range(3)]
    (r,) = trip_distance_report(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert r["dist_m"] == 0.0 and r["n_steps"] == 2


def test_degenerate_all_colocated_fleet_is_capped_not_quadratic(spark):
    """The flow-family analog of the dedup family's all-identical-corpus
    sweep: an entire fleet parked in ONE (cell, window) is a depot by
    definition — the co-location ops must emit NOTHING (cap drop), while
    the per-vehicle ops stay well-defined."""
    from real_time_mobility_heatmap_spark.operators.flows import (
        ENC_CAP,
        co_dwell_pairs,
        kring_smooth,
        od_matrix,
        stay_points,
    )

    n = ENC_CAP + 10
    rows = [
        _ping(vid=f"v{i:03d}", ts="2024-01-01T10:01:00", eid=2 * i) for i in range(n)
    ] + [
        _ping(vid=f"v{i:03d}", ts="2024-01-01T10:31:00", eid=2 * i + 1)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, PING_SCHEMA)
    assert encounter_pairs(df).collect() == []  # both windows over cap
    assert co_dwell_pairs(df).collect() == []  # the one stay slice over cap
    assert stay_points(df).count() == n  # one 30-min stay per vehicle
    assert od_matrix(df).count() == 1  # everyone: same origin == dest
    (k,) = kring_smooth(df).collect()
    assert k["ping_count"] == 2 * n and k["share_ppm"] == 1_000_000


# ---- cell_reachability ---------------------------------------------------


def test_reachability_bfs_min_hops_and_horizon(spark):
    """Chain c0->..->c6 plus a shortcut c0->c2: BFS keeps MIN hops and
    the default 4-hop horizon excludes the 5-hop tail."""
    from real_time_mobility_heatmap_spark.operators.flows import cell_reachability

    # cell row 846 + i at scale 20; +0.01 keeps the value 0.2 cell away
    # from the floor boundary so float rounding can't flip the cell
    lat = lambda i: 42.31 + 0.05 * i
    rows = []
    # v1 walks the chain c0..c6 (edges c_i -> c_{i+1})
    for i in range(7):
        rows.append(_ping(vid="v1", ts=f"2024-01-01T10:0{i}:00", lat=lat(i), eid=i + 1))
    # v2 jumps c0 -> c2: the shortcut that makes c2 hop-1, not hop-2
    rows.append(_ping(vid="v2", ts="2024-01-01T10:00:00", lat=lat(0), eid=100))
    rows.append(_ping(vid="v2", ts="2024-01-01T10:01:00", lat=lat(2), eid=101))
    # extra stationary pings make c0 the busiest cell (the seed)
    for j in range(5):
        rows.append(_ping(vid="v3", ts=f"2024-01-01T11:0{j}:00", lat=lat(0), eid=200 + j))
    out = {
        r["cell_id"]: r["hops"]
        for r in cell_reachability(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    }
    cell = lambda i: f"{846 + i}:-1422"
    assert out[cell(0)] == 0
    assert out[cell(1)] == 1
    assert out[cell(2)] == 1  # shortcut wins over the 2-hop chain
    assert out[cell(3)] == 2
    assert out[cell(4)] == 3
    assert out[cell(5)] == 4
    assert cell(6) not in out  # 5 hops > horizon
    assert len(out) == 6


def test_reachability_empty_and_isolated_seed(spark):
    """No transitions at all: the seed cell alone comes back at hop 0;
    a zero-row input yields a typed empty relation."""
    from real_time_mobility_heatmap_spark.operators.flows import cell_reachability

    rows = [_ping(ts="2024-01-01T10:00:00", eid=1), _ping(ts="2024-01-01T10:05:00", eid=2)]
    out = cell_reachability(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert [(r["cell_id"], r["hops"]) for r in out] == [("847:-1422", 0)]

    empty = cell_reachability(spark.createDataFrame([], PING_SCHEMA))
    assert empty.columns == ["cell_id", "hops"]
    assert empty.count() == 0


# ---- home_work_locations -------------------------------------------------


def test_home_work_modal_cells_and_tie_break(spark):
    from real_time_mobility_heatmap_spark.operators.flows import home_work_locations

    rows = [
        # v1 nights: 2 pings in 847, 1 in 846 -> home = 847
        _ping(vid="v1", ts="2024-01-01T23:00:00", lat=42.35, eid=1),
        _ping(vid="v1", ts="2024-01-02T02:00:00", lat=42.35, eid=2),
        _ping(vid="v1", ts="2024-01-02T05:00:00", lat=42.30, eid=3),
        # v1 days: 846 and 848 tie at one ping each -> min cell_id wins
        _ping(vid="v1", ts="2024-01-01T10:00:00", lat=42.30, eid=4),
        _ping(vid="v1", ts="2024-01-01T15:00:00", lat=42.40, eid=5),
        # 08:30 is neither bucket: must not count anywhere
        _ping(vid="v1", ts="2024-01-01T08:30:00", lat=42.45, eid=6),
        # v2 has only night pings -> excluded (no work cell)
        _ping(vid="v2", ts="2024-01-01T23:30:00", lat=42.35, eid=7),
    ]
    out = home_work_locations(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["vehicleId"] == "v1"
    assert (r["home_cell"], r["home_pings"]) == ("847:-1422", 2)
    assert (r["work_cell"], r["work_pings"]) == ("846:-1422", 1)


# ---- cell_speed_trend ----------------------------------------------------


def test_grouped_ols_core(spark):
    """The factored six-sum OLS core (functions/ols.py): an exact line
    recovers its slope with r2 = 1.0; a zero-x-variance group emits
    NULL slope/r2; extra aggregates ride the same pass."""
    import pyspark.sql.functions as SF

    from real_time_mobility_heatmap_spark.functions.ols import grouped_ols

    rows = [("a", x, 3 * x + 1, 10) for x in range(5)] + [("b", 2, 7, 10)] * 3
    rel = spark.createDataFrame(rows, "k string, x long, y long, n long")
    out = {
        r["k"]: r
        for r in grouped_ols(
            rel, ["k"], extra_aggs=[SF.sum("n").alias("n_total")]
        ).collect()
    }
    assert out["a"]["slope"] == 3.0 and out["a"]["r2"] == 1.0
    assert out["a"]["n_points"] == 5 and out["a"]["n_total"] == 50
    assert out["b"]["slope"] is None and out["b"]["r2"] is None


def _sping(ts, speed, vid="v1", lat=42.35, eid=1):
    return Row(
        provider="mbta",
        vehicleId=vid,
        eventTs=dt.datetime.fromisoformat(ts),
        lat=lat,
        lon=-71.06,
        speedKmh=speed,
        event_id=eid,
        props=None,
    )


def test_cell_speed_trend_exact_line_and_hourly_mean(spark):
    """Hourly means on an exact line: slope comes out bit-exact (all six
    OLS sums are small integers), r2 == 1.0; the within-hour mean is the
    regression input (two pings averaging 15 -> the line 15,25,35)."""
    from real_time_mobility_heatmap_spark.operators.flows import cell_speed_trend

    rows = [
        # hour 0: pings at 10 and 20 km/h -> hourly mean 15
        _sping("2024-01-01T10:05:00", 10.0, eid=1),
        _sping("2024-01-01T10:40:00", 20.0, eid=2),
        # hour 1: 25; hour 2: 35 -> y = 15000, 25000, 35000 milli
        _sping("2024-01-01T11:05:00", 25.0, eid=3),
        _sping("2024-01-01T12:05:00", 35.0, eid=4),
        # a second cell with a single hour -> NULL slope/r2
        _sping("2024-01-01T10:05:00", 50.0, lat=42.45, eid=5),
    ]
    out = {
        r["cell_id"]: r
        for r in cell_speed_trend(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    }
    line = out["847:-1422"]
    assert line["n_hours"] == 3 and line["n_pings"] == 4
    assert line["slope_milli_kmh_per_hour"] == 10000.0  # +10 km/h per hour
    assert line["r2"] == 1.0
    single = out["849:-1422"]
    assert single["slope_milli_kmh_per_hour"] is None and single["r2"] is None


# ---- route_trigrams ------------------------------------------------------


def test_route_trigrams_compression_and_counts(spark):
    """Dwell pings collapse before mining: A,A,B,C,B,A yields exactly the
    trigrams (A,B,C),(B,C,B),(C,B,A); a second vehicle on the same first
    corridor bumps n_trips and n_vehicles."""
    from real_time_mobility_heatmap_spark.operators.flows import route_trigrams

    A, B, C = 42.35, 42.40, 42.51  # cells 847, 848, 850
    rows = [
        _ping(ts="2024-01-01T10:00:00", lat=A, eid=1),
        _ping(ts="2024-01-01T10:01:00", lat=A, eid=2),  # dwell, compressed out
        _ping(ts="2024-01-01T10:02:00", lat=B, eid=3),
        _ping(ts="2024-01-01T10:03:00", lat=C, eid=4),
        _ping(ts="2024-01-01T10:04:00", lat=B, eid=5),
        _ping(ts="2024-01-01T10:05:00", lat=A, eid=6),
        # v2 rides the A->B->C corridor once
        _ping(vid="v2", ts="2024-01-01T11:00:00", lat=A, eid=7),
        _ping(vid="v2", ts="2024-01-01T11:01:00", lat=B, eid=8),
        _ping(vid="v2", ts="2024-01-01T11:02:00", lat=C, eid=9),
    ]
    out = {
        (r["cell_a"], r["cell_b"], r["cell_c"]): r
        for r in route_trigrams(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    }
    a, b, c = "847:-1422", "848:-1422", "850:-1422"
    assert out[(a, b, c)]["n_trips"] == 2 and out[(a, b, c)]["n_vehicles"] == 2
    assert out[(b, c, b)]["n_trips"] == 1
    assert out[(c, b, a)]["n_trips"] == 1
    assert len(out) == 3


def test_route_trigrams_single_corpus_exchange(spark):
    """The compression filter and both lag windows must share ONE corpus
    exchange (vehicleId partitioning is preserved through the filter);
    the only other exchange keys the trigram aggregate, and the top-N
    plans as TakeOrderedAndProject, never a global sort."""
    import contextlib
    import io

    import __spark_entry__ as em

    df = em.queries()["route_trigrams"](spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    tree = buf.getvalue().split("\n(1)")[0]
    assert tree.count(" Exchange (") == 2
    assert "TakeOrderedAndProject" in tree


# ---- gps_jump_report -----------------------------------------------------


def test_gps_jump_flags_teleports_and_zero_gap(spark):
    """A ~3.6 km/h crawl leg is clean; a 5 km step in 10 s (~1800 km/h)
    and a displaced zero-gap pair are both jumps; ppm uses truncating
    division and the worst implied speed is integer milli-km/h."""
    from real_time_mobility_heatmap_spark.operators.flows import gps_jump_report

    rows = [
        # leg 1: 10 m north in 10 s -> 3.6 km/h, clean
        _ping(ts="2024-01-01T10:00:00", lat=42.35, eid=1),
        _ping(ts="2024-01-01T10:00:10", lat=42.35 + 10 / 111320.0, eid=2),
        # leg 2: ~5 km in 10 s -> ~1800 km/h, jump
        _ping(ts="2024-01-01T10:00:20", lat=42.35 + 5010 / 111320.0, eid=3),
        # leg 3: zero gap, 1 km displacement -> jump
        _ping(ts="2024-01-01T10:00:20", lat=42.35 + 6010 / 111320.0, eid=4),
    ]
    (r,) = gps_jump_report(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert r["n_legs"] == 3
    assert r["n_jumps"] == 2
    assert r["jump_ppm"] == 2 * 1_000_000 // 3
    # worst finite implied speed is leg 2: 5000 m / 10 s = 1800 km/h
    assert abs(r["max_implied_milli_kmh"] - 1_800_000) < 2_000


def test_home_work_two_exchanges_no_join(spark):
    """The modal-pick pipeline must plan with NO join (the winner fold
    is a conditional aggregate) and exactly two exchanges: corpus ->
    (vehicleId, cell) counts, then counts -> vehicleId for the shared
    window + final aggregate."""
    import contextlib
    import io

    import __spark_entry__ as em

    df = em.queries()["home_work_locations"](spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    tree = buf.getvalue().split("\n(1)")[0]
    assert "Join" not in tree
    assert tree.count(" Exchange (") == 2


# ---- time-spine guards (r15 --xts axis) ----------------------------------


def test_spine_guard_fails_fast_on_out_of_domain_span(spark):
    """One out-of-domain timestamp (year 9924) must make the spine
    densifiers FAIL FAST with the named diagnostic — not np.arange /
    sequence() an ~10^7-step grid per entity (the OOM shape the --xts
    sweep hit on first contact; functions/guards.py)."""
    import pytest

    from real_time_mobility_heatmap_spark.operators.flows import (
        co_dwell_pairs,
        tile_gap_fill,
    )
    from real_time_mobility_heatmap_spark.operators.trajectory import (
        resample_trajectories,
    )

    rows = [
        _ping(ts="2024-01-01T10:00:00", eid=1),
        _ping(ts="2024-01-01T10:20:00", eid=2),
        _ping(ts="9924-01-01T10:00:00", eid=3),  # poisoned feed value
    ]
    pings = spark.createDataFrame(rows, PING_SCHEMA)
    # r17: the out-of-domain TIMESTAMP itself now trips the row-local
    # densification-domain guard — deterministically, whether or not a
    # per-entity spine would have materialized past MAX_SPINE_STEPS
    # (the r16 seed-dependence: co_dwell only failed when the poisoned
    # ping happened to land inside a stay)
    with pytest.raises(Exception, match="densification domain"):
        tile_gap_fill(pings).write.format("noop").mode("overwrite").save()
    with pytest.raises(Exception, match="densification domain"):
        resample_trajectories(pings).write.format("noop").mode("overwrite").save()
    with pytest.raises(Exception, match="densification domain"):
        co_dwell_pairs(pings).write.format("noop").mode("overwrite").save()


def test_spine_guard_backstops_in_domain_mega_spans(spark):
    """The per-entity span guard remains the backstop for timestamps
    INSIDE the densification domain whose span still exceeds
    MAX_SPINE_STEPS (198 in-domain years hourly is ~1.7M steps)."""
    import pytest

    from real_time_mobility_heatmap_spark.operators.flows import tile_gap_fill

    rows = [
        _ping(ts="1901-01-01T10:00:00", eid=1),
        _ping(ts="2099-01-01T10:00:00", eid=2),
    ]
    pings = spark.createDataFrame(rows, PING_SCHEMA)
    with pytest.raises(Exception, match="MAX_SPINE_STEPS"):
        tile_gap_fill(pings).write.format("noop").mode("overwrite").save()


def test_spine_guard_passes_in_domain_spans(spark):
    """The guard is inert on contract-respecting input."""
    from real_time_mobility_heatmap_spark.operators.flows import tile_gap_fill

    rows = [
        _ping(ts="2024-01-01T10:00:00", eid=1),
        _ping(ts="2024-03-01T10:00:00", eid=2),  # 60 days: 1440 buckets
    ]
    out = tile_gap_fill(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    assert len(out) > 1000  # densified, zero-filled
