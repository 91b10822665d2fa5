"""Unit semantics for the mobility-science family (operators/science.py):
hand-computed radius of gyration, entropy fixed-point values, integer
jump binning, the CUSUM closed form vs the textbook recursion, plan
shape, and empty-input totality."""

from __future__ import annotations

import datetime as dt
import math

import pyarrow.parquet as pq
from pyspark.sql import Row

from real_time_mobility_heatmap_spark.operators.science import (
    CUSUM_SLACK_DIV,
    cusum_anomaly_report,
    jump_length_report,
    location_entropy,
    radius_of_gyration,
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


# ---- radius_of_gyration ---------------------------------------------------


def test_rg_two_point_hand_value(spark):
    """Two pings 0.01 deg of latitude apart: the centroid is the midpoint,
    so rg = half the separation = 0.005 * 111320 = 556.6 m, and
    max_dev_m == rg. A single-ping vehicle has rg 0."""
    rows = [
        _ping(ts="2024-01-01T10:00:00", lat=42.35, eid=1),
        _ping(ts="2024-01-01T10:05:00", lat=42.36, eid=2),
        _ping(vid="v2", ts="2024-01-01T10:00:00", eid=3),
    ]
    out = {
        r["vehicleId"]: r
        for r in radius_of_gyration(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    }
    assert abs(out["v1"]["rg_m"] - 556.6) < 0.01
    # integer-millimeter centroid truncation can split the two deviations
    # by 1 mm, so max_dev tracks rg only to the fixed-point grain
    assert abs(out["v1"]["max_dev_m"] - out["v1"]["rg_m"]) <= 0.002
    assert out["v1"]["n_pings"] == 2
    assert out["v2"]["rg_m"] == 0.0 and out["v2"]["max_dev_m"] == 0.0


def test_rg_single_corpus_exchange(spark):
    """Centroid window and deviation aggregate share ONE (vehicleId)
    exchange — the two-pass shape must not pay a second shuffle."""
    import contextlib
    import io

    df = entry_mod.queries()["radius_of_gyration"](spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    tree = buf.getvalue().split("\n(1)")[0]
    assert tree.count(" Exchange (") == 1


# ---- location_entropy -----------------------------------------------------


def test_entropy_fixed_point_values(spark):
    """Two cells visited equally -> H = ln 2 -> 693147 micro-nats and a
    500000 ppm top share; a one-cell vehicle is exactly 0 / 1000000."""
    rows = [
        _ping(ts="2024-01-01T10:00:00", lat=42.35, eid=1),
        _ping(ts="2024-01-01T10:01:00", lat=42.35, eid=2),
        _ping(ts="2024-01-01T10:02:00", lat=42.40, eid=3),
        _ping(ts="2024-01-01T10:03:00", lat=42.40, eid=4),
        _ping(vid="v2", ts="2024-01-01T10:00:00", eid=5),
    ]
    out = {
        r["vehicleId"]: r
        for r in location_entropy(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    }
    assert out["v1"]["entropy_unats"] == round(math.log(2) * 1_000_000)
    assert out["v1"]["n_cells"] == 2 and out["v1"]["top_share_ppm"] == 500_000
    assert out["v2"]["entropy_unats"] == 0
    assert out["v2"]["top_share_ppm"] == 1_000_000


# ---- jump_length_report ---------------------------------------------------


def test_jump_bins_and_shares(spark):
    """A stationary pair (bin 0), a ~50 m hop (bin 2), and a ~5 km hop
    (bin 4): decade binning on the integer millimeter step, ppm shares
    sum to <= 1e6 with integer truncation."""
    rows = [
        _ping(ts="2024-01-01T10:00:00", lat=42.35, eid=1),
        _ping(ts="2024-01-01T10:01:00", lat=42.35, eid=2),  # 0 m -> bin 0
        _ping(ts="2024-01-01T10:02:00", lat=42.3504492, eid=3),  # ~50 m -> bin 2
        _ping(ts="2024-01-01T10:03:00", lat=42.3953595, eid=4),  # ~5 km -> bin 4
    ]
    out = {
        r["bin_id"]: r
        for r in jump_length_report(spark.createDataFrame(rows, PING_SCHEMA)).collect()
    }
    assert set(out) == {0, 2, 4}
    assert out[0]["mean_step_mm"] == 0 and out[0]["lo_mm"] == 0
    assert 10_000 <= out[2]["mean_step_mm"] < 100_000 and out[2]["lo_mm"] == 10_000
    assert 1_000_000 <= out[4]["mean_step_mm"] < 10_000_000
    assert all(r["share_ppm"] == 333_333 for r in out.values())


# ---- cusum_anomaly_report -------------------------------------------------


def test_cusum_matches_textbook_recursion(spark):
    """The prefix-sum/running-extreme closed form must equal Page's
    recursion S_t = max(0, S_{t-1} + x_t - ref - k) computed in Python
    over the same daily series (burst on day 5, total outage on days
    8-9 — the silent days must appear as zero-count calendar rows and
    accumulate enough cusum_down to fire drop_flag)."""
    counts = [4, 4, 4, 4, 12, 4, 4, 0, 0, 4]
    rows, eid = [], 0
    for day, n in enumerate(counts, start=1):
        for j in range(n):
            eid += 1
            rows.append(_ping(ts=f"2024-01-{day:02d}T10:{j:02d}:00", eid=eid))
    out = sorted(
        cusum_anomaly_report(spark.createDataFrame(rows, PING_SCHEMA)).collect(),
        key=lambda r: r["day"],
    )
    # day 8 has zero pings but the densified calendar still emits its
    # row (r10 advice #2) — the detector sees all 10 calendar days and
    # the silent day feeds cusum_down instead of vanishing
    ref = sum(counts) // len(counts)
    k = ref // CUSUM_SLACK_DIV
    s_up = s_dn = 0
    expect_up, expect_dn = [], []
    for x in counts:
        s_up = max(0, s_up + x - ref - k)
        s_dn = max(0, s_dn + ref - k - x)
        expect_up.append(s_up)
        expect_dn.append(s_dn)
    assert [r["n_pings"] for r in out] == counts
    assert all(r["ref_pings"] == ref for r in out)
    assert [r["cusum_up"] for r in out] == expect_up
    assert [r["cusum_down"] for r in out] == expect_dn
    assert [r["spike_flag"] for r in out] == [s > ref for s in expect_up]
    assert [r["drop_flag"] for r in out] == [s > ref for s in expect_dn]
    # the total outage must actually fire the alarm, not just appear
    assert any(r["drop_flag"] for r in out)


# ---- totality -------------------------------------------------------------


def test_science_total_on_empty_fixtures(spark, tmp_path):
    src = "/root/testdata/sf0.001/events.parquet"
    pq.write_table(pq.read_table(src).slice(0, 0), str(tmp_path / "events.parquet"))
    qs = entry_mod.queries()
    for name in (
        "radius_of_gyration",
        "location_entropy",
        "jump_length_report",
        "cusum_anomaly_report",
    ):
        df = qs[name](spark, str(tmp_path))
        assert df.collect() == []
        assert df.schema.fieldNames()
