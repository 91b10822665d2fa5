from __future__ import annotations

import datetime as dt

from real_time_mobility_heatmap_spark.operators.latest import (
    latest_join,
    latest_maxby,
    latest_rownum,
    latest_window_snapshot,
    watermark_latedrop,
)
from real_time_mobility_heatmap_spark.schema import PING_SCHEMA


def _rows(spark, rows):
    return spark.createDataFrame(rows, PING_SCHEMA)


def _p(vid, ts, lat=42.1, lon=-71.1, speed=1.0, eid=0, provider="mbta"):
    return (provider, vid, dt.datetime.fromisoformat(ts), lat, lon, speed, eid, None)


def test_latest_variants_agree_without_ties(spark):
    df = _rows(
        spark,
        [
            _p("a", "2024-01-01T10:00:00", lat=1.0, eid=1),
            _p("a", "2024-01-01T10:05:00", lat=2.0, eid=2),
            _p("b", "2024-01-01T09:00:00", lat=3.0, eid=3),
        ],
    )
    for fn in (latest_maxby, latest_join, latest_rownum):
        out = {r["vehicleId"]: r for r in fn(df).collect()}
        assert out["a"]["lat"] == 2.0 and out["b"]["lat"] == 3.0


def test_tie_semantics_join_duplicates_rownum_picks_one(spark):
    # two rows with identical max eventTs for vehicle "a"
    df = _rows(
        spark,
        [
            _p("a", "2024-01-01T10:05:00", lat=1.0, eid=1),
            _p("a", "2024-01-01T10:05:00", lat=2.0, eid=2),
        ],
    )
    # join-based argmax keeps both tie rows (reference heatmap_stream.py:204-207
    # tolerates this; its sink dedups by _id)
    assert latest_join(df).count() == 2
    # rownum variant deterministically keeps the highest event_id
    rn = latest_rownum(df).collect()
    assert len(rn) == 1 and rn[0]["lat"] == 2.0
    # maxby keeps exactly one row per key
    assert latest_maxby(df).count() == 1


def test_watermark_latedrop(spark):
    df = _rows(
        spark,
        [
            _p("a", "2024-01-01T10:00:00", eid=1),
            _p("a", "2024-01-01T10:20:00", eid=2),
            _p("a", "2024-01-01T10:12:00", eid=3),  # within 10 min of max -> kept
        ],
    )
    kept = {r["event_id"] for r in watermark_latedrop(df).collect()}
    assert kept == {2, 3}


def test_latest_window_snapshot_only_newest_window(spark):
    df = _rows(
        spark,
        [
            _p("a", "2024-01-01T10:02:00", eid=1),
            _p("b", "2024-01-01T10:07:00", eid=2),
            _p("c", "2024-01-01T10:08:00", lat=40.0, eid=3),
        ],
    )
    snap = latest_window_snapshot(df).collect()
    assert {r["window_start"] for r in snap} == {dt.datetime(2024, 1, 1, 10, 5)}
    assert len(snap) == 2  # two cells in the 10:05 window
