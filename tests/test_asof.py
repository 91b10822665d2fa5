"""As-of join row semantics, pinned by the r11 null-bearing perturbed
sweep: the carried columns must come from THE matched row — a NULL field
on the newest match stays NULL (DuckDB ASOF semantics), never back-filled
from an older match. The original per-column ``last(ignorenulls)`` fills
did exactly that back-fill (and could even mix fields from different
rows); the struct-carry formulation makes per-row atomicity structural.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from real_time_mobility_heatmap_spark.operators.asof import asof_join


def _ev(eid, uid, ts, etype, value):
    return Row(
        event_id=eid,
        user_id=uid,
        ts=dt.datetime.fromisoformat(ts),
        event_type=etype,
        value=value,
    )


def test_asof_null_field_on_matched_row_stays_null(spark):
    """user 1: purchase(v=50) at 10:00, purchase(v=NULL) at 11:00, click
    at 12:00. The as-of match is the 11:00 purchase — purchase_value must
    be NULL (that row's field), NOT 50.0 back-filled from 10:00 — and
    both carried columns must come from the same (11:00) row."""
    events = spark.createDataFrame(
        [
            _ev(1, 1, "2024-01-01T10:00:00", "purchase", 50.0),
            _ev(2, 1, "2024-01-01T11:00:00", "purchase", None),
            _ev(3, 1, "2024-01-01T12:00:00", "click", 1.0),
        ]
    )
    clicks = events.filter(events.event_type == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(events.event_type == "purchase").select(
        "user_id",
        "ts",
        events.event_id.alias("purchase_event_id"),
        events.value.alias("purchase_value"),
    )
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        ts="ts",
        right_cols=["purchase_event_id", "purchase_value"],
    ).collect()
    assert len(out) == 1
    assert out[0]["asof_purchase_event_id"] == 2  # the 11:00 row...
    assert out[0]["asof_purchase_value"] is None  # ...with ITS null value


def test_asof_no_match_is_all_null(spark):
    """A click before any purchase gets a fully-null match struct."""
    events = spark.createDataFrame(
        [
            _ev(1, 1, "2024-01-01T09:00:00", "click", 1.0),
            _ev(2, 1, "2024-01-01T10:00:00", "purchase", 5.0),
        ]
    )
    clicks = events.filter(events.event_type == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(events.event_type == "purchase").select(
        "user_id",
        "ts",
        events.event_id.alias("purchase_event_id"),
        events.value.alias("purchase_value"),
    )
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        ts="ts",
        right_cols=["purchase_event_id", "purchase_value"],
    ).collect()
    assert out[0]["asof_purchase_event_id"] is None
    assert out[0]["asof_purchase_value"] is None


def test_latest_maxby_keeps_null_speed_of_latest_row(spark):
    """Twin consistency on a NULL-speed latest ping: latest_maxby must
    return the latest ROW's null speed, exactly like latest_rownum (the
    DuckDB oracle needed a struct-wrapped arg_max for the same row
    semantics — arg_max skips null args)."""
    from real_time_mobility_heatmap_spark.operators.latest import (
        latest_maxby,
        latest_rownum,
    )
    from real_time_mobility_heatmap_spark.schema import PING_SCHEMA

    rows = [
        Row(provider="bus", vehicleId="v1",
            eventTs=dt.datetime.fromisoformat("2024-01-01T10:00:00"),
            lat=42.0, lon=-71.0, speedKmh=33.3, event_id=1, props=None),
        Row(provider="bus", vehicleId="v1",
            eventTs=dt.datetime.fromisoformat("2024-01-01T11:00:00"),
            lat=42.1, lon=-71.1, speedKmh=None, event_id=2, props=None),
    ]
    pings = spark.createDataFrame(rows, PING_SCHEMA)
    maxby = latest_maxby(pings).collect()[0]
    rownum = latest_rownum(pings).collect()[0]
    assert maxby["speed_kmh"] is None and rownum["speed_kmh"] is None
    assert maxby["lat"] == rownum["lat"] == 42.1
