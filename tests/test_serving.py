from __future__ import annotations

import datetime as dt

from real_time_mobility_heatmap_spark.serving.geojson import (
    fresh_tiles,
    tile_feature_collection,
)
from real_time_mobility_heatmap_spark.schema import PING_SCHEMA


def _pings(spark):
    return spark.createDataFrame(
        [("mbta", "v1", dt.datetime(2024, 1, 1, 10, 2), 42.35, -71.06, 12.0, 1, None)],
        PING_SCHEMA,
    )


def test_feature_geometry_ring_is_closed_and_contains_point(spark):
    feat = tile_feature_collection(_pings(spark)).first()
    assert feat["type"] == "Feature"
    ring = feat["geometry"]["coordinates"][0]
    assert len(ring) == 5 and ring[0] == ring[-1]  # closed ring
    lons = [p[0] for p in ring[:4]]
    lats = [p[1] for p in ring[:4]]
    # cell must contain the snapped point (grid20 -> 0.05 degree cells)
    assert min(lons) <= -71.06 <= max(lons)
    assert min(lats) <= 42.35 <= max(lats)
    assert feat["properties"]["windowStart"] == "2024-01-01T10:00:00Z"


def test_ttl_filter_drops_expired(spark):
    # window end 10:05 + 45 min TTL = stale at 10:50
    df = _pings(spark)
    assert fresh_tiles(df, now="2024-01-01 10:49:59").count() == 1
    assert fresh_tiles(df, now="2024-01-01 10:50:00").count() == 0
