from __future__ import annotations

from real_time_mobility_heatmap_spark.streaming.assembly import (
    start_multiplexed_query,
    streaming_dedup,
)
from real_time_mobility_heatmap_spark.streaming.sinks import positions_store, tile_store
from real_time_mobility_heatmap_spark.streaming.sources import json_ping_stream
from tests.test_streaming import ROWS, _wire, _write_json


def test_multiplexed_query_feeds_both_stores(spark, tmp_path):
    """Union-tag single-query variant: one checkpoint, two sinks (U1+P9)."""
    in_dir = str(tmp_path / "in")
    _write_json(in_dir, "b1.json", ROWS)
    tiles = tile_store(str(tmp_path / "tiles"))
    pos = positions_store(str(tmp_path / "pos"))
    q = start_multiplexed_query(
        json_ping_stream(spark, in_dir), tiles, pos, str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    t = {r["tile_id"]: r for r in tiles.read(spark).collect()}
    assert sum(r["ping_count"] for r in t.values()) == 4  # invalid row dropped
    p = {r["vehicleId"]: r for r in pos.read(spark).collect()}
    assert set(p) == {"v1", "v2"}
    assert p["v1"]["event_ts"].isoformat() == "2024-01-01T10:04:00"  # newest kept


def test_streaming_dedup_within_watermark(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    dup = _wire("v1", "2024-01-01T10:02:00Z")
    _write_json(in_dir, "b1.json", [dup, dup, _wire("v2", "2024-01-01T10:03:00Z")])

    out_rows = []
    q = (
        streaming_dedup(json_ping_stream(spark, in_dir))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda df, _eid: out_rows.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    keys = sorted((r["vehicleId"], r["eventTs"].isoformat()) for r in out_rows)
    assert keys == [("v1", "2024-01-01T10:02:00"), ("v2", "2024-01-01T10:03:00")]
