"""Operational entrypoint — the engine's equivalent of running the
reference's three programs (`heatmap_stream.py` + `app.py`, with
`mbta_to_kafka.py` staying an external producer):

    python -m real_time_mobility_heatmap_spark

composes source -> streaming tile + latest-position queries -> idempotent
keyed stores -> HTTP serving, configured by environment variables the way
the reference is (reference heatmap_stream.py:23-37):

    KAFKA_BOOTSTRAP   Kafka source (requires the spark-sql-kafka package)
    TOPIC             Kafka topic           (default mobility.positions.v1)
    PINGS_DIR         JSON-lines file source (the Kafka twin) if no Kafka
    DEMO_SF_DIR       fixture demo source when neither is set
                      (default /root/testdata/sf0.001)
    STORE_DIR         keyed store root      (default ./mobility-store)
    CHECKPOINT        checkpoint root       (default $STORE_DIR/ckpt)
    TRIGGER_SECONDS   processing-time trigger; unset = one availableNow
                      drain (run-to-completion, the testable mode)
    HTTP_PORT         serve GET / (Leaflet page) + the two reference API
                      endpoints from the store snapshot; unset = no server

Both streaming queries run concurrently with separate checkpoints (the
two-query alternative to the reference's union-tag multiplex — SURVEY.md
§2.7 U1 documents the tradeoff), and serving reads the STORE snapshot, so
a restart serves immediately without replaying the stream.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DEFAULT, EngineConfig
from .functions.grid import cell_ring
from .functions.keys import iso_ts
from .serving.http_api import TileApiServer, merged_tiles_to_features
from .session import get_spark
from .streaming.assembly import (
    _state_partitions,
    merge_recent_store_tiles,
    start_positions_query,
    start_tiles_query,
)
from .streaming.sinks import KeyedParquetStore, positions_store, tile_store
from .streaming.sources import (
    json_ping_stream,
    kafka_ping_stream,
    pings_stream_from_events,
)


def tile_rows_to_features(tiles: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """STORE tile rows -> newest-window GeoJSON Polygon Feature rows (the
    reference app.py:45-69 read path, but from the materialized view —
    no re-aggregation of raw pings)."""
    ring = cell_ring(F.col("cell_id"), cfg.grid_scale)
    newest = tiles.agg(F.max("window_start").alias("ws"))
    latest = tiles.join(
        F.broadcast(newest), tiles.window_start == F.col("ws")
    ).drop("ws")
    return latest.select(
        F.lit("Feature").alias("type"),
        F.col("tile_id").alias("id"),
        F.struct(
            F.lit("Polygon").alias("type"),
            F.array(ring).alias("coordinates"),
        ).alias("geometry"),
        F.struct(
            F.col("cell_id"),
            F.col("ping_count"),
            F.col("avg_speed_kmh"),
            iso_ts(F.col("window_start")).alias("windowStart"),
            iso_ts(F.col("window_end")).alias("windowEnd"),
        ).alias("properties"),
    )


def position_rows_to_features(positions: DataFrame) -> DataFrame:
    """STORE position rows -> GeoJSON Point Feature rows (app.py:71-88)."""
    return positions.select(
        F.lit("Feature").alias("type"),
        F.col("position_id").alias("id"),
        F.struct(
            F.lit("Point").alias("type"),
            F.array(F.col("loc_lon"), F.col("loc_lat")).alias("coordinates"),
        ).alias("geometry"),
        F.struct(
            F.col("provider"),
            F.col("vehicleId"),
            iso_ts(F.col("event_ts")).alias("ts"),
        ).alias("properties"),
    )


def refresh_server_from_stores(
    server: TileApiServer,
    spark: SparkSession,
    tiles: KeyedParquetStore,
    positions: KeyedParquetStore,
    cfg: EngineConfig = DEFAULT,
) -> None:
    """One serving refresh off the current store snapshots (either store
    may still be empty on a cold start).

    All three endpoints refresh from the same tile snapshot: the range
    payload merges the newest k windows' int64 speed-cent partials via
    ``merge_recent_store_tiles`` (r12 advice — the store persists the
    partials exactly so this path can serve the merged heatmap without
    replaying the stream)."""
    t_snap = tiles.read(spark)
    p_snap = positions.read(spark)
    if t_snap is None or p_snap is None:
        return
    server.refresh_features(
        tile_rows_to_features(t_snap, cfg),
        position_rows_to_features(p_snap),
        merged_tiles_to_features(merge_recent_store_tiles(t_snap, cfg), cfg),
    )


def build_source(spark: SparkSession, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Source selection ladder: Kafka > JSON files > fixture demo."""
    bootstrap = os.getenv("KAFKA_BOOTSTRAP")
    if bootstrap:
        return kafka_ping_stream(
            spark, bootstrap, os.getenv("TOPIC", "mobility.positions.v1")
        )
    pings_dir = os.getenv("PINGS_DIR")
    if pings_dir:
        return json_ping_stream(spark, pings_dir)
    return pings_stream_from_events(
        spark, os.getenv("DEMO_SF_DIR", "/root/testdata/sf0.001")
    )


def run_pipeline(
    spark: SparkSession,
    store_dir: str,
    checkpoint_dir: str | None = None,
    cfg: EngineConfig = DEFAULT,
    trigger: dict | None = None,
    source_factory=None,
) -> dict:
    """Start both streaming queries against fresh sources and (for
    run-to-completion triggers) await them. Returns stores + row counts.

    ``source_factory`` builds a NEW source DataFrame per query — each
    Structured Streaming query needs its own source lineage (they track
    offsets in separate checkpoints).
    """
    factory = source_factory or (lambda: build_source(spark, cfg))
    checkpoint_dir = checkpoint_dir or os.path.join(store_dir, "ckpt")
    tiles = tile_store(os.path.join(store_dir, "tiles"))
    positions = positions_store(os.path.join(store_dir, "positions"))
    trig = trigger or {"availableNow": True}
    with _state_partitions(spark):
        q_tiles = start_tiles_query(
            factory(), tiles, os.path.join(checkpoint_dir, "tiles"), cfg, trig
        )
        q_pos = start_positions_query(
            factory(), positions, os.path.join(checkpoint_dir, "positions"), trig
        )
        if trig.get("availableNow"):
            q_tiles.awaitTermination()
            q_pos.awaitTermination()
    out = {"tiles": tiles, "positions": positions, "queries": (q_tiles, q_pos)}
    if trig.get("availableNow"):
        t_snap = tiles.read(spark)
        p_snap = positions.read(spark)
        out["n_tiles"] = 0 if t_snap is None else t_snap.count()
        out["n_positions"] = 0 if p_snap is None else p_snap.count()
    return out


def main() -> int:
    cfg = DEFAULT
    store_dir = os.getenv("STORE_DIR", "./mobility-store")
    trigger_s = os.getenv("TRIGGER_SECONDS")
    trigger = (
        {"processingTime": f"{int(trigger_s)} seconds"}
        if trigger_s
        else {"availableNow": True}
    )
    spark = get_spark("mobility-pipeline")
    result = run_pipeline(
        spark, store_dir, os.getenv("CHECKPOINT"), cfg, trigger
    )
    tiles, positions = result["tiles"], result["positions"]
    if "n_tiles" in result:
        print(
            f"pipeline drained: {result['n_tiles']} tiles, "
            f"{result['n_positions']} latest positions -> {store_dir}"
        )
    port_env = os.getenv("HTTP_PORT")
    if port_env is None:
        if trigger_s is None:
            return 0
        # continuous-trigger mode without HTTP_PORT: the documented
        # contract is "unset = no server" — keep the streaming queries
        # alive without binding a socket (ADVICE r7)
        try:
            for q in result["queries"]:
                q.awaitTermination()
        except KeyboardInterrupt:
            pass
        finally:
            # a StreamingQueryException from one query must not leave the
            # sibling running (same contract as the HTTP branch below)
            for q in result["queries"]:
                if q.isActive:
                    q.stop()
        return 0
    server = TileApiServer(port=int(port_env)).start()
    print(f"serving http://127.0.0.1:{server.port}/ (Ctrl-C to stop)")
    refresh_ms = int(os.getenv("REFRESH_MS", "5000"))
    try:
        while True:
            refresh_server_from_stores(server, spark, tiles, positions, cfg)
            if trigger_s is None:
                # drained run: one refresh then serve the static snapshot
                time.sleep(3600)
            else:
                time.sleep(refresh_ms / 1000.0)
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()
        for q in result["queries"]:
            if q.isActive:
                q.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
