"""Structured Streaming assembly of the L1 operators (SURVEY.md §7 M4).

Reference EP2 (heatmap_stream.py:96-132, 241-247) as idiomatic Spark:

  source -> validate -> grid snap -> withWatermark -> window agg
         -> outputMode(update) -> foreachBatch(idempotent keyed merge)

Design departures from the reference, per SURVEY.md §4.2:
- TWO queries with separate checkpoints (tiles agg; latest positions)
  instead of union-tag multiplexing one query — each plan stays minimal,
  and the idempotent sinks make cross-query atomicity unnecessary;
- per-batch argmax for positions uses max_by (one shuffle), with
  cross-batch correctness from the sink's ts-monotonic merge (ST4):
  streaming state stays bounded by the watermark, per-key "latest"
  state lives in the sink exactly as in the reference;
- sink writes are Spark jobs (executor-parallel), never toLocalIterator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import DEFAULT, EngineConfig
from ..functions.grid import cell_id
from ..functions.keys import position_id, tile_id
from ..functions.rounding import fixed_units, round_half_up
from ..operators.validate import validate_pings
from .sinks import KeyedParquetStore

# Cents-exact streaming means (r12, matching the batch twins): the
# streaming state then accumulates ORDER-FREE int64 cents across
# micro-batches instead of ulp-drifting doubles, so the snapshot value
# is the identical exact rational the batch/oracle formulation
# computes, regardless of batch arrival order.
def _cents(col: str):
    # total unit recovery (functions/rounding.fixed_units): NULL outside
    # the int64 cents grid, identical to the batch/oracle fragment
    return fixed_units(col, 100)


def _cents_avg(sum_col: str, cnt_col: str):
    return F.col(sum_col).cast("double") / 100 / F.col(cnt_col)


def windowed_tiles_stream(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Streaming tile aggregate: watermark + tumbling window + hash agg.

    Identical logical shape to the batch twin (operators/tiles.py), minus
    rounding (sink values are exact; rounding is an oracle-comparison aid).
    """
    snapped = (
        validate_pings(pings)
        .withColumn("cell_id", cell_id(F.col("lat"), F.col("lon"), cfg.grid_scale))
        .filter(F.col("cell_id").isNotNull())
        .withWatermark("eventTs", cfg.watermark)
    )
    agg = snapped.groupBy(
        F.window("eventTs", cfg.window_duration).alias("w"), F.col("cell_id")
    ).agg(
        F.count(F.lit(1)).alias("ping_count"),
        F.sum(_cents("speedKmh")).alias("_sum_speed_cents"),
        F.count("speedKmh").alias("_n_speed"),
        F.sum(_cents("lon")).alias("_sum_lon_cents"),
        F.count("lon").alias("_n_lon"),
        F.sum(_cents("lat")).alias("_sum_lat_cents"),
        F.count("lat").alias("_n_lat"),
    ).withColumns(
        {
            "avg_speed_kmh": _cents_avg("_sum_speed_cents", "_n_speed"),
            "centroid_lon": _cents_avg("_sum_lon_cents", "_n_lon"),
            "centroid_lat": _cents_avg("_sum_lat_cents", "_n_lat"),
        }
    )
    return agg.select(
        tile_id(cfg.city, cfg.grid_name, F.col("cell_id"), F.col("w.start")).alias("tile_id"),
        F.lit(cfg.city).alias("city"),
        F.lit(cfg.grid_name).alias("grid"),
        "cell_id",
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "ping_count",
        "avg_speed_kmh",
        "centroid_lon",
        "centroid_lat",
        (F.col("w.end") + F.expr(f"INTERVAL {cfg.ttl_minutes} MINUTES")).alias("stale_at"),
        # mergeable partials (r12): exact int64 speed cents + non-null
        # count persist alongside the final avg, so the serving path can
        # re-aggregate ACROSS stored windows exactly (k-window merge —
        # README roadmap "merge last N minutes of tiles" on the live
        # path). Rounded per-window avgs alone cannot merge exactly.
        F.col("_sum_speed_cents").alias("sum_speed_cents"),
        F.col("_n_speed").alias("n_speed"),
    )


def start_tiles_query(
    pings: DataFrame,
    store: KeyedParquetStore,
    checkpoint: str,
    cfg: EngineConfig = DEFAULT,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Tiles query: update mode emits only changed (cell, window) aggregates
    per micro-batch (ST2); the sink merge makes replays idempotent (ST6)."""
    tiles = windowed_tiles_stream(pings, cfg)
    writer = (
        tiles.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(lambda batch_df, epoch_id: store.merge(batch_df, epoch_id))
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


STATE_PARTITIONS = 8  # state-store shards for the fixture-scale runs


class _state_partitions:
    """Scope ``spark.sql.shuffle.partitions`` around a streaming start.

    Stateful streaming queries create one state-store instance PER
    shuffle partition PER stateful operator, and the count is pinned by
    the checkpoint at first run. The right number tracks STATE
    cardinality (cells x windows here — small at fixture scale; raise
    for a larger corpus), not the session's batch parallelism: at 32
    the fixture runs spent more time opening/committing 32 state stores
    per micro-batch than aggregating (measured 2x end-to-end). A real
    deployment sets this per streaming job the same way; repartitioning
    existing state needs a new checkpoint (offline state rebuild).
    """

    def __init__(self, spark, n: int = STATE_PARTITIONS):
        self.spark, self.n = spark, str(n)

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", self.n)

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


def run_streaming_tiles(spark, sf_dir: str, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """End-to-end streaming run over the fixture events: file-source stream
    -> windowed agg (update mode) -> idempotent keyed store; returns the
    final store snapshot, rounded like the batch twin so it hash-matches
    the SAME DuckDB oracle as ``mobility_tiles``.

    The whole fixture arrives as one availableNow micro-batch, so no rows
    are watermark-dropped and the store must equal the batch aggregate —
    which is exactly the property worth checking.
    """
    import tempfile

    from .sinks import tile_store
    from .sources import pings_stream_from_events

    tmp = tempfile.mkdtemp(prefix="streaming-tiles-")
    store = tile_store(f"{tmp}/store")
    stream = pings_stream_from_events(spark, sf_dir)
    with _state_partitions(spark):
        q = start_tiles_query(stream, store, f"{tmp}/ckpt", cfg)
        q.awaitTermination()
    snap = _snap_or_empty(spark, store, windowed_tiles_stream(stream, cfg).schema)
    # drop the mergeable partials: this snapshot hash-compares against the
    # batch tiles oracle, whose columns end at stale_at
    return snap.drop("sum_speed_cents", "n_speed").withColumn(
        "avg_speed_kmh", round_half_up(F.col("avg_speed_kmh"), 6)
    ).withColumn(
        "centroid_lon", round_half_up(F.col("centroid_lon"), 6)
    ).withColumn("centroid_lat", round_half_up(F.col("centroid_lat"), 6))


def merge_recent_store_tiles(
    snap: DataFrame, cfg: EngineConfig = DEFAULT, k: int = 3
) -> DataFrame:
    """Serving-path k-window merge over a tile-store SNAPSHOT — the live
    twin of ``operators.latest.recent_tiles_merged`` (README roadmap
    "merge the last N minutes of tiles"): per cell, one merged row over
    the newest ``k`` stored windows.

    Exactness: the store carries int64 speed-cent partials per window
    (``windowed_tiles_stream``), so the merge re-aggregates EXACT
    integers — ``sum(cents) * 10000`` is the identical int64 the batch
    twin's micro-unit sum computes, and the division/rounding sequence
    mirrors it operation-for-operation, so the live merge hash-matches
    the batch result (tests/test_streaming.py). Merging the rounded
    per-window avgs instead would re-weight doubles and drift — the
    round-2 failure recent_tiles_merged's docstring records.
    """
    span = F.expr(f"INTERVAL {(k - 1) * cfg.tile_minutes} MINUTES")
    bound = snap.agg((F.max("window_start") - span).alias("min_ws"))
    recent = snap.crossJoin(F.broadcast(bound)).filter(
        F.col("window_start") >= F.col("min_ws")
    )
    return recent.groupBy("cell_id").agg(
        F.sum("ping_count").alias("ping_count"),
        round_half_up(
            F.sum(F.col("sum_speed_cents") * 10000)
            / F.lit(1e6)
            / F.sum("n_speed"),
            6,
        ).alias("avg_speed_kmh"),
        F.count_distinct("window_start").alias("n_windows"),
        F.min("window_start").alias("merge_start"),
        F.max("window_end").alias("merge_end"),
    )


def run_streaming_tiles_merged(
    spark, sf_dir: str, cfg: EngineConfig = DEFAULT, k: int = 3
) -> DataFrame:
    """Live pipeline -> store -> k-window serving merge (see
    ``merge_recent_store_tiles``)."""
    import tempfile

    from .sinks import tile_store
    from .sources import pings_stream_from_events

    tmp = tempfile.mkdtemp(prefix="streaming-tiles-merge-")
    store = tile_store(f"{tmp}/store")
    stream = pings_stream_from_events(spark, sf_dir)
    with _state_partitions(spark):
        q = start_tiles_query(stream, store, f"{tmp}/ckpt", cfg)
        q.awaitTermination()
    snap = _snap_or_empty(spark, store, windowed_tiles_stream(stream, cfg).schema)
    return merge_recent_store_tiles(snap, cfg, k)


def run_streaming_positions(spark, sf_dir: str) -> DataFrame:
    """End-to-end run of the reference's SECOND sink path (S5): ping
    stream -> per-batch argmax (max_by, one shuffle) -> ts-guarded
    conditional upsert store -> final snapshot, hash-matched to the
    batch ``latest_positions`` oracle. With ``run_streaming_tiles`` this
    makes both reference sinks driver-verified live; the cross-batch
    monotonic-guard semantics (out-of-order and replayed micro-batches)
    are pinned separately by the streaming test suite.
    """
    import tempfile

    from .sinks import positions_store
    from .sources import pings_stream_from_events

    tmp = tempfile.mkdtemp(prefix="streaming-positions-")
    store = positions_store(f"{tmp}/store")
    stream = pings_stream_from_events(spark, sf_dir)
    with _state_partitions(spark):
        q = start_positions_query(stream, store, f"{tmp}/ckpt")
        q.awaitTermination()
    return _snap_or_empty(spark, store, positions_batch(stream).schema)


def _snap_or_empty(spark, store: KeyedParquetStore, schema) -> DataFrame:
    """Store snapshot, or an EMPTY frame with the sink relation's schema
    when the source was empty and nothing was ever merged — the live-run
    driver queries must be TOTAL (empty result, never a None crash; r10
    empty-input sweep). ``schema`` comes from applying the same frame
    builder the sink uses to the (streaming) source, which analyzes
    without starting the query."""
    snap = store.read(spark)
    return snap if snap is not None else spark.createDataFrame([], schema)


FLUSH_PROVIDER = "__flush__"  # sentinel key; filtered from session output


def _sentinel_events_dir(sf_dir: str, flush_after_minutes: int, prefix: str) -> tuple[str, str]:
    """Stage the fixture events plus a FLUSH SENTINEL into a temp input
    dir for an append-mode streaming run: one event ``flush_after_minutes``
    past the last real event so an ``availableNow`` run's final watermark
    passes every real window/trip horizon and the trailing no-data
    micro-batch finalizes them all. The sentinel timestamp comes from the
    parquet FOOTER's column statistics — a metadata read, no data scan,
    the same trick a production backfill uses to bound a partition's
    event-time. Returns (tmp_root, input_dir); stream with
    ``glob="*events.parquet"`` and filter ``FLUSH_PROVIDER`` rows out of
    the result."""
    import os
    import shutil
    import tempfile
    from datetime import timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tempfile.mkdtemp(prefix=prefix)
    in_dir = os.path.join(tmp, "in")
    os.makedirs(in_dir)
    src = os.path.join(sf_dir, "events.parquet")
    shutil.copy(src, os.path.join(in_dir, "events.parquet"))

    meta = pq.ParquetFile(src).metadata
    ts_idx = next(
        i for i in range(meta.num_columns)
        if meta.schema.column(i).name == "ts"
    )
    stats = [
        meta.row_group(g).column(ts_idx).statistics
        for g in range(meta.num_row_groups)
    ]
    maxes = [s.max for s in stats if s is not None and s.max is not None]
    if not maxes:
        # EMPTY fixture: no event-time to bound, nothing for a sentinel to
        # flush — stream just the (empty) fixture (r10 empty-input sweep)
        return tmp, in_dir
    flush_ts = max(maxes) + timedelta(minutes=flush_after_minutes)
    # the sentinel must itself pass the stream event-time bound
    # (sources.STREAM_TS_MIN/MAX): on a corpus carrying out-of-domain
    # future timestamps the footer max exceeds the cap, and an
    # out-of-domain sentinel would be filtered at the source — flushing
    # nothing. Clamp to just under the cap: still past every IN-DOMAIN
    # event by construction.
    from datetime import datetime as _dt

    from .sources import STREAM_TS_MAX

    cap = _dt.fromisoformat(STREAM_TS_MAX) - timedelta(seconds=1)
    flush_ts = min(flush_ts, cap)
    # mirror the fixture's own ts arrow type (unit varies across fixture
    # generations: micros vs nanos) so one stream schema reads both files
    ts_type = pq.ParquetFile(src).schema_arrow.field("ts").type
    sentinel = pa.table(
        {
            "event_id": pa.array([-1], pa.int64()),
            "ts": pa.array([flush_ts], ts_type),
            "user_id": pa.array([-1], pa.int64()),
            "event_type": pa.array([FLUSH_PROVIDER], pa.string()),
            "value": pa.array([0.0], pa.float64()),
            "props": pa.array([None], pa.string()),
        }
    )
    pq.write_table(sentinel, os.path.join(in_dir, "flush-events.parquet"))
    return tmp, in_dir


def run_streaming_sessions(spark, sf_dir: str, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """End-to-end streaming SESSION-window run over the fixture events,
    hash-matched to the batch gaps-and-islands oracle
    (operators.windows.vehicle_sessions).

    Streaming session aggregation is APPEND-only — a session is emitted
    when the watermark passes its end. To make every fixture session
    finalize inside one ``availableNow`` run, the input dir gets a FLUSH
    SENTINEL alongside the fixture: one event far past the last real
    event (gap + watermark + margin). Processing it advances the
    watermark past every real session's end, and Spark's trailing
    no-data micro-batch emits them all; the sentinel's own (still-open)
    session is filtered out by its reserved provider key. The sentinel
    timestamp comes from the parquet FOOTER's column statistics — a
    metadata read, no data scan, the same trick a production backfill
    uses to bound a partition's event-time.
    """
    import os
    import uuid

    from ..operators.windows import SESSION_GAP_MIN
    from .sources import pings_stream_from_events

    wm_minutes = int(cfg.watermark.split()[0])
    tmp, in_dir = _sentinel_events_dir(
        sf_dir, SESSION_GAP_MIN + wm_minutes + 60, "streaming-sessions-"
    )

    name = f"sessions_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            windowed_sessions_stream(
                pings_stream_from_events(spark, in_dir, glob="*events.parquet"),
                cfg,
                SESSION_GAP_MIN,
            )
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(name)
        # null-safe sentinel drop, as DEFENSIVE STYLE (r12 advice): NULL
        # providers never reach this filter — windowed_sessions_stream
        # validates pings before the state store, and the batch oracle's
        # WHERE drops them too — but a plain != would silently discard
        # any NULL-keyed row a future upstream change let through, so the
        # null-safe form keeps the filter total over its domain
        .filter(~F.col("provider").eqNullSafe(FLUSH_PROVIDER))
        .select(
            "provider",
            "vehicleId",
            "session_start",
            "n_pings",
            round_half_up(F.col("avg_speed_kmh"), 6).alias("avg_speed_kmh"),
        )
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class _rocksdb_state_store:
    """Scope the RocksDB state-store provider around a streaming start:
    ``transformWithState`` requires it (the typed-state API needs multiple
    column families, which the default HDFS-backed provider lacks). The
    provider is pinned per-query by the checkpoint at first run, so
    scoping the session conf around ``start()`` is sufficient — and
    restoring it keeps the rest of the suite on the default provider."""

    KEY = "spark.sql.streaming.stateStore.providerClass"

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get(self.KEY, None)
        self.spark.conf.set(self.KEY, ROCKSDB_PROVIDER)

    def __exit__(self, *exc):
        if self.prev is None:
            self.spark.conf.unset(self.KEY)
        else:
            self.spark.conf.set(self.KEY, self.prev)


def run_streaming_trips_tws(spark, sf_dir: str) -> DataFrame:
    """Live ``transformWithStateInPandas`` trip detection over the fixture
    events, hash-matched to the SAME gaps-and-islands oracle as the batch
    ``vehicle_trips`` (operators.windows.VEHICLE_TRIPS_ORACLE) — the
    PySpark 4.x typed-state successor of the ``applyInPandasWithState``
    detector, exercised end to end (r9 verdict #5).

    Same flush-sentinel protocol as ``run_streaming_sessions``: the
    sentinel advances the final watermark past every trip's ``end + gap``
    horizon so the event-time TIMERS finalize all dangling trips inside
    one ``availableNow`` run. ``trip_no`` (the batch oracle's per-vehicle
    running trip index) is assigned afterwards by a stateless window over
    the streamed result — trips of one vehicle are time-disjoint, so
    ordering by ``trip_start`` reproduces the batch numbering exactly.
    """
    import os
    import uuid

    from ..operators.windows import SESSION_GAP_MIN
    from .sources import pings_stream_from_events
    from .stateful import vehicle_trips_stream_tws

    wm_minutes = 10
    tmp, in_dir = _sentinel_events_dir(
        sf_dir, SESSION_GAP_MIN + wm_minutes + 60, "streaming-trips-tws-"
    )

    name = f"trips_tws_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark), _rocksdb_state_store(spark):
        q = (
            vehicle_trips_stream_tws(
                pings_stream_from_events(spark, in_dir, glob="*events.parquet"),
                watermark=f"{wm_minutes} minutes",
            )
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    w = Window.partitionBy("provider", "vehicleId").orderBy("trip_start")
    return (
        spark.table(name)
        # null-safe sentinel drop (see run_streaming_sessions)
        .filter(~F.col("provider").eqNullSafe(FLUSH_PROVIDER))
        .withColumn("trip_no", F.row_number().over(w).cast("long"))
        .select("provider", "vehicleId", "trip_no", "trip_start", "trip_end", "n_pings")
    )


def run_streaming_conversions(spark, sf_dir: str) -> DataFrame:
    """Live STREAM-STREAM interval join registered as a driver query,
    hash-matched to the batch ``conversion_window_counts`` oracle: the
    typed events stream self-joined — purchases to clicks of the same
    user within the following hour — with watermarks on both sides so
    join state is evictable.

    The inner join is the stateful part the stream proves (matches emit
    as found; state eviction needs the watermark + both-sided interval
    bound). The batch oracle counts per purchase INCLUDING zero-click
    purchases, which an inner join cannot emit — those rows are restored
    by a stateless left join against the purchase dimension afterward, a
    projection over the streamed result, not streaming state.
    """
    import os
    import tempfile
    import uuid

    from ..sources.tables import load_table
    from .sources import events_stream

    tmp = tempfile.mkdtemp(prefix="streaming-conv-")
    ev = events_stream(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", DEFAULT.watermark)
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", DEFAULT.watermark)
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts"))
        & (F.col("c_ts") <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("purchase_id", "p_user", "c_ts")

    name = f"conv_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    counts = (
        spark.table(name)
        .groupBy("purchase_id", "p_user")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    from .sources import stream_ts_bound_sql

    all_purchases = (
        load_table(spark, sf_dir, "events")
        # same bounded stream event-time domain as the streamed side
        # (sources.events_stream): the zero-click restore must cover
        # exactly the purchases the stream admitted
        .filter(F.expr(stream_ts_bound_sql("ts")))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
        )
    )
    return all_purchases.join(counts, ["purchase_id", "p_user"], "left").select(
        "purchase_id",
        "p_user",
        F.coalesce("n_clicks", F.lit(0)).cast("long").alias("clicks_within_1h"),
    )


def positions_batch(batch_df: DataFrame) -> DataFrame:
    """Per-batch argmax to the positions_latest document shape (A4 via
    max_by — single shuffle, no back-join; SURVEY.md §4.2).

    Deterministic tie winner (r13 --ties sweep): a bare-eventTs max_by
    picks an arbitrary row among same-second pings of one vehicle. The
    ordering key appends event_id when the source carries it (the fixture
    events twin), else the row CONTENT (lat, lon, speedKmh) — the wire
    schema has no unique id (reference heatmap_stream.py:52-61), and a
    content key still makes the winner a pure function of the batch's
    rows, not of accumulator visit order. Ties that span MICRO-BATCHES
    stay with the store's documented stored-wins-on-equal-ts guard
    (reference parity: its Mongo upsert keeps the stored doc on equal
    ts); a file-source batch is whole files, so the single-file fixture
    run never splits a tie across batches.
    """
    if "event_id" in batch_df.columns:
        # decimal-packed (eventTs, event_id) — keeps the argmax
        # HashAggregate-able (a struct buffer silently falls back to
        # SortAggregate); same packing as operators/latest.latest_maxby
        key = F.expr(
            "CAST(unix_micros(eventTs) AS DECIMAL(18,0))"
            " * 10000000000000000000 + event_id"
        )
    else:
        # wire path: content ordering, struct-keyed — per-micro-batch
        # relations are small, so the SortAggregate fallback the struct
        # buffer forces is batch-local and cheap
        key = F.struct("eventTs", "lat", "lon", "speedKmh")
    return (
        validate_pings(batch_df)
        .groupBy("provider", "vehicleId")
        .agg(
            F.max("eventTs").alias("event_ts"),
            F.max_by("lon", key).alias("loc_lon"),
            F.max_by("lat", key).alias("loc_lat"),
        )
        .select(
            position_id(F.col("provider"), F.col("vehicleId")).alias("position_id"),
            "provider",
            "vehicleId",
            "event_ts",
            "loc_lon",
            "loc_lat",
        )
    )


def start_multiplexed_query(
    pings: DataFrame,
    tile_store: KeyedParquetStore,
    pos_store: KeyedParquetStore,
    checkpoint: str,
    cfg: EngineConfig = DEFAULT,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Reference-fidelity union-tag multiplex (U1 + P9, heatmap_stream.py:
    136-154): ONE streaming query / ONE checkpoint feeds both sinks. The
    windowed tiles and the raw stream are tagged, unionByName'd with
    null-fill, and demuxed inside foreachBatch.

    Kept alongside the two-query design because the single checkpoint
    commits both outputs from the same micro-batch; the price is a wider
    union schema through the plan (SURVEY.md §2.7 documents the tradeoff).
    """
    tiles = windowed_tiles_stream(pings, cfg).withColumn("__part", F.lit("tiles"))
    raw = validate_pings(pings).withColumn("__part", F.lit("latest"))
    unioned = tiles.unionByName(raw, allowMissingColumns=True)

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            tile_cols = [c for c in tiles.columns if c != "__part"]
            tile_store.merge(
                batch_df.where(F.col("__part") == "tiles").select(tile_cols), epoch_id
            )
            raw_cols = [c for c in raw.columns if c != "__part"]
            pos_store.merge(
                positions_batch(batch_df.where(F.col("__part") == "latest").select(raw_cols)),
                epoch_id,
            )
        finally:
            batch_df.unpersist()

    writer = (
        unioned.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_sink)
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def windowed_sessions_stream(
    pings: DataFrame, cfg: EngineConfig = DEFAULT, gap_minutes: int = 30
) -> DataFrame:
    """Streaming per-vehicle session windows (SURVEY.md §2.5 gap family).

    ``session_window`` merges overlapping/adjacent windows in state as new
    events arrive: an event within ``gap_minutes`` of an open session
    EXTENDS it (same start, later end), a farther event opens a new
    session. Spark only supports APPEND output for streaming session
    aggregations — a session is emitted exactly once, when the watermark
    passes its end (i.e. no further event can extend it) — so the sink
    sees only finalized sessions and needs no upsert. Watermark bounds
    session state exactly like the tumbling-window aggregate.
    Batch twin: ``operators.windows.vehicle_sessions`` (oracle-checked
    gaps-and-islands SQL).
    """
    return (
        validate_pings(pings)
        .withWatermark("eventTs", cfg.watermark)
        .groupBy(
            "provider",
            "vehicleId",
            F.session_window("eventTs", f"{gap_minutes} minutes").alias("s"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pings"),
            F.sum(_cents("speedKmh")).alias("_sum_speed_cents"),
            F.count("speedKmh").alias("_n_speed"),
        )
        .select(
            "provider",
            "vehicleId",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_pings",
            _cents_avg("_sum_speed_cents", "_n_speed").alias("avg_speed_kmh"),
        )
    )


def provider_dim(pings: DataFrame) -> DataFrame:
    """Static provider dimension for the stream-static join: per
    provider, fleet size and an above-average-traffic tier flag. Built
    batch-side (|providers| rows — the reference-data shape) and
    re-resolved into every micro-batch by ``enrich_with_static_dim``."""
    per = pings.groupBy("provider").agg(
        F.count_distinct("vehicleId").alias("fleet"),
        F.count(F.lit(1)).alias("n_pings"),
    )
    avg_pings = per.agg(F.avg("n_pings").alias("avg_pings"))
    return (
        per.crossJoin(F.broadcast(avg_pings))
        .select(
            "provider",
            "fleet",
            F.when(F.col("n_pings") > F.col("avg_pings"), F.lit("heavy"))
            .otherwise(F.lit("light"))
            .alias("tier"),
        )
    )


def run_streaming_enriched(spark, sf_dir: str, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Live STREAM-STATIC join registered as a driver query (the one
    Structured Streaming join shape the registry didn't exercise
    end-to-end): the ping stream left-joins the batch-derived provider
    dimension per micro-batch — no join state, the broadcast re-resolves
    each batch — then a watermarked tumbling count per (tier, window) in
    update mode lands in an idempotent keyed store. Hash-matched to the
    pure-SQL batch oracle.
    """
    import tempfile

    from ..sources.tables import pings_from_events
    from .sinks import KeyedParquetStore
    from .sources import pings_stream_from_events

    from .sources import stream_ts_bound_sql

    # the provider dim is derived from the SAME feed the stream consumes,
    # so it carries the stream's bounded event-time domain too — tier
    # thresholds computed over rows the stream never admits would skew
    # the classification of the rows it does
    dim = provider_dim(
        pings_from_events(spark, sf_dir).filter(
            F.expr(stream_ts_bound_sql("eventTs"))
        )
    )
    stream = enrich_with_static_dim(
        pings_stream_from_events(spark, sf_dir), dim, "provider"
    )
    agg = (
        stream.withWatermark("eventTs", cfg.watermark)
        .groupBy(F.window("eventTs", cfg.window_duration).alias("w"), "tier")
        .agg(
            F.count(F.lit(1)).alias("ping_count"),
            F.sum("fleet").alias("fleet_weight"),
        )
        .select(
            F.concat_ws("|", "tier", F.col("w.start").cast("string")).alias("k"),
            "tier",
            F.col("w.start").alias("window_start"),
            "ping_count",
            "fleet_weight",
        )
    )
    tmp = tempfile.mkdtemp(prefix="streaming-enriched-")
    store = KeyedParquetStore(f"{tmp}/store", key_cols=["k"], newer_col=None)
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("update")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .foreachBatch(lambda b, e: store.merge(b, e))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return _snap_or_empty(spark, store, agg.schema).select(
        "tier", "window_start", "ping_count", "fleet_weight"
    )


def streaming_enriched_oracle(pings_sql: str, cfg: EngineConfig = DEFAULT) -> str:
    w = f"time_bucket(INTERVAL '{cfg.tile_minutes} minutes', eventTs)"
    return f"""
        WITH pings AS ({pings_sql}),
        per AS (
            SELECT provider, count(DISTINCT vehicleId) AS fleet,
                   count(*) AS n_pings
            FROM pings GROUP BY provider
        ),
        dim AS (
            SELECT provider, fleet,
                   CASE WHEN n_pings > (SELECT avg(n_pings) FROM per)
                        THEN 'heavy' ELSE 'light' END AS tier
            FROM per
        )
        SELECT d.tier,
               {w} AS window_start,
               count(*) AS ping_count,
               CAST(sum(d.fleet) AS BIGINT) AS fleet_weight
        FROM pings p LEFT JOIN dim d ON p.provider = d.provider
        GROUP BY d.tier, {w}
    """


def enrich_with_static_dim(pings: DataFrame, dim: DataFrame, key: str = "provider") -> DataFrame:
    """Stream-static join: enrich the unbounded ping stream with a small
    static dimension (broadcast into every micro-batch — no streaming
    state at all, unlike a stream-stream join). The canonical shape for
    reference-data lookups at any scale; the dim is re-resolved per
    batch, so a batch-refreshed dim table picks up changes."""
    return pings.join(F.broadcast(dim), key, "left")


def stream_stream_conversions(
    pings: DataFrame,
    purchase_provider: str = "purchase",
    click_provider: str = "click",
    horizon_minutes: int = 60,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream join (the streaming twin of the batch
    ``conversion_window_counts``): clicks joined to purchases of the same
    key within the following ``horizon_minutes``.

    Both sides carry watermarks and the join condition bounds the click
    time to a finite interval AFTER the purchase time — together these
    let Spark evict join state (a stream-stream join without both is
    unbounded state). The equi key (vehicleId here, user id in the batch
    twin) carries the shuffle; the range condition prunes within key
    groups.
    """
    purchases = (
        pings.filter(F.col("provider") == purchase_provider)
        .select(
            F.col("vehicleId").alias("p_key"),
            F.col("eventTs").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        pings.filter(F.col("provider") == click_provider)
        .select(
            F.col("vehicleId").alias("c_key"),
            F.col("eventTs").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_key") == F.col("c_key"))
        & (F.col("c_ts") > F.col("p_ts"))
        & (F.col("c_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")),
        "inner",
    ).select("p_key", "p_ts", "c_ts")


def streaming_dedup(pings: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup bounded by watermark (SURVEY.md §2.11):
    duplicate pings (same key within the watermark horizon) are emitted
    once; state for old keys is evicted as the watermark advances."""
    return pings.withWatermark("eventTs", watermark).dropDuplicatesWithinWatermark(
        ["provider", "vehicleId", "eventTs"]
    )


def start_positions_query(
    pings: DataFrame,
    store: KeyedParquetStore,
    checkpoint: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Latest-positions query: append-shape stream, per-batch argmax in the
    sink, cross-batch monotonicity from the store's conditional merge."""
    writer = (
        pings.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(lambda batch_df, epoch_id: store.merge(positions_batch(batch_df), epoch_id))
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
