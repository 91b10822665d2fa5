"""Live streaming co-location (encounter) detection.

The batch operator (``operators.flows.encounter_pairs``) answers "which
vehicles were observed together" over a static ping table; a
contact-tracing / convoy-monitoring deployment needs the STREAMING form:
as ping batches arrive, pair each vehicle's NEW co-location against
everything already seen in that (cell, window), emit the pair
immediately, and fold the batch into the accumulated index.

Structured Streaming loop (same externalized-state shape as
``streaming/neardup.py``, which extends the reference's micro-batch
pattern — heatmap_stream.py:79-150 — beyond tiles):

- the events parquet splits into time-ordered micro-batch files streamed
  with ``maxFilesPerTrigger=1`` under ``availableNow``;
- ``foreachBatch`` snaps the batch to co-location triples
  (cell, window, vehicle), ANTI-JOINS them against the persisted triple
  index — a vehicle pinging the same window again in a later batch is
  NOT a new co-location, which is what makes pair emission exactly-once
  here (neardup gets that for free from unique doc_ids; pings recur) —
  pairs the genuinely-new triples against the index slice plus
  themselves, appends the pair rows, then appends the new triples to
  the index;
- the index is PARTITIONED BY DAY on disk: each batch's pair join reads
  only the partitions its windows touch, and retention is a partition
  DROP (state eviction as cheap file deletion), guarded by the same
  watermark that discards too-late batch rows — an evicted window can
  never be re-populated, so eviction cannot break exactly-once;
- a pair row is (vehicle_a, vehicle_b, cell, window); the final report
  aggregates the emitted log and hash-matches the driver's DuckDB
  oracle. Like streaming_neardup, the streamed twin runs UNCAPPED (the
  fixture's bucket fanout is tiny and the oracle is the uncapped batch
  formulation); a production deployment applies ENC_CAP to the batch
  triples exactly as the batch operator does.

Scale: per micro-batch the work is (new batch triples) ⋈ (index slice
for the touched days) — batch-sized left side, partition-pruned right
side — plus batch-sized appends. Index size is bounded by retention,
not corpus lifetime.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..lineage import cut_lineage
from ..operators.flows import ENC_WINDOW_MIN
from ..operators.tiles import snap_pings, snapped_oracle_cte
from ..sources.tables import LAT_SQL, LON_SQL, PINGS_ORACLE_SQL, load_table

N_MICRO_BATCHES = 3
# index retention in days of EVENT time behind the max window seen so
# far; generous enough that the 30-day fixture never evicts (the
# eviction path is exercised by tests with a tight retention)
RETENTION_DAYS = 365


def _triples(pings: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Batch pings -> distinct (cell_id, w_start, vehicleId, day)."""
    return (
        snap_pings(pings, cfg)
        .select(
            "cell_id",
            F.window("eventTs", f"{ENC_WINDOW_MIN} minutes").start.alias("w_start"),
            "vehicleId",
        )
        .distinct()
        .withColumn("day", F.to_date("w_start"))
    )


_HORIZON_FILE = "_horizon.txt"  # "_"-prefixed: invisible to parquet reads


def _read_horizon(idx_dir: str):
    """Max indexed window start, from the driver-side metadata file the
    ingest loop maintains (crash-safe: written AFTER the index append,
    so a stale horizon only means a slightly laxer late filter on the
    replayed batch — the anti-join still dedups its triples)."""
    import datetime as dt

    path = os.path.join(idx_dir, _HORIZON_FILE)
    if not os.path.isfile(path):
        return None
    return dt.datetime.fromisoformat(open(path).read().strip())


def _write_horizon(idx_dir: str, ts) -> None:
    tmp = os.path.join(idx_dir, _HORIZON_FILE + ".tmp")
    with open(tmp, "w") as f:
        f.write(ts.isoformat())
    os.replace(tmp, os.path.join(idx_dir, _HORIZON_FILE))


def ingest_encounter_batch(
    pings: DataFrame,
    idx_dir: str,
    out_dir: str,
    cfg: EngineConfig = DEFAULT,
    retention_days: int = RETENTION_DAYS,
    crash_before_index_append: bool = False,
) -> None:
    """One micro-batch of the co-location loop, exposed at module level
    so tests can drive batches (and simulate a crash BETWEEN the pairs
    append and the index append — ``crash_before_index_append``; on
    restart the batch replays in full and the final read's ``distinct``
    absorbs the duplicated pair rows)."""
    ss = pings.sparkSession
    b_tri = _triples(pings, cfg)

    have_index = os.path.isdir(idx_dir) and any(
        not f.startswith(("_", ".")) for f in os.listdir(idx_dir)
    )
    if have_index:
        index = ss.read.parquet(idx_dir)
        # watermark: drop batch triples older than retention behind the
        # newest window already indexed — the matching partitions may
        # already be evicted, and re-adding one would break the
        # exactly-once argument. The horizon comes from a driver-side
        # metadata file maintained per batch — a full index scan for one
        # max would read the whole retained state every micro-batch.
        horizon = _read_horizon(idx_dir)
        if horizon is not None:
            b_tri = b_tri.filter(
                F.col("w_start")
                >= F.lit(horizon) - F.expr(f"INTERVAL {retention_days} DAYS")
            )
        # only triples never seen before co-locate anew
        new_tri = b_tri.join(index, ["cell_id", "w_start", "vehicleId"], "left_anti")
    else:
        index, new_tri = None, b_tri
    # lazy cut (r18): the day_rows collect right below is the first
    # action and has a single branch, so it materializes the checkpoint
    # blocks in ITS job — an eager cut here ran a separate
    # materialization job per batch for no extra sharing (the pair build
    # and the index append still read the same blocks)
    new_tri = cut_lineage(new_tri, eager=False)  # read 3x below

    # ONE bounded-metadata collect per batch (r17: the days list and the
    # horizon max ran as two separate jobs): distinct DAYS of one
    # micro-batch (a time span, never row data) drive partition pruning,
    # and the per-day max w_start folds to the horizon update below
    day_rows = new_tri.groupBy("day").agg(F.max("w_start").alias("mx")).collect()
    days = [r["day"] for r in day_rows]
    latest = max((r["mx"] for r in day_rows), default=None)

    # pair the new triples against (index slice + new triples);
    # canonical a < b; left side is new-only, so a pair is emitted
    # exactly in the batch where its second member first co-locates
    nt = new_tri.select("cell_id", "w_start", F.col("vehicleId").alias("v1"), "day")
    if index is not None:
        idx_slice = index.filter(F.col("day").isin(days)) if days else index
        others = idx_slice.unionByName(new_tri)
    else:
        others = new_tri
    ot = others.select("cell_id", "w_start", F.col("vehicleId").alias("v2"))
    pairs = (
        nt.join(ot, ["cell_id", "w_start"])
        .filter(F.col("v1") != F.col("v2"))
        .select(
            "cell_id",
            "w_start",
            F.least("v1", "v2").alias("vehicle_a"),
            F.greatest("v1", "v2").alias("vehicle_b"),
        )
        .distinct()
    )
    pairs.write.mode("append").parquet(out_dir)
    if crash_before_index_append:
        raise RuntimeError("injected crash between pairs append and index append")
    new_tri.write.mode("append").partitionBy("day").parquet(idx_dir)

    # retention: evict whole index DAY partitions beyond the horizon
    # (``latest`` folded from the day_rows collect above — no extra job)
    if latest is not None:
        import datetime as dt

        prev = _read_horizon(idx_dir)
        horizon_now = latest if prev is None else max(prev, latest)
        _write_horizon(idx_dir, horizon_now)
        cutoff = (horizon_now - dt.timedelta(days=retention_days)).date()
        for d in os.listdir(idx_dir):
            if d.startswith("day=") and d[4:] < cutoff.isoformat():
                shutil.rmtree(os.path.join(idx_dir, d))


def run_streaming_encounters(
    spark: SparkSession,
    sf_dir: str,
    cfg: EngineConfig = DEFAULT,
    retention_days: int = RETENTION_DAYS,
) -> DataFrame:
    """Stream the fixture events in time-ordered micro-batches through
    the co-location loop and return the encounter report
    (vehicle_a, vehicle_b, n_encounters, n_cells, first_seen) —
    hash-matched by the driver against the uncapped batch oracle."""
    tmp = tempfile.mkdtemp(prefix=f"streaming-enc-{uuid.uuid4().hex[:8]}-")
    in_dir = os.path.join(tmp, "in")
    idx_dir = os.path.join(tmp, "index")
    out_dir = os.path.join(tmp, "pairs")
    os.makedirs(in_dir)

    # load_table, not a raw read: events.ts is parquet TIMESTAMP(NANOS)
    # and needs the cross-version normalization every other consumer
    # applies (on Spark <= 4.0 a raw read either fails or delivers a
    # LongType whose unix_timestamp is NULL — a silently empty report).
    # The staged micro-batch files below are REWRITTEN by Spark from the
    # normalized frame, so the stream reads ordinary microsecond
    # timestamps regardless of Spark generation.
    events = load_table(spark, sf_dir, "events")
    schema = events.schema
    bounds = events.agg(
        F.min(F.unix_timestamp("ts")).alias("lo"),
        F.max(F.unix_timestamp("ts")).alias("hi"),
    ).first()
    lo, hi = bounds["lo"], bounds["hi"]
    if lo is None:
        return spark.createDataFrame(
            [],
            "vehicle_a string, vehicle_b string, n_encounters long, "
            "n_cells long, first_seen timestamp",
        )
    span = (hi - lo + N_MICRO_BATCHES) // N_MICRO_BATCHES
    stage = os.path.join(tmp, "stage")
    # time-ordered range split: arrival order mirrors a live feed; the
    # result set is arrival-order-independent (a pair lands in the batch
    # where its second member's triple first appears)
    events.withColumn(
        "mb",
        F.least(
            F.lit(N_MICRO_BATCHES - 1),
            F.expr(f"(unix_timestamp(ts) - {lo}) div {span}"),
        ),
    ).repartition(N_MICRO_BATCHES, "mb").write.partitionBy("mb").mode(
        # hash-repartition on mb (r17): every row of one mb value lands
        # in ONE task, so each partition dir still gets exactly one file
        # (the copy loop's invariant), but the rewrite runs N-way
        # parallel instead of the old single-task coalesce(1)
        "overwrite"
    ).parquet(stage)
    import time as _time

    t0 = _time.time()
    for i in range(N_MICRO_BATCHES):
        part_dir = os.path.join(stage, f"mb={i}")
        if not os.path.isdir(part_dir):  # a time slice with zero events
            continue
        for f in os.listdir(part_dir):
            if f.endswith(".parquet"):
                dst = os.path.join(in_dir, f"batch-{i:02d}.parquet")
                shutil.copy(os.path.join(part_dir, f), dst)
                # FileStreamSource orders by mtime: force strictly
                # ascending stamps so arrival order IS event-time order
                # (two copies in one clock tick would otherwise race,
                # and the watermark would — correctly — drop the batch
                # that arrived out of order)
                os.utime(dst, (t0 + i, t0 + i))

    def _pings_of(batch: DataFrame) -> DataFrame:
        return batch.select(
            F.col("event_type").alias("provider"),
            F.col("user_id").cast("string").alias("vehicleId"),
            F.col("ts").alias("eventTs"),
            F.expr(LAT_SQL).alias("lat"),
            F.expr(LON_SQL).alias("lon"),
            F.col("value").alias("speedKmh"),
            "event_id",
            "props",
        )

    def ingest(batch: DataFrame, batch_id: int) -> None:
        ingest_encounter_batch(
            _pings_of(batch), idx_dir, out_dir, cfg, retention_days
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # distinct on the full pair row: exactly-once makes it a no-op in
    # normal operation and it absorbs a replayed batch after a crash
    # between the pairs append and the index append
    pairs = spark.read.parquet(out_dir).distinct()
    return pairs.groupBy("vehicle_a", "vehicle_b").agg(
        F.count(F.lit(1)).alias("n_encounters"),
        F.count_distinct("cell_id").alias("n_cells"),
        F.min("w_start").alias("first_seen"),
    )


def streaming_encounters_oracle(cfg: EngineConfig = DEFAULT) -> str:
    """UNCAPPED batch formulation (the streamed twin applies no depot
    cap, mirroring streaming_neardup's uncapped precedent); must stay in
    lockstep with operators.flows.encounter_pairs minus its cap."""
    return f"""
        {snapped_oracle_cte(PINGS_ORACLE_SQL, cfg)},
        triples AS (
            SELECT DISTINCT cell_id,
                   time_bucket(INTERVAL '{ENC_WINDOW_MIN} minutes', eventTs) AS w_start,
                   vehicleId
            FROM snapped
        ),
        pairs AS (
            SELECT a.cell_id, a.w_start,
                   a.vehicleId AS vehicle_a, b.vehicleId AS vehicle_b
            FROM triples a JOIN triples b
              ON a.cell_id = b.cell_id AND a.w_start = b.w_start
             AND a.vehicleId < b.vehicleId
        )
        SELECT vehicle_a, vehicle_b,
               count(*) AS n_encounters,
               count(DISTINCT cell_id) AS n_cells,
               min(w_start) AS first_seen
        FROM pairs GROUP BY vehicle_a, vehicle_b
    """
