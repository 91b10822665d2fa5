"""Streaming sources.

The engine's production source is Kafka JSON (reference heatmap_stream.py:
79-93): subscribe -> binary value -> cast string -> from_json(fixed schema)
-> to_timestamp. ``kafka_ping_stream`` reproduces that plan verbatim; it
needs the spark-sql-kafka connector package and a broker, neither of which
exists in the test container, so tests use ``json_ping_stream`` — a file
source over JSON lines with the SAME wire schema and decode chain, which
exercises every post-source operator identically (the source swap is the
only difference in the logical plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.keys import ISO_FMT
from ..schema import WIRE_SCHEMA

# Bounded stream event-time domain (r15 --xts first contact). Watermarked
# streaming structurally REQUIRES clock-sane event time, in both
# directions:
#  - floor 1970-01-01: Spark's initial watermark is epoch 0, so pre-epoch
#    rows are late-dropped in the very FIRST micro-batch (measured: every
#    pre-1970 --xts slice vanished from streaming_tiles while year-9924
#    rows survived). The floor makes that structural drop an explicit,
#    oracle-mirrorable ingest rule instead of silent loss.
#  - cap 2100-01-01: one far-future event advances the watermark past the
#    whole live horizon and silently drops every subsequent in-domain
#    event (and pins every "latest" projection forever) — the classic
#    poisoned-feed outage. Production stream processors bound event time
#    at ingest for exactly this reason.
# The BATCH surface deliberately keeps the engines' full proleptic-
# Gregorian 1–9999 domain (floor-exact epoch math, functions/epochs.py);
# only watermark-/latest-semantics consumers need clock sanity. Oracles
# of streaming queries mirror the bound via ``stream_ts_bound_sql``.
STREAM_TS_MIN = "1970-01-01 00:00:00"
STREAM_TS_MAX = "2100-01-01 00:00:00"


def stream_ts_bound_sql(col: str) -> str:
    """The stream event-time domain as a SQL predicate on ``col`` —
    shared verbatim by the engine filter and the DuckDB oracles."""
    return (
        f"{col} >= TIMESTAMP '{STREAM_TS_MIN}'"
        f" AND {col} < TIMESTAMP '{STREAM_TS_MAX}'"
    )


def decode_pings(raw: DataFrame) -> DataFrame:
    """Wire-schema struct -> typed ping relation (heatmap_stream.py:88-93)."""
    return raw.withColumn("eventTs", F.to_timestamp("ts", ISO_FMT)).select(
        "provider",
        "vehicleId",
        "eventTs",
        "lat",
        "lon",
        "speedKmh",
    )


def kafka_ping_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source (reference S1): requires the spark-sql-kafka package.

    The ``from_json`` decode is PERMISSIVE — malformed payloads become
    all-null structs and are dropped by validate_pings downstream, matching
    the reference's contract (SURVEY.md §1.2).
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), WIRE_SCHEMA).alias("j")
    ).select("j.*")
    return decode_pings(parsed)


def json_ping_stream(spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source twin of the Kafka stream: JSON lines, same wire schema."""
    reader = spark.readStream.schema(WIRE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.json(input_dir)
    return decode_pings(raw)


def events_stream(
    spark: SparkSession, sf_dir: str, glob: str = "events.parquet"
) -> DataFrame:
    """The fixture events parquet as a TYPED file-source stream: all six
    event columns with ``ts`` normalized to a session-zoned timestamp —
    the streaming twin of ``sources.tables.load_table(..., "events")``.

    ``events.ts`` is parquet TIMESTAMP(NANOS), and how Spark surfaces it
    changed across versions (see sources.tables.load_table). A streaming
    file source needs its schema up front, so probe with a footer-only
    batch read of the SAME file under the SAME conf and mirror whatever
    ``ts`` dtype that run of Spark produces:

    - LongType (Spark <= 4.0 legacy nanosAsLong): nanos-since-epoch ->
      ``timestamp_micros(ts div 1000)``.
    - TimestampNTZType (Spark 4.1+ native read; legacy conf ignored):
      cast NTZ -> session-zoned timestamp (identical instants under the
      engine's pinned UTC zone).

    Forcing LongType in the stream schema on a native-read Spark is NOT
    safe — 4.1.2 silently hands back micros-as-long there, which shifted
    every eventTs ~54 years and collapsed the windowed aggregate.

    ``glob`` widens the file filter for callers that stage extra
    event-shaped files next to the fixture (e.g. the session flush
    sentinel); the dtype probe always reads the canonical
    ``events.parquet``.
    """
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_type = (
        spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType
    )
    if ts_type.typeName() == "long":
        ts_expr = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        ts_expr = F.col("ts").cast("timestamp")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    # the file source needs a directory; glob-filter down to the events table
    ev = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .parquet(sf_dir)
    )
    return ev.select(
        "event_id",
        ts_expr.alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).filter(F.expr(stream_ts_bound_sql("ts")))


def pings_stream_from_events(
    spark: SparkSession, sf_dir: str, glob: str = "events.parquet"
) -> DataFrame:
    """Streaming twin of sources.tables.pings_from_events: the typed
    events stream with the same ping projection and deterministic geo
    derivation as the batch loader."""
    from ..sources.tables import LAT_SQL, LON_SQL

    ev = events_stream(spark, sf_dir, glob)
    return ev.select(
        F.col("event_type").alias("provider"),
        F.col("user_id").cast("string").alias("vehicleId"),
        F.col("ts").alias("eventTs"),
        F.expr(LAT_SQL).alias("lat"),
        F.expr(LON_SQL).alias("lon"),
        F.col("value").alias("speedKmh"),
        # event_id rides along like the batch twin's projection: the
        # per-batch argmax (positions_batch) needs it as the
        # deterministic tie key so the stream, the batch operator, and
        # the oracle agree on tied-eventTs corpora (r13 --ties sweep).
        F.col("event_id"),
    )
