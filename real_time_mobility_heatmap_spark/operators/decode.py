"""Decode / normalization operators (reference P1-P3, P10, F3, F5-F7).

The reference's ingest path is: Kafka binary -> cast string -> from_json with
a fixed schema -> to_timestamp (heatmap_stream.py:88-93), with PERMISSIVE
semantics (malformed JSON -> nulls, dropped downstream), plus producer-side
normalization (mbta_to_kafka.py:60-73: unit conversion, fallback ids,
timestamp fallbacks). Here each piece is a batch operator over the fixture
``events`` table, with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.keys import ISO_FMT
from ..sources.tables import load_table


def json_decode(events: DataFrame) -> DataFrame:
    """P2: schema-on-read JSON parse of the ``props`` payload.

    from_json in PERMISSIVE mode: malformed/missing fields become nulls
    (reference heatmap_stream.py:90 relies on the same contract).
    """
    parsed = events.withColumn("j", F.from_json(F.col("props"), "k INT"))
    return parsed.select(
        "event_id",
        F.col("j.k").alias("prop_k"),
        F.col("j.k").isNotNull().alias("prop_valid"),
    )


JSON_DECODE_ORACLE = """
    SELECT
        event_id,
        CAST(props ->> '$.k' AS INTEGER) AS prop_k,
        (props ->> '$.k') IS NOT NULL AS prop_valid
    FROM events
"""


def wire_roundtrip(events: DataFrame) -> DataFrame:
    """P1+P3+F3: timestamp -> ISO-8601 'Z' string -> parsed timestamp.

    Proves the engine's wire format parse (reference README.md:216-218 pins
    the ``yyyy-MM-dd'T'HH:mm:ss'Z'`` shape; heatmap_stream.py:92 parses it).
    Seconds precision: the wire format truncates sub-second, as the
    reference's producer does (mbta_to_kafka.py:29 isoformat+Z).
    """
    iso = F.date_format("ts", ISO_FMT)
    return events.select(
        "event_id",
        iso.alias("ts_iso"),
        F.to_timestamp(iso, ISO_FMT).alias("event_ts"),
    )


WIRE_ROUNDTRIP_ORACLE = """
    SELECT
        event_id,
        strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_iso,
        strptime(strftime(ts, '%Y-%m-%dT%H:%M:%SZ'), '%Y-%m-%dT%H:%M:%SZ') AS event_ts
    FROM events
"""


def normalize(events: DataFrame) -> DataFrame:
    """P10+F5-F7: producer-side normalization as Spark columns.

    - unit conversion m/s -> km/h (mbta_to_kafka.py:70), treating ``value``
      as a speed in m/s;
    - fallback id chain ``label or id or "unknown"`` (mbta_to_kafka.py:68)
      modeled as coalesce over nullable candidates;
    - null-coalescing numeric defaults (heatmap_stream.py:168-171);
    - interval arithmetic stale stamp (heatmap_stream.py:174).
    """
    return events.select(
        "event_id",
        F.round(F.col("value") * 3.6, 6).alias("speed_kmh"),
        F.coalesce(
            F.nullif(F.col("event_type"), F.lit("error")),
            F.col("user_id").cast("string"),
            F.lit("unknown"),
        ).alias("provider_norm"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_or_zero"),
        (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("stale_at"),
    )


NORMALIZE_ORACLE = """
    SELECT
        event_id,
        round(value * CAST(3.6 AS DOUBLE), 6) AS speed_kmh,
        coalesce(nullif(event_type, 'error'), CAST(user_id AS VARCHAR), 'unknown') AS provider_norm,
        coalesce(value, CAST(0.0 AS DOUBLE)) AS value_or_zero,
        ts + INTERVAL '45 minutes' AS stale_at
    FROM events
"""


def q_json_decode(spark, sf_dir: str) -> DataFrame:
    return json_decode(load_table(spark, sf_dir, "events"))


def q_wire_roundtrip(spark, sf_dir: str) -> DataFrame:
    return wire_roundtrip(load_table(spark, sf_dir, "events"))


def q_normalize(spark, sf_dir: str) -> DataFrame:
    return normalize(load_table(spark, sf_dir, "events"))


def props_key_stats(events: DataFrame) -> DataFrame:
    """MapType surface: parse the raw JSON ``props`` payload as a
    map<string,long> (schema-on-read where field names are NOT known in
    advance — the complement of the fixed-struct ``json_decode``),
    explode the entries, and aggregate per key.

    Map explode is a Generate (map-side); the aggregate is keyed on the
    tiny property-name space.
    """
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return (
        events.select(F.explode(m).alias("prop_key", "prop_value"))
        .groupBy("prop_key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("prop_value").alias("min_value"),
            F.max("prop_value").alias("max_value"),
            F.sum("prop_value").alias("sum_value"),
        )
    )


PROPS_KEY_STATS_ORACLE = """
    WITH kv AS (
        SELECT unnest(map_keys(m)) AS prop_key, unnest(map_values(m)) AS prop_value
        FROM (SELECT CAST(json(props) AS MAP(VARCHAR, BIGINT)) AS m FROM events)
    )
    SELECT prop_key,
           count(*) AS n_events,
           min(prop_value) AS min_value,
           max(prop_value) AS max_value,
           CAST(sum(prop_value) AS BIGINT) AS sum_value
    FROM kv GROUP BY prop_key
"""


def q_props_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    return props_key_stats(load_table(spark, sf_dir, "events"))
