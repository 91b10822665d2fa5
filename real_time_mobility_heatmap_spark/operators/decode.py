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
from ..functions.rounding import round0, round0_sql
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


# Mirrors Spark's TYPED PERMISSIVE parse exactly (r13 --json axis: the
# naive `CAST(props ->> '$.k' AS INTEGER)` oracle diverged on five shape
# classes). from_json("k INT") yields the field ONLY for an integral
# JSON number within int32 range — a quoted "7", a 3.9 (or even 3.0)
# double, an out-of-range integer, a boolean, or malformed JSON all
# yield NULL — where DuckDB's text-extract-then-cast coerces ("7" -> 7,
# 3.9 -> 4) or ERRORS (overflow, booleans, malformed). The guards below
# reproduce the Spark contract: json_valid, integral json_type, int32
# range.
JSON_DECODE_ORACLE = """
    WITH p AS (
        SELECT event_id, try_cast(props AS JSON) AS j
        FROM events
    )
    SELECT
        event_id,
        CASE WHEN json_type(j, '$.k') IN ('BIGINT', 'UBIGINT')
              AND try_cast(j ->> '$.k' AS BIGINT)
                  BETWEEN -2147483648 AND 2147483647
             THEN CAST(j ->> '$.k' AS INTEGER) END AS prop_k,
        (json_type(j, '$.k') IN ('BIGINT', 'UBIGINT')
         AND try_cast(j ->> '$.k' AS BIGINT)
             BETWEEN -2147483648 AND 2147483647) IS TRUE AS prop_valid
    FROM p
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
        # round0: native round with the -0.0 result canonicalized (r15
        # --xval; functions/rounding.round0_sql has the full class note)
        round0(F.col("value") * 3.6, 6).alias("speed_kmh"),
        F.coalesce(
            F.nullif(F.col("event_type"), F.lit("error")),
            F.col("user_id").cast("string"),
            F.lit("unknown"),
        ).alias("provider_norm"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_or_zero"),
        (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("stale_at"),
    )


NORMALIZE_ORACLE = f"""
    SELECT
        event_id,
        {round0_sql('value * CAST(3.6 AS DOUBLE)', 6)} AS speed_kmh,
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


# Mirrors Spark's STRICT map parse (r13 --json axis): from_json
# map<string,bigint> nulls the ENTIRE map if ANY value is not an
# integral int64 JSON number (a nested object, a string, a 2.5 — or
# even an integral-valued 3.0 double), where DuckDB's MAP cast coerces
# doubles and ERRORS on the rest. The ok-filter below admits a row only
# when the payload is a valid JSON OBJECT whose every value has
# integral json_type and fits BIGINT — exactly the rows whose Spark map
# is non-null — and only then applies the MAP cast (safe by the filter).
PROPS_KEY_STATS_ORACLE = """
    WITH cand AS (
        -- try_cast, not json(): SQL conjuncts need not short-circuit,
        -- so a bare json(props) could raise on the malformed slice
        SELECT try_cast(props AS JSON) AS j FROM events
        WHERE json_type(try_cast(props AS JSON)) = 'OBJECT'
    ),
    ok AS (
        -- a JSON null IS an admissible entry (Spark keeps it as a
        -- NULL-valued map entry, which counts in n_events and drops out
        -- of min/max/sum); everything else must be an integral int64
        SELECT j FROM cand
        WHERE coalesce(list_aggregate(list_transform(json_keys(j),
                  k -> json_type(j, '$."' || k || '"') = 'NULL'
                       OR (json_type(j, '$."' || k || '"')
                               IN ('BIGINT', 'UBIGINT')
                           AND try_cast(json_extract_string(j, '$."' || k || '"')
                                        AS BIGINT) IS NOT NULL)),
              'bool_and'), TRUE)
    ),
    kv AS (
        SELECT unnest(map_keys(m)) AS prop_key, unnest(map_values(m)) AS prop_value
        FROM (SELECT CAST(j AS MAP(VARCHAR, BIGINT)) AS m FROM ok)
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
