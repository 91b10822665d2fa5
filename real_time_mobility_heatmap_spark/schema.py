"""Canonical schemas.

PING_SCHEMA mirrors the reference's explicitly declared stream schema
(heatmap_stream.py:52-61) with the parsed event-time column added and the
fixture passthrough columns (event_id, props) used by batch twins.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Wire schema of one GPS ping as it arrives from Kafka JSON
# (reference heatmap_stream.py:52-61; ts is an ISO-8601 string pre-parse).
WIRE_SCHEMA = T.StructType(
    [
        T.StructField("provider", T.StringType()),
        T.StructField("vehicleId", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("speedKmh", T.DoubleType()),
        T.StructField("bearing", T.IntegerType()),
        T.StructField("accuracyM", T.IntegerType()),
        T.StructField("ts", T.StringType()),
    ]
)

# Post-decode ping relation: eventTs parsed, fixture passthroughs appended.
PING_SCHEMA = T.StructType(
    [
        T.StructField("provider", T.StringType()),
        T.StructField("vehicleId", T.StringType()),
        T.StructField("eventTs", T.TimestampType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("speedKmh", T.DoubleType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("props", T.StringType()),
    ]
)
