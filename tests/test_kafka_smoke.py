"""Live-broker smoke test for the Kafka streaming source (reference S1).

The sandbox has no Kafka broker and no spark-sql-kafka connector jar, so
this module is SKIPPED by default. To run it against a real deployment:

    export KAFKA_BOOTSTRAP=host:9092          # broker to reach
    export KAFKA_SMOKE_TOPIC=pings-smoke      # optional, defaults shown
    # launch pytest with the connector on the session classpath, e.g.
    #   PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> pyspark-shell"

The test publishes a handful of wire-schema JSON messages through the
producer's KafkaJsonSink, then runs ``kafka_ping_stream`` ->
``windowed_tiles_stream`` for one availableNow pass and asserts the
round-trip: every published ping decodes, validates, and lands in a tile
aggregate. This is the ONLY coverage path for streaming/sources.py's
``kafka_ping_stream`` (everything downstream of the source swap is
exercised by the file-source twin in test_streaming.py).
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

# An in-process broker was attempted and is definitively impossible in
# this sandbox (r9 probe, full log in SCALE.md "Environment blockers"):
# no kafka-server-start/mongod/redpanda binary on PATH, no Kafka
# distribution under /opt to launch a single-node KRaft from, no
# kafka-python to drive one, zero connector jars in /opt/spark/jars,
# and no DNS for --packages to fetch any of the above.
pytestmark = pytest.mark.skipif(
    not os.environ.get("KAFKA_BOOTSTRAP"),
    reason="live-broker smoke: set KAFKA_BOOTSTRAP=host:9092 (and provide "
    "the spark-sql-kafka connector package) to enable",
)

WIRE_PINGS = [
    {
        "provider": "smoke",
        "vehicleId": f"v{i}",
        "lat": 42.35 + i * 0.001,
        "lon": -71.05 - i * 0.001,
        "speedKmh": 10.0 * i,
        "bearing": None,
        "accuracyM": None,
        "ts": f"2024-01-01T00:00:0{i}Z",
    }
    for i in range(5)
]


def _publish(bootstrap: str, topic: str) -> None:
    kafka = pytest.importorskip("kafka", reason="kafka-python needed to publish")
    producer = kafka.KafkaProducer(
        bootstrap_servers=bootstrap,
        key_serializer=lambda k: k.encode(),
        value_serializer=lambda v: json.dumps(v).encode(),
    )
    for ping in WIRE_PINGS:
        producer.send(topic, key=ping["vehicleId"], value=ping)
    producer.flush()


def test_kafka_source_roundtrips_published_pings(spark, tmp_path):
    from real_time_mobility_heatmap_spark.streaming.assembly import (
        windowed_tiles_stream,
    )
    from real_time_mobility_heatmap_spark.streaming.sources import kafka_ping_stream

    bootstrap = os.environ["KAFKA_BOOTSTRAP"]
    topic = os.environ.get("KAFKA_SMOKE_TOPIC", f"pings-smoke-{uuid.uuid4().hex[:8]}")
    _publish(bootstrap, topic)

    pings = kafka_ping_stream(spark, bootstrap, topic, starting_offsets="earliest")
    query = (
        windowed_tiles_stream(pings)
        .writeStream.format("memory")
        .queryName("kafka_smoke")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    tiles = spark.sql("select * from kafka_smoke").collect()
    assert sum(r.ping_count for r in tiles) == len(WIRE_PINGS)
    assert all(r.ping_count > 0 for r in tiles)
