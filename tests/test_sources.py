"""Source-format coverage: the engine's operators are source-agnostic
DataFrame transforms — prove the same rows arrive from parquet, CSV and
JSON (schema-on-read, SURVEY.md §2.1), and that a partitioned tile sink
supports partition pruning on read."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from real_time_mobility_heatmap_spark.sources.tables import (
    load_table,
    read_table_as,
    write_table_as,
)


def _events(spark):
    return load_table(spark, "/root/testdata/sf0.001", "events")


def test_csv_json_orc_sources_round_trip_exactly(spark, tmp_path):
    ev = _events(spark)
    want = sorted(map(tuple, ev.collect()))
    for fmt in ("csv", "json", "orc"):
        path = str(tmp_path / fmt)
        write_table_as(ev, path, fmt)
        back = read_table_as(spark, path, fmt, ev.schema)
        assert sorted(map(tuple, back.collect())) == want, fmt


def test_partitioned_tile_write_prunes_on_read(spark, tmp_path):
    """Tiles written partitionBy(window_date): a date-filtered read must
    prune partitions at planning time (the serving-side layout for
    time-ranged tile queries at scale)."""
    from real_time_mobility_heatmap_spark.operators.tiles import tile_aggregate
    from real_time_mobility_heatmap_spark.sources.tables import pings_from_events

    tiles = tile_aggregate(pings_from_events(spark, "/root/testdata/sf0.001"))
    out = str(tmp_path / "tiles")
    tiles.withColumn("window_date", F.to_date("window_start")).write.partitionBy(
        "window_date"
    ).mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    n_dates = back.select("window_date").distinct().count()
    assert n_dates > 1  # fixture spans multiple days

    one_day = back.filter(F.col("window_date") == "2024-01-02")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_day.explain("formatted")
    plan = buf.getvalue()
    # the date predicate must be a partition filter (directory pruning),
    # not a data filter evaluated per row
    assert "PartitionFilters" in plan and "window_date" in plan.split("PartitionFilters", 1)[1][:200]
    assert one_day.count() == tiles.filter(
        F.to_date("window_start") == "2024-01-02"
    ).count()


def test_spread_shuffle_detection_walks_plan_nodes(spark):
    """spread() must pass shuffle-bearing plans through untouched (their
    parallelism comes from shuffle.partitions/AQE and the probe would
    finalize the AQE plan), repartition narrow scans, and — the r16
    advice fixes — neither treat explode (Generate) as a shuffle nor
    false-positive on literals/aliases whose TEXT contains a node name."""
    from real_time_mobility_heatmap_spark.sources.tables import (
        _has_shuffle_node,
        spread,
    )

    ev = _events(spark).select("event_id", "user_id")

    # narrow scan: no shuffle node -> spread repartitions up to cores
    assert not _has_shuffle_node(ev)
    target = spark.sparkContext.defaultParallelism
    assert spread(ev).rdd.getNumPartitions() >= min(target, 2)

    # aggregate / join / window / repartition / dropDuplicates: detected
    agg = ev.groupBy("user_id").count()
    assert _has_shuffle_node(agg)
    assert spread(agg) is agg
    assert _has_shuffle_node(ev.join(agg, "user_id"))
    assert _has_shuffle_node(ev.repartition(4))
    assert _has_shuffle_node(ev.dropDuplicates(["user_id"]))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("event_id")
    assert _has_shuffle_node(ev.withColumn("rn", F.row_number().over(w)))

    # Generate (explode) is NOT shuffle-producing: explode-only lineage
    # must still be spread to full parallelism
    exploded = ev.select("event_id", F.explode(F.array(F.lit(1), F.lit(2))))
    assert not _has_shuffle_node(exploded)

    # a literal/alias whose text contains a node class name must not trip
    tricked = ev.select(
        F.lit("Join Window Aggregate").alias("RepartitionNote")
    )
    assert not _has_shuffle_node(tricked)
