"""Union-tag multiplex / demultiplex (reference U1 + P9).

The reference merges two differently-shaped streams — windowed tiles and raw
latest positions — into ONE frame via ``unionByName(allowMissingColumns=
True)`` with a ``__part`` literal tag (heatmap_stream.py:136-146), so a
single streaming query/checkpoint feeds two sinks; the foreachBatch demuxes
on the tag (heatmap_stream.py:153-154). We reproduce the exact semantics
(missing columns -> null) in batch form; the streaming assembly
(streaming/assembly.py) instead uses the idiomatic single-foreachBatch
fan-out the survey recommends — this operator documents the pattern it
replaces, and its null-filling contract is oracle-checked here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..operators.tiles import tile_aggregate, tiles_oracle_sql
from ..operators.validate import VALID_SQL, validate_pings
from ..sources.tables import PINGS_ORACLE_SQL, pings_from_events

TAG = "__part"


def multiplexed(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """tiles ∪ latest-raw with tag columns, schema-aligned by name."""
    tiles = tile_aggregate(pings, cfg).withColumn(TAG, F.lit("tiles"))
    raw = (
        validate_pings(pings)
        .select("provider", "vehicleId", "eventTs", "lat", "lon")
        .withColumn(TAG, F.lit("latest"))
    )
    return tiles.unionByName(raw, allowMissingColumns=True)


def multiplex_summary(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Per-tag shape proof: missing columns are null in the other branch."""
    u = multiplexed(pings, cfg)
    return u.groupBy(TAG).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("tile_id").alias("n_tile_ids"),       # only tiles rows non-null
        F.count("vehicleId").alias("n_vehicle_ids"),  # only latest rows non-null
    )


def demux_tiles(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """P9 roundtrip: filter the union back to the tiles branch and drop the
    tag — must equal ``tile_aggregate`` exactly (oracle reuses its SQL)."""
    u = multiplexed(pings, cfg)
    tiles_cols = [c for c in u.columns if c != TAG and c not in
                  ("provider", "vehicleId", "eventTs", "lat", "lon")]
    return u.where(F.col(TAG) == "tiles").select(tiles_cols)


def multiplex_summary_oracle(cfg: EngineConfig = DEFAULT) -> str:
    return f"""
        WITH tiles AS ({tiles_oracle_sql(PINGS_ORACLE_SQL, cfg)}),
        pings AS ({PINGS_ORACLE_SQL}),
        valid AS (SELECT provider, vehicleId, eventTs, lat, lon FROM pings WHERE {VALID_SQL}),
        u AS (
            SELECT *, 'tiles' AS __part FROM tiles
            UNION ALL BY NAME
            SELECT *, 'latest' AS __part FROM valid
        )
        SELECT __part,
               count(*) AS n_rows,
               count(tile_id) AS n_tile_ids,
               count(vehicleId) AS n_vehicle_ids
        FROM u GROUP BY __part
    """


def demux_tiles_oracle(cfg: EngineConfig = DEFAULT) -> str:
    # the demuxed tiles branch must be exactly the tile aggregate
    return tiles_oracle_sql(PINGS_ORACLE_SQL, cfg)


def q_multiplex_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multiplex_summary(pings_from_events(spark, sf_dir))


def q_demux_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return demux_tiles(pings_from_events(spark, sf_dir))
