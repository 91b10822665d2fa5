"""Wire-format encode + serving-style bucketing (reference F8, F9) and the
raw SQL surface.

- ``wire_encode``: the Kafka-writer framing (key = vehicleId, value = JSON
  of the wire struct) the engine would hand to
  ``df.writeStream.format("kafka")``. Null fields are kept (``ignoreNull
  Fields=false``) so the JSON text is byte-identical to DuckDB's to_json —
  the encode itself is oracle-checked, not just smoke-tested. Timestamps
  are pre-formatted ISO strings inside the struct (engine-native timestamp
  JSON renderings differ).
- ``tile_colors``: the 7-bucket choropleth ramp the reference computes in
  the browser (app.py:135-142), as a when/otherwise column — the engine
  analog for server-side styling.
- ``sql_pricing_summary``: the same logical query authored as RAW Spark
  SQL over registered temp views — proves the engine's SQL entry point,
  not just the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..functions.keys import iso_ts, iso_ts_sql
from ..operators.relational import Q1_EXACT_COLUMNS
from ..operators.tiles import tile_aggregate, tiles_oracle_sql
from ..operators.validate import validate_pings
from ..sources.tables import PINGS_ORACLE_SQL, TABLES, load_table, pings_from_events
from .validate import VALID_SQL


def wire_encode(pings: DataFrame) -> DataFrame:
    """pings -> Kafka-framing (key, value-json) rows."""
    v = validate_pings(pings)
    payload = F.struct(
        F.col("provider"),
        F.col("vehicleId"),
        F.col("lat"),
        F.col("lon"),
        F.col("speedKmh"),
        iso_ts(F.col("eventTs")).alias("ts"),
    )
    return v.select(
        F.col("vehicleId").alias("key"),
        F.to_json(payload, {"ignoreNullFields": "false"}).alias("value"),
    )


WIRE_ENCODE_ORACLE = f"""
    WITH pings AS ({PINGS_ORACLE_SQL}),
    valid AS (SELECT * FROM pings WHERE {VALID_SQL})
    SELECT vehicleId AS key,
           to_json(struct_pack(
               provider := provider,
               vehicleId := vehicleId,
               lat := lat,
               lon := lon,
               speedKmh := speedKmh,
               ts := {iso_ts_sql('eventTs')}
           ))::VARCHAR AS value
    FROM valid
"""

# the reference's count -> color ramp (app.py:135-142), densest first
COLOR_RAMP = [
    (100, "#67000d"), (50, "#a50f15"), (25, "#cb181d"), (10, "#ef3b2c"),
    (5, "#fb6a4a"), (2, "#fc9272"), (0, "#fee5d9"),
]


def tile_colors(pings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Server-side choropleth bucket per tile (F9 engine analog)."""
    t = tile_aggregate(pings, cfg)
    expr = None
    for threshold, hexcode in COLOR_RAMP[:-1]:
        cond = F.col("ping_count") > threshold
        expr = F.when(cond, hexcode) if expr is None else expr.when(cond, hexcode)
    expr = expr.otherwise(COLOR_RAMP[-1][1])
    return t.select("tile_id", "cell_id", "ping_count", expr.alias("fill_color"))


def tile_colors_oracle(cfg: EngineConfig = DEFAULT) -> str:
    cases = " ".join(
        f"WHEN ping_count > {th} THEN '{hx}'" for th, hx in COLOR_RAMP[:-1]
    )
    return f"""
        WITH tiles AS ({tiles_oracle_sql(PINGS_ORACLE_SQL, cfg)})
        SELECT tile_id, cell_id, ping_count,
               CASE {cases} ELSE '{COLOR_RAMP[-1][1]}' END AS fill_color
        FROM tiles
    """


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as a temp view for the raw SQL surface."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# the money/avg columns come verbatim from relational.Q1_EXACT_COLUMNS —
# the exact-DECIMAL discipline (functions/money.py) in raw-SQL form; the
# fragment is valid in both Spark SQL and DuckDB, so the DataFrame build,
# this twin, and the oracle can never drift apart.
SQL_PRICING_SUMMARY = f"""
    SELECT
        l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS sum_qty,
        round(sum(l_extendedprice), 2) AS sum_base_price,
        {Q1_EXACT_COLUMNS},
        count(1) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


def q_wire_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wire_encode(pings_from_events(spark, sf_dir))


def q_tile_colors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tile_colors(pings_from_events(spark, sf_dir))


def q_sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_PRICING_SUMMARY)
