"""Composite key and timestamp-format column builders.

The reference assembles sink keys with Python f-strings in the foreachBatch
loop (heatmap_stream.py:173, 217); we build them as Spark columns so key
construction happens executor-side inside codegen, and so the exact same
expression is statable in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"  # reference README.md:216-218 pins this shape


def iso_ts(col: Column) -> Column:
    """ISO-8601 Z-suffixed rendering (reference heatmap_stream.py:173 strftime)."""
    return F.date_format(col, ISO_FMT)


def iso_ts_sql(col_sql: str) -> str:
    return f"strftime({col_sql}, '%Y-%m-%dT%H:%M:%SZ')"


def tile_id(city: str, grid_name: str, cell: Column, window_start: Column) -> Column:
    """Deterministic tile `_id` = city|grid|cell|windowStartISO (heatmap_stream.py:173)."""
    return F.concat_ws("|", F.lit(city), F.lit(grid_name), cell, iso_ts(window_start))


def tile_id_sql(city: str, grid_name: str, cell_sql: str, window_start_sql: str) -> str:
    return f"'{city}' || '|' || '{grid_name}' || '|' || ({cell_sql}) || '|' || {iso_ts_sql(window_start_sql)}"


def position_id(provider: Column, vehicle_id: Column) -> Column:
    """Latest-position `_id` = provider|vehicleId (heatmap_stream.py:217)."""
    return F.concat_ws("|", provider, vehicle_id)
