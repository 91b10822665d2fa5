"""Spatial cell snap — the engine's analog of the reference's H3 UDF.

The reference snaps (lat, lon) -> H3 cell id with a row-at-a-time Python UDF
(heatmap_stream.py:65-75), which is its single JVM<->Python round trip and
opaque to Catalyst. Our default snapper is a *uniform lat/lon grid* expressed
as pure column arithmetic: it stays inside whole-stage codegen, predicates
push through it, and it is exactly reproducible in ANSI SQL (the DuckDB
oracle). Real H3 remains available as an optional Arrow-vectorized
pandas UDF plug-in (``h3_cell_udf``) gated on the ``h3`` package, verified by
rows-only checks since H3 indexes are not SQL-expressible.

Cell id format: ``"{floor(lat*scale)}:{floor(lon*scale)}"`` — string ids keep
parity with H3's string cell ids and concat cheaply into tile keys.
"""

from __future__ import annotations

import pandas as pd  # module-level so the pandas_udf type hints resolve
from pyspark.sql import Column
from pyspark.sql import functions as F


def cell_id(lat: Column, lon: Column, scale: int) -> Column:
    """Snap coordinates to a uniform grid cell id (codegen-friendly).

    Uses null-propagating ``concat`` (NOT ``concat_ws``, which skips null
    args and would emit malformed ids like ``"12"`` for a null coordinate):
    a null lat/lon yields a null cell id, matching the oracle's ``||`` and
    making the downstream ``cell_id IS NOT NULL`` drop meaningful for
    snappers that can return null (e.g. the H3 plug-in).
    """
    y = F.floor(lat * F.lit(scale)).cast("bigint").cast("string")
    x = F.floor(lon * F.lit(scale)).cast("bigint").cast("string")
    return F.concat(y, F.lit(":"), x)


def cell_id_sql(lat_sql: str, lon_sql: str, scale: int) -> str:
    """The identical snap in ANSI SQL for the DuckDB oracle."""
    return (
        f"CAST(CAST(floor(({lat_sql}) * {scale}) AS BIGINT) AS VARCHAR) || ':' || "
        f"CAST(CAST(floor(({lon_sql}) * {scale}) AS BIGINT) AS VARCHAR)"
    )


def cell_ring(cell: Column, scale: int) -> Column:
    """Closed GeoJSON-style polygon ring for a grid cell, as pure column math.

    The reference derives hex boundaries with the h3 library on the read side
    (app.py:19-41); for grid cells the ring is the 4 corners (+ closing
    point), each ``[lng, lat]``, counter-clockwise.
    """
    y = F.split(cell, ":").getItem(0).cast("bigint")
    x = F.split(cell, ":").getItem(1).cast("bigint")
    s = F.lit(float(scale))
    lat0, lat1 = y / s, (y + 1) / s
    lon0, lon1 = x / s, (x + 1) / s

    def pt(lon: Column, lat: Column) -> Column:
        return F.array(lon, lat)

    return F.array(
        pt(lon0, lat0), pt(lon1, lat0), pt(lon1, lat1), pt(lon0, lat1), pt(lon0, lat0)
    )


def h3_cell_udf(resolution: int):
    """Optional real-H3 snapper: Arrow-vectorized pandas UDF over h3-py.

    Parity with reference heatmap_stream.py:65-75 (version-adaptive
    geo_to_h3 / latlng_to_cell), but batched through Arrow instead of
    pickled row-at-a-time. Raises ImportError when h3 is not installed —
    callers must treat it as an optional plug-in.
    """
    try:
        import h3  # noqa: F401
    except ImportError as e:
        raise ImportError("h3 package not installed; use the grid snapper") from e

    from pyspark.sql.functions import pandas_udf

    # version-adaptive dispatch, reference heatmap_stream.py:65-75: h3-py
    # v4 renamed geo_to_h3 -> latlng_to_cell
    to_cell = getattr(h3, "latlng_to_cell", None) or getattr(h3, "geo_to_h3")

    @pandas_udf("string")
    def snap(lat: pd.Series, lon: pd.Series) -> pd.Series:
        mask = lat.notna() & lon.notna() & lat.between(-90, 90) & lon.between(-180, 180)
        out = pd.Series([None] * len(lat), dtype=object)
        out[mask] = [to_cell(a, b, resolution) for a, b in zip(lat[mask], lon[mask])]
        return out

    return snap
