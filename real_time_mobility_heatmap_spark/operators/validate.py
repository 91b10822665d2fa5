"""Validation / sanity predicates over the ping stream.

Parity with the reference's pre-UDF filter chain (heatmap_stream.py:96-104):
non-null key fields plus coordinate range checks. Kept *before* any snap
function so Catalyst can combine and push the predicates into the scan —
the same reason the reference filters before its Python UDF (SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_SQL = (
    "provider IS NOT NULL AND vehicleId IS NOT NULL AND eventTs IS NOT NULL "
    "AND lat IS NOT NULL AND lon IS NOT NULL "
    "AND lat BETWEEN -90 AND 90 AND lon BETWEEN -180 AND 180"
)


def validate_pings(pings: DataFrame) -> DataFrame:
    """Drop rows failing the reference's validity conjunction (P4+P5)."""
    return pings.filter(
        F.col("provider").isNotNull()
        & F.col("vehicleId").isNotNull()
        & F.col("eventTs").isNotNull()
        & F.col("lat").isNotNull()
        & F.col("lon").isNotNull()
        & F.col("lat").between(-90, 90)
        & F.col("lon").between(-180, 180)
    )
