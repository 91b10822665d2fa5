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


def require_event_time(df: DataFrame, *cols: str) -> DataFrame:
    """Loud-failure contract guard for event-time operators (the NULL
    event-time axis contract, SCALE.md / r10 verdict item #7).

    Operators that ORDER on an event-time column are defined only for
    non-null timestamps: the two engines disagree on NULL placement in
    ascending windows (Spark NULLS FIRST, DuckDB NULLS LAST), so a NULL
    slipping past the ingestion boundary (``validate_pings`` / the
    streaming watermark) would hash-diverge SILENTLY. This guard turns
    that into a task-time error instead.

    The raise lives inside the COLUMN VALUE, not a filter predicate: a
    guard filter can be shadowed — Spark's time-window operators inject
    their own ``isnotnull(eventTs)`` conjunct, and predicate reordering
    can evaluate that first, silently dropping the row the guard was
    supposed to flag (observed with ``session_window``). Rewriting the
    column as ``CASE WHEN isnull THEN raise ELSE value`` means ANY
    downstream read of the event-time column — including an injected
    null filter — trips the raise first. Effectively free on conforming
    data (one codegen null check per row).

    Use it at the top of any operator that windows/lags/sessions on raw
    (un-validated) event time; operators downstream of ``validate_pings``
    or ``snap_pings`` don't need it.
    """
    out = df
    for c in cols or ("eventTs",):
        out = out.withColumn(
            c,
            F.when(
                F.col(c).isNull(),
                F.raise_error(
                    F.lit(
                        f"event-time contract violated: NULL {c} reached an "
                        "event-time operator; drop or repair it at the "
                        "ingestion boundary (validate_pings / watermark)"
                    )
                ).cast(df.schema[c].dataType),
            ).otherwise(F.col(c)),
        )
    return out


def require_ts_domain(df: DataFrame, op: str, *cols: str) -> DataFrame:
    """Deterministic densification-domain guard for the spine consumers
    (r17; functions/guards.py SPINE_TS_MIN/MAX): rewrite each event-time
    column as ``CASE WHEN ts < min OR ts >= max THEN raise ELSE ts`` so
    ANY out-of-domain timestamp in the operator's INPUT fails fast with
    a named diagnostic — the trip depends on the corpus's content, never
    on whether a downstream per-entity spine happened to exceed
    MAX_SPINE_STEPS (the r16 seed-dependence this replaces as the
    primary trigger; the span guards remain as the in-domain backstop).

    Same column-embedded-raise idiom as ``require_event_time`` (a guard
    FILTER can be shadowed by predicate reordering); one codegen
    comparison per row on conforming data. NULL timestamps pass through
    untouched — NULL handling belongs to validate_pings /
    require_event_time, not this domain check.
    """
    from ..functions.guards import SPINE_TS_MAX, SPINE_TS_MIN

    out = df
    for c in cols or ("eventTs",):
        x = F.col(c)
        out = out.withColumn(
            c,
            F.when(
                (x < F.lit(SPINE_TS_MIN).cast("timestamp"))
                | (x >= F.lit(SPINE_TS_MAX).cast("timestamp")),
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"{op}: event time "
                        ),
                        x.cast("string"),
                        F.lit(
                            f" is outside the densification domain "
                            f"[{SPINE_TS_MIN}, {SPINE_TS_MAX}) "
                            "(functions/guards.py); an out-of-domain "
                            "timestamp violates the event-time ingestion "
                            "contract - validate or filter the feed"
                        ),
                    )
                ).cast(df.schema[c].dataType),
            ).otherwise(x),
        )
    return out
