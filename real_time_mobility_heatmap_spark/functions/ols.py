"""Grouped ordinary-least-squares over INTEGER-exact (x, y) pairs — the
cross-engine-reproducible core behind every trend query (r10 verdict
item #8, factored out of ``flows.cell_speed_trend``).

SQL's ``regr_slope``/``regr_r2`` accumulate doubles, so their results
depend on partition/accumulation order and are not hash-reproducible
across engines. This core instead demands that callers deliver integer
x and y (fix-pointed upstream — milli-km/h, cents, micro-nats, ...)
and aggregates the six OLS sums as exact int64; slope and r² are then
ONE fixed double expression over exact integers, deterministic in any
IEEE engine regardless of row order.

Caller contract (documented, not checked): |x|, |y| small enough that
n·max(x·y) ≪ 2^63 — true for any hours/days-bounded axis against a
physically-bounded measure (the ``cell_speed_trend`` arithmetic-bounds
argument). Groups with < 2 distinct x (zero x-variance) emit NULL
slope/r².
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_ols(
    rel: DataFrame,
    keys: Sequence[str],
    x: str = "x",
    y: str = "y",
    slope_alias: str = "slope",
    r2_alias: str = "r2",
    extra_aggs: Sequence = (),
) -> DataFrame:
    """Per-``keys`` OLS of integer ``y`` against integer ``x``: returns
    (keys..., n_points, extra_aggs..., slope, r2). ``extra_aggs`` are
    additional aggregate Columns computed in the SAME pass (e.g. a ping
    count carried through)."""
    stats = rel.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_points"),
        *extra_aggs,
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(F.col(x) * F.col(x)).alias("sxx"),
        F.sum(F.col(y) * F.col(y)).alias("syy"),
        F.sum(F.col(x) * F.col(y)).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731 — local shorthand
    num = d("n_points") * d("sxy") - d("sx") * d("sy")
    den_x = d("n_points") * d("sxx") - d("sx") * d("sx")
    den_y = d("n_points") * d("syy") - d("sy") * d("sy")
    drop = [c for c in ("sx", "sy", "sxx", "syy", "sxy")]
    return stats.select(
        *[c for c in stats.columns if c not in drop],
        F.when(den_x > 0, num / den_x).alias(slope_alias),
        F.when((den_x > 0) & (den_y > 0), (num * num) / (den_x * den_y)).alias(
            r2_alias
        ),
    )


def ols_select_sql(
    n: str = "n_points",
    slope_alias: str = "slope",
    r2_alias: str = "r2",
) -> str:
    """DuckDB twin of ``grouped_ols``'s final projection: SELECT-list
    fragment over a relation carrying ``n``/sx/sy/sxx/syy/sxy integer
    columns. Keep in lockstep with the Spark expression above."""
    num = f"CAST({n} AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
    den_x = f"CAST({n} AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
    den_y = f"CAST({n} AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
    return (
        f"CASE WHEN {den_x} > 0 THEN ({num}) / ({den_x}) END AS {slope_alias},\n"
        f"               CASE WHEN {den_x} > 0 AND {den_y} > 0\n"
        f"                    THEN (({num}) * ({num})) / (({den_x}) * ({den_y})) END\n"
        f"                   AS {r2_alias}"
    )


OLS_SUMS_SQL = """count(*) AS n_points,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * y) AS BIGINT) AS sxy"""
