"""Cross-engine totality pins for the shared fixed-point fragments (r17).

The --xval class fix (SCALE.md r17) rests on three claims, each verified
here directly against DuckDB on the full set of IEEE shapes the axis
manufactures — so a future edit to functions/rounding.py cannot silently
reopen the Spark-saturates-vs-DuckDB-errors split:

1. ``micro_units[_sql]``: TRY_CAST(round(x*1e6) AS BIGINT) — NULL
   outside int64, identical values inside, in BOTH engines, SQL and
   Column forms agreeing bit-for-bit.
2. ``fixed_units[_sql]``: the int64-grid guard precedes the floor
   (Spark's floor(DOUBLE) returns BIGINT and silently saturates at
   ±2^63 with NaN → 0 — pinned below as the non-vacuity half).
3. ``round_half_up[_sql]``: identity outside the grid (doubles that
   large have no fractional part at the target scale), floor-based
   half-up inside.

DuckDB caveat pinned by construction: a python-param NaN silently
becomes NULL in duckdb.sql params, so NaN goes in as ``'nan'::DOUBLE``.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from real_time_mobility_heatmap_spark.functions.rounding import (
    fixed_units,
    fixed_units_sql,
    micro_units,
    micro_units_sql,
    round_half_up,
    round_half_up_sql,
)

DBL_MAX = 1.7976931348623157e308
SHAPES = [
    DBL_MAX,
    -DBL_MAX,
    4.9406564584124654e-324,  # min positive subnormal
    -0.0,
    1e300,
    -1e300,
    9.3e18,  # above int64
    9.223372036854775e18,  # the 2^63 boundary double
    9.199e12,  # just inside the micros grid
    1e8 + 0.37,  # the --xval in-contract 1e8 band
    123.456,
    -42.5,
    26.241249999999997,  # the r10 native-round boundary catch
]


def _duck(sql_frag: str, vals, nan_too: bool = True):
    rows = duckdb.sql(
        f"SELECT {sql_frag} FROM (SELECT unnest(?::DOUBLE[]) AS x)",
        params=[vals],
    ).fetchall()
    out = [r[0] for r in rows]
    if nan_too:
        out.append(
            duckdb.sql(
                f"SELECT {sql_frag} FROM (SELECT 'nan'::DOUBLE AS x)"
            ).fetchone()[0]
        )
    return out


def _spark(spark, col_expr, vals):
    df = spark.createDataFrame(
        [(v,) for v in vals] + [(float("nan"),)], "x double"
    )
    return [r[0] for r in df.select(col_expr).collect()]


def _agree(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and math.isnan(a):
        return isinstance(b, float) and math.isnan(b)
    return a == b


@pytest.mark.parametrize(
    "sql_form,col_builder",
    [
        (micro_units_sql("x"), lambda: micro_units(F.col("x"))),
        (fixed_units_sql("x", "100"), lambda: fixed_units(F.col("x"), 100)),
        (fixed_units_sql("x", "1e6"), lambda: fixed_units(F.col("x"), 1e6)),
        (round_half_up_sql("x", 6), lambda: round_half_up(F.col("x"), 6)),
        (round_half_up_sql("x", 2), lambda: round_half_up(F.col("x"), 2)),
    ],
    ids=["micro", "cents", "micros-fixed", "half_up6", "half_up2"],
)
def test_fragment_total_and_cross_engine_identical(spark, sql_form, col_builder):
    duck = _duck(sql_form, SHAPES)
    via_sql = _spark(spark, F.expr(sql_form), SHAPES)
    via_col = _spark(spark, col_builder(), SHAPES)
    for v, d, s_sql, s_col in zip(SHAPES + [float("nan")], duck, via_sql, via_col):
        assert _agree(s_sql, d), (v, s_sql, d)
        assert _agree(s_col, d), (v, s_col, d)


def test_saturation_is_real_without_the_guard(spark):
    """Non-vacuity: the raw (unguarded) floor spelling really does
    saturate on Spark — ±2^63 for overscale values, 0 for NaN — while
    DuckDB errors on the cast. If a Spark upgrade ever changes this,
    the guard's rationale needs re-verifying (and this test says so)."""
    df = spark.createDataFrame(
        [(1e300,), (-1e300,), (float("nan"),)], "x double"
    )
    raw = [
        r[0]
        for r in df.select(
            F.floor(F.col("x") * 100 + F.lit(0.5)).cast("long")
        ).collect()
    ]
    assert raw[0] == 2**63 - 1 and raw[1] == -(2**63) and raw[2] == 0, raw
    with pytest.raises(duckdb.ConversionException):
        duckdb.sql(
            "SELECT CAST(floor(x * 100 + 5e-1) AS BIGINT)"
            " FROM (SELECT 1e300::DOUBLE AS x)"
        ).fetchall()
