"""Engine-exact decimal rounding for DOUBLE columns (r10).

``round(double, d)`` is NOT cross-engine stable: Spark rounds the
shortest-decimal representation via BigDecimal HALF_UP, while DuckDB
computes ``std::round(x * 10^d) / 10^d`` in the float domain — when
``x * 10^d`` itself rounds across a .5 boundary the two disagree
(observed live: ``min((26.241249999999997)) -> 26.2412`` in Spark vs
``26.2413`` in DuckDB, a driver value-hash flip waiting at any scale
factor whose data lands on a boundary).

``round_half_up_sql`` instead evaluates ``floor(x * 10^d + 0.5) / 10^d``
with scientific-notation literals — every op (multiply, add, floor,
divide) is exactly rounded IEEE double arithmetic, so BOTH engines
compute the identical bits from the identical input double (the same
determinism argument as ``textfns.ln_u60_exact_sql``). Semantics:
half-up toward +infinity (equals conventional half-up for the
non-negative money/metric columns it is applied to).

The same string is valid Spark SQL and DuckDB SQL; use ``F.expr`` on
the Spark side and inline it in the oracle.
"""

from __future__ import annotations


def round_half_up_sql(expr: str, decimals: int) -> str:
    """Total (r17): outside the int64 grid (|x·scale + 0.5| ≥ 9.2e18 —
    where Spark's floor→BIGINT SATURATES while DuckDB's stays DOUBLE,
    the zscore_outliers --xval split) the fragment returns the input
    unchanged, which is exact: any double that large has no fractional
    part at the target scale, so rounding is the identity. NaN/±Inf
    take the same identity branch in both engines (NaN comparisons are
    false in both)."""
    scale = f"1e{decimals}"
    u = f"({expr}) * {scale} + 5e-1"
    return f"(CASE WHEN abs({u}) < 9.2e18 THEN floor({u}) / {scale} ELSE ({expr}) END)"


def round0_sql(expr: str, decimals: int) -> str:
    """NATIVE round (half-away, both engines) with the -0.0 result
    canonicalized to +0.0 — shared fragment, valid in both dialects.

    The r15 --xval axis caught the split twice (normalize,
    mad_outliers): Spark's round() goes through BigDecimal, which has
    NO negative zero, so a -0.0 input — or any tiny negative that
    rounds to zero at the target scale — emits +0.0, while DuckDB's
    IEEE scaled round keeps the sign. Adding positive zero is the
    identity everywhere else and maps -0.0 -> +0.0 identically in both
    engines (IEEE: -0 + +0 = +0). Use this instead of bare
    round()/F.round for any output column whose expression can be
    negative; the floor-based half-up fragments are structurally
    immune (floor(x*s + 0.5) of a tiny negative is +0)."""
    return f"(round({expr}, {decimals}) + CAST(0.0 AS DOUBLE))"


def round0(col, decimals: int):
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, decimals) + F.lit(0.0)


def avg_2dec_exact_sql(col: str, decimals: int = 6) -> str:
    """Engine-exact mean of a DOUBLE column whose values carry a
    2-decimal wire contract (speedKmh, lon/lat grid offsets, money
    totals, event values): accumulate exact int64 CENTS (order-free,
    associative — ``floor(x*100 + 0.5)`` recovers the true cents from
    the nearest-double representation in both engines), divide the
    identical exact values once, and round with the shared float-domain
    half-up form. A plain ``round(avg(DOUBLE), d)`` instead sums
    ulp-drifting doubles in engine/partition-specific order AND
    natively rounds a boundary-capable rational — both halves of the
    r11 perturbed-corpus divergence class. NULL semantics match
    ``avg``: sum/count skip NULLs; an all-NULL group yields NULL.
    Exact while |sum of cents| < 2^53 (~9e13-row groups at 3-digit
    magnitudes — documented headroom at 100 TB). One fragment, valid in
    both Spark SQL and DuckDB.

    The per-row unit recovery is TOTAL (r17): the fixed-point grid guard
    NULLs any value whose scaled form leaves int64 — without it Spark's
    ``floor(DOUBLE)`` (returns BIGINT) silently SATURATES at ±2^63 where
    DuckDB's (returns DOUBLE) overflows the cast, an error-vs-value
    split on ±Inf/NaN/overscale input (the r16 --xval totality class).
    NULL rows then skip through sum while count(col) still counts them —
    identical in both engines; in-domain values are untouched (verified
    cross-engine on ±DBL_MAX, NaN, subnormal, -0.0, 2^63-adjacent and
    in-contract values)."""
    return round_half_up_sql(
        f"CAST(sum({fixed_units_sql(col, '100')}) AS DOUBLE)"
        f" / 100 / count({col})",
        decimals,
    )


def avg_6dec_exact_sql(col: str, decimals: int = 6) -> str:
    """``avg_2dec_exact_sql`` for a 6-decimal-contract DOUBLE column
    (scores/ratios already rounded to 6dp upstream): exact int64 MICRO
    units instead of cents (same total unit recovery)."""
    return round_half_up_sql(
        f"CAST(sum({fixed_units_sql(col, '1e6')}) AS DOUBLE)"
        f" / 1e6 / count({col})",
        decimals,
    )


def fixed_units_sql(col: str, scale: str) -> str:
    """TOTAL half-up fixed-point unit recovery:
    ``CAST(floor(x*scale + 0.5) AS BIGINT)`` guarded to the int64 grid,
    NULL outside it. The guard must precede the floor — Spark's floor
    already saturates — and ``abs(u) < 9.2e18`` evaluates identically in
    both engines for every IEEE shape (NaN compares false in both)."""
    u = f"({col}) * {scale} + 5e-1"
    return f"CASE WHEN abs({u}) < 9.2e18 THEN CAST(floor({u}) AS BIGINT) END"


def avg_exact_int_sql(col: str, decimals: int = 6) -> str:
    """Engine-exact mean of an INTEGER column: the int64 sum is already
    order-free, so only the native-round boundary remains — divide once
    and round with the shared half-up form."""
    return round_half_up_sql(
        f"CAST(sum({col}) AS DOUBLE) / count({col})", decimals
    )


def micro_units_sql(expr: str) -> str:
    """TOTAL int64 micro-unit recovery, identical in both dialects:
    ``TRY_CAST(round(expr * 1e6) AS BIGINT)``.

    ``round(DOUBLE)`` returns DOUBLE in both engines, so the try_cast
    sees the same value; any input whose micros exceed int64 (|x| >~
    9.2e12 — far outside the |x| <= 1e13 measure-domain contract, which
    itself clears the CENTS grid but not the micros grid), ±Inf, or NaN
    yields NULL in BOTH engines instead of Spark CAST_OVERFLOW vs a
    DuckDB conversion error (the r16 --xval sweep's two totality fails:
    polygon_zone_counts, unpivot_tile_metrics). NULL then flows through
    sum/avg with the engine-identical skip semantics the NULL-speedKmh
    contract already defines — an out-of-grid measure is UNKNOWN, not a
    crash. Verified cross-engine on ±DBL_MAX, NaN, subnormal, -0.0, the
    2^63 boundary band, and in-contract values (r17; the floor-based
    CENTS recovery can NOT be made total this way — Spark's floor()
    returns BIGINT and silently saturates at ±2^63 where DuckDB keeps
    DOUBLE, so its guard must precede the floor)."""
    return f"TRY_CAST(round(({expr}) * 1e6) AS BIGINT)"


def micro_units(col):
    """Column form of :func:`micro_units_sql` (Column.try_cast — same
    NULL-on-overflow totality as the SQL fragment, bit-identical
    in-domain)."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 1e6).try_cast("long")


def fixed_units(col, scale: float):
    """Column twin of :func:`fixed_units_sql` — the streaming aggregates
    accumulate the same TOTAL int64 units the batch/oracle fragment
    recovers, so a saturated Spark floor can never enter cross-batch
    state (r17: streaming_tiles carried Long.MIN/1e6 averages on --xval
    corpora while the guarded batch oracle yielded NULL-skipped means)."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    u = c * F.lit(float(scale)) + F.lit(0.5)
    return F.when(F.abs(u) < F.lit(9.2e18), F.floor(u).cast("long"))


def round_half_up(col, decimals: int):
    """Column form of :func:`round_half_up_sql` — identical op sequence
    (multiply, add 0.5, floor, divide), so a Column-built aggregate and
    an SQL oracle produce the same bits. Spark's floor(DOUBLE) returns
    BIGINT where DuckDB keeps DOUBLE; the quotient re-converges to the
    same double because the floored value is integral in both."""
    from pyspark.sql import functions as F

    scale = float(f"1e{decimals}")
    u = col * F.lit(scale) + F.lit(0.5)
    return F.when(F.abs(u) < F.lit(9.2e18), F.floor(u) / F.lit(scale)).otherwise(
        col
    )
