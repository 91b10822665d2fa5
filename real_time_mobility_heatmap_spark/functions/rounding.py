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
    scale = f"1e{decimals}"
    return f"(floor(({expr}) * {scale} + 5e-1) / {scale})"


def round_half_up(col, decimals: int):
    """Column form of :func:`round_half_up_sql` — identical op sequence
    (multiply, add 0.5, floor, divide), so a Column-built aggregate and
    an SQL oracle produce the same bits. Spark's floor(DOUBLE) returns
    BIGINT where DuckDB keeps DOUBLE; the quotient re-converges to the
    same double because the floored value is integral in both."""
    from pyspark.sql import functions as F

    scale = float(f"1e{decimals}")
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)
