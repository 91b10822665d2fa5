"""Engine-exact money aggregation (r11 perturbed-corpus sweep).

``round(sum(DOUBLE), 2)`` over a product like ``l_extendedprice *
(1 - l_discount)`` is NOT cross-engine stable: the per-row doubles are
inexact, the two engines accumulate them in different orders, and when
the mathematically-exact total lands on a half-cent the ulp drift flips
the rounding (observed live on a jittered corpus: Q9's sum_profit
1433933.21 in Spark vs 1433933.22 in DuckDB — the r10
``attribution_report`` class, which the fixtures had simply never made
visible for the other revenue queries).

The money expressions in this engine are all EXACTLY representable in
a small fixed decimal scale (prices are cents, discounts/taxes integer
percent, quantities integral), so the discipline is: cast each per-row
term to ``DECIMAL(30, s)`` — recovering the exact value, since the
double is within an ulp of it — and let the engines sum decimals.
Decimal aggregation is exact integer arithmetic underneath: associative
and order-free, so both engines produce the IDENTICAL exact total, and
``round(DECIMAL, 2)`` is exact half-up in both (verified on a
manufactured half-cent boundary). ``DECIMAL(30, s)`` leaves 10^24
headroom above any per-row money value — a 100 TB-scale global sum
stays far from the 38-digit aggregate ceiling, where the int64
micro-unit pattern (lm_score etc.) would overflow for corpus-scale
totals of large per-row amounts.

Spark side / oracle side are the same shape; keep in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(expr: Column, in_dec: int = 4, out_dec: int = 2) -> Column:
    """Exact SUM of a money expression whose true per-row value has
    ``in_dec`` decimals, rounded half-up to ``out_dec``, as DOUBLE."""
    return (
        F.round(F.sum(expr.cast(f"decimal(30,{in_dec})")), out_dec)
        .cast("double")
    )


def money_sum_sql(expr: str, in_dec: int = 4, out_dec: int = 2) -> str:
    """DuckDB twin of :func:`money_sum` (also valid Spark SQL)."""
    return (
        f"CAST(round(sum(CAST({expr} AS DECIMAL(30,{in_dec}))), {out_dec})"
        " AS DOUBLE)"
    )
