"""Engine-exact money aggregation (r11 perturbed-corpus sweep).

``round(sum(DOUBLE), 2)`` over a product like ``l_extendedprice *
(1 - l_discount)`` is NOT cross-engine stable: the per-row doubles are
inexact, the two engines accumulate them in different orders, and when
the mathematically-exact total lands on a half-cent the ulp drift flips
the rounding (observed live on a jittered corpus: Q9's sum_profit
1433933.21 in Spark vs 1433933.22 in DuckDB — the r10
``attribution_report`` class, which the fixtures had simply never made
visible for the other revenue queries).

The money expressions in this engine are all EXACTLY representable in a
small fixed decimal scale (prices are cents, discounts/taxes integer
percent, quantities integral), so the per-row term fix-points to an
exact integer: the double is within an ulp of its integral true value,
so ``floor(x * 1e4 + 0.5)`` recovers the exact unit count identically
in both engines.

Aggregation then has to stay exact at 100 TB. A single int64 unit sum
overflows there (1e11 rows/group x 1e9 units/row > 2^63), and DECIMAL
aggregation — the first formulation — is exact but runs on boxed sum
buffers (Spark's compact-long decimal path does not survive the +10
precision headroom of SUM), measured 2-3x slower than the double sum it
replaced. The shipped form is the SPLIT SUM: each row's unit count is
divided into ``hi = u div 1e6`` and ``lo = u % 1e6`` halves, both
summed as PRIMITIVE int64 (whole-stage-codegen fast path, measured at
parity with the raw double sum), and the exact total is reconstructed
as ``hi * 1e6 + lo`` in DECIMAL only in the per-group final projection
(group-count rows, not corpus rows), where the half-up cents rounding
is exact decimal arithmetic in both engines.

Overflow bounds (documented contract, generous at 100 TB): the lo sum
needs ``n_rows_per_group < 2^63 / 1e6 ~ 9.2e12``; the hi sum needs
``n * (max_units / 1e6) < 2^63`` — with per-row money below $10^5
(units <= 1e9) that is 9.2e15 rows. A 100 TB TPC-H lineitem is ~6e11
rows TOTAL. The per-row div/mod go through doubles (floor(u / 1e6)) —
exact because per-ROW units stay below 2^53; only the SUMS outgrow
doubles, and those are int64.

Every fragment is valid in BOTH Spark SQL and DuckDB — call sites embed
the same string in the DataFrame build (``F.expr``) and the oracle, so
the two sides cannot drift. Requires non-negative per-row values (true
for every money expression here; signed use needs the
``product_type_profit`` int64-e4 form instead, tpch.py:377).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum_sql(expr: str, in_dec: int = 4, out_dec: int = 2) -> str:
    """Exact SUM of a non-negative money expression whose true per-row
    value has ``in_dec`` decimals, rounded half-up to ``out_dec``, as
    DOUBLE. Valid Spark SQL AND DuckDB SQL."""
    u = f"CAST(floor(({expr}) * 1e{in_dec} + 5e-1) AS BIGINT)"
    lo = f"sum(({u}) % 1000000)"
    hi = f"sum(CAST(floor(({u}) / 1e6) AS BIGINT))"
    total = f"(CAST({hi} AS DECIMAL(32,0)) * 1000000 + {lo})"
    scale = f"CAST(1e-{in_dec} AS DECIMAL({in_dec + 1},{in_dec}))"
    # The exact-decimal ROUNDING stays decimal (half-up on the exact
    # total decides cents boundaries exactly), but the final
    # decimal->double conversion goes THROUGH THE UNSCALED INTEGER:
    # CAST(decimal-with-scale AS DOUBLE) is correctly-rounded ONCE in
    # Spark (BigDecimal.doubleValue) but unscaled-int->double THEN a
    # double divide in DuckDB — two roundings — so totals whose unscaled
    # value exceeds 2^53 split in the last ulp (r15 --xval first
    # contact: an 18-row group of ~$1e12 items read ...404.9146 vs
    # ...404.9143; at 100 TB ANY revenue total past ~$9e11 crosses
    # 2^53 e4-units and hits this). Re-scaling to the integer and
    # dividing by the exact power of ten makes BOTH engines do the
    # identical (int -> nearest double) then one shared IEEE division —
    # bit-identical to the old form wherever the unscaled value fits
    # 2^53 (every in-gate corpus), deterministic-shared beyond.
    rounded_units = (
        f"CAST(round({total} * {scale}, {out_dec})"
        f" * CAST(1e{out_dec} AS DECIMAL({out_dec + 1},0)) AS DECIMAL(38,0))"
    )
    return f"(CAST({rounded_units} AS DOUBLE) / 1e{out_dec})"


def money_sum(expr: str, in_dec: int = 4, out_dec: int = 2) -> Column:
    """Spark Column form of :func:`money_sum_sql` (same string, F.expr)."""
    return F.expr(money_sum_sql(expr, in_dec, out_dec))
