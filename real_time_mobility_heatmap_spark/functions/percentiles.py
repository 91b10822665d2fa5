"""Distributed exact ``percentile_disc`` — the scale-safe twin of the
built-in (r8 verdict item #3).

Spark's exact percentile aggregates (``percentile``, ``percentile_disc``)
accumulate a per-group ``value -> count`` map inside ONE aggregation
buffer, so a group whose distinct-value cardinality is corpus-scale
(continuous doubles at 100 TB) is an executor OOM — the buffer can
neither spill nor split across tasks. This module computes the same
statistic as relational dataflow instead:

1. ``groupBy(keys, col).count()`` — map-side partial aggregation; the
   shuffled relation is one row per DISTINCT (group, value) pair, never
   one per input row.
2. a running ``sum(count)`` window ordered by value within each group —
   WindowExec sorts and SPILLS its partition, so a group whose distinct
   values exceed memory degrades to disk instead of OOM.
3. ``percentile_disc(p)`` = the smallest value whose running count
   reaches ``ceil(p * n)`` — one ``min(when(...))`` per requested p,
   all sharing the single pass.

Memory is bounded by distinct values per group (hash-agg, spillable) and
the per-group window sort is disk-backed; contrast with the built-in,
whose map must FIT. For genuinely continuous data where even the
distinct relation is corpus-scale, the right tool is a bounded histogram
(``textops.quality_decile_report``) or ``approxQuantile`` — this helper
is for when the result must be EXACT and engine-reproducible.

Exactness caveat, stated as the code contract: ``p * n`` is computed in
IEEE double, so ``p`` must be a dyadic rational (k/2^m — 0.5, 0.25,
i/8...) for the ceil to be exact at any n < 2^53. Every call site in
this repo uses dyadic p; ``tests/test_analytics.py`` pins equivalence
with the built-in ``percentile_disc`` on real data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def percentile_disc_exact(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    ps: Sequence[float],
    aliases: Sequence[str],
) -> DataFrame:
    """Exact discrete percentiles of ``col`` per ``keys`` group (global
    when ``keys`` is empty), one output column per (p, alias) pair.
    NULL values are ignored, matching the built-in."""
    if len(ps) != len(aliases):
        raise ValueError("ps and aliases must pair up")
    for p in ps:
        if not 0.0 < p <= 1.0:
            raise ValueError(f"percentile out of range: {p}")
    kcols = list(keys)
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(*kcols, col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w_cum = Window.partitionBy(*kcols).orderBy(F.asc(col))
    w_all = Window.partitionBy(*kcols)
    staged = counts.select(
        *kcols,
        F.col(col),
        F.sum("_c").over(w_cum).alias("_cum"),
        F.sum("_c").over(w_all).alias("_n"),
    )
    aggs = [
        F.min(
            F.when(F.col("_cum") >= F.ceil(F.lit(p) * F.col("_n")), F.col(col))
        ).alias(alias)
        for p, alias in zip(ps, aliases)
    ]
    return staged.groupBy(*kcols).agg(*aggs) if kcols else staged.agg(*aggs)
