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

Global-percentile caveat (r9 advice #3): with ``keys`` empty both
windows are ``Window.partitionBy()`` — every distinct value funnels
through ONE task. Disk-backed (no OOM), but a single-task bottleneck
for a genuinely high-cardinality global column; callers wanting a
global percentile over corpus-scale distinct values should bound
cardinality first (bucketize) or use ``approxQuantile``. The
``range_partition_plan`` call site is fine: ``n_chars`` cardinality is
bounded by document length.
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

    NULL handling matches the built-in exactly (r9 advice #1): NULL
    values are ignored within a group, and a group whose values are ALL
    NULL still emits its row with NULL percentiles. Implemented without
    an extra keys-distinct pass: the distinct-pair aggregate KEEPS the
    null-value row but gives it zero cumulative weight (nulls sort first
    under ``asc``, so non-null running sums are unaffected), and
    ``min(when(...))`` skips the null candidate — so an all-null group
    survives as one zero-weight row that yields NULL.

    ``p`` may be any dyadic rational in [0, 1]; ``p=0`` returns the
    group minimum, same as the built-in ``percentile_disc(0)``
    (``cum >= ceil(0) = 0`` first matches the smallest value).
    """
    if len(ps) != len(aliases):
        raise ValueError("ps and aliases must pair up")
    for p in ps:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percentile out of range: {p}")
    kcols = list(keys)
    counts = df.groupBy(*kcols, col).agg(
        # zero weight for the null-value row: it preserves its group in
        # the output without contributing to n or the running sum
        F.count(col).alias("_c")
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
