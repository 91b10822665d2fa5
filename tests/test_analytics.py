"""Semantics tests for the event-analytics family (operators/analytics.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_mobility_heatmap_spark.operators import analytics
from real_time_mobility_heatmap_spark.sources.tables import load_table


def test_cohort_retention_invariants(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = analytics.cohort_retention(events).collect()
    assert out, "no cohorts"
    by_cohort = {}
    for r in out:
        by_cohort.setdefault(r.cohort_epoch, {})[r.week_offset] = r
    total_week0 = 0
    for cohort, rows in by_cohort.items():
        assert 0 in rows, "every cohort must have its offset-0 row"
        size = rows[0].n_active
        total_week0 += size
        assert rows[0].retention_ppm == 1_000_000
        for off, r in rows.items():
            assert off >= 0
            assert 0 < r.n_active <= size
            assert r.retention_ppm == r.n_active * 1_000_000 // size
    n_users = events.select("user_id").distinct().count()
    assert total_week0 == n_users, "cohorts must partition the user base"


def test_markov_transitions_rows_and_ppm(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = analytics.markov_transitions(events).collect()
    types = {r.event_type for r in events.select("event_type").distinct().collect()}
    assert {r.prev_type for r in out} <= types
    assert {r.next_type for r in out} <= types
    # transition count conservation: every event except each user's first
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    assert sum(r.n_transitions for r in out) == n_events - n_users
    # per-source ppm rows sum to <= 1e6 (integer floor division)
    per_prev = {}
    for r in out:
        per_prev.setdefault(r.prev_type, []).append(r.prob_ppm)
    for prev, ppms in per_prev.items():
        assert 1_000_000 - len(ppms) < sum(ppms) <= 1_000_000


def test_zscore_outliers_rate_and_symmetry(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = analytics.zscore_outliers(events)
    n = events.count()
    assert out.count() == n
    flagged = out.filter("is_outlier").count()
    # Chebyshev bound: at most 1/4 of rows can sit beyond 2 sigma
    assert flagged <= n / 4
    # z-scores recenter: per-type mean of z is ~0
    means = (
        out.groupBy("event_type").agg(F.avg("zscore").alias("m")).collect()
    )
    for r in means:
        assert abs(r.m) < 1e-3
