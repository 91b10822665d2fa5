"""Fail-fast guards for time-spine densification.

The r15 extreme-timestamp axis (--xts) found on first contact that the
engine's calendar/grid operators — resample, gap-fill, daily spines,
stay-bucket explosion — densify ``sequence(min, max, step)`` over an
entity's OBSERVED time span. That span is an implicit precondition: one
out-of-domain timestamp (a year-9924 or year-92 value from a corrupted
feed) stretches it to ~10^7–10^8 steps per entity and the job dies by
OOM, not by diagnosis. At 100 TB that is one poisoned row OOMing a
1000-executor stage.

Posture (mirrors the PK-uniqueness ingestion contract,
sources/tables.py): event-time sanity is an ingestion-contract
precondition, but its spine consumers FAIL FAST with a named diagnostic
instead of densifying an unbounded grid — ``raise_error`` inside the
spine expression, so the guard is row-local, costs one comparison, and
needs no extra pass or job. ``MAX_SPINE_STEPS`` bounds steps PER ENTITY
(the explode multiplies it by the entity count); 200k steps is ~22
years hourly / ~137 years at 6 h / ~547 years daily — generous for any
real analytics window, 4 orders of magnitude under the blowup.

The DuckDB oracles carry no guard: the gate compares engines on
in-domain corpora, and on out-of-domain ones the Spark side now reports
a contract violation instead of matching an equally-blown-up oracle.
"""

from __future__ import annotations

MAX_SPINE_STEPS = 200_000

# Densification event-time DOMAIN (r17): the six spine consumers fail
# fast on any input timestamp outside [SPINE_TS_MIN, SPINE_TS_MAX) —
# checked row-locally at the operator INPUT (operators/validate.py
# require_ts_domain), so the trip is a function of the corpus's CONTENT,
# not of whether a particular entity's spine happened to materialize
# past MAX_SPINE_STEPS (r16 dupkeys+xts seed 1616: co_dwell_pairs' span
# guard did not trip because no extreme-ts STAY formed — seed-dependent
# membership the r16 verdict asked to make deterministic). The batch
# surface at large keeps the full year 1-9999 domain; only operators
# that DENSIFY time carry this bound, chosen to admit any plausible
# historical/forecast window while excluding the corrupted-feed years
# (92, 9924) the --xts axis manufactures. The per-entity span guards
# below REMAIN as the backstop for in-domain-but-enormous spans (200
# in-domain years hourly is still ~1.75M steps).
SPINE_TS_MIN = "1900-01-01 00:00:00"
SPINE_TS_MAX = "2100-01-01 00:00:00"


def spine_guard_sql(lo: str, hi: str, step: str, op: str) -> str:
    """SQL fragment: ``sequence(lo, hi, step)`` over int64s (epoch
    seconds / bucket ids / micros), guarded to ``MAX_SPINE_STEPS``."""
    steps = f"(({hi}) - ({lo})) div ({step})"
    return (
        f"CASE WHEN {steps} > {MAX_SPINE_STEPS} THEN raise_error(concat("
        f"'{op}: time-spine span of ', CAST({steps} AS STRING), "
        f"' steps exceeds MAX_SPINE_STEPS={MAX_SPINE_STEPS}; an "
        f"out-of-domain event timestamp violates the event-time "
        f"ingestion contract (functions/guards.py) - validate or filter "
        f"the feed')) "
        f"ELSE sequence({lo}, {hi}, {step}) END"
    )


def spine_guard_days_sql(d0: str, d1: str, op: str) -> str:
    """Same guard for a daily timestamp spine (interval step)."""
    steps = f"datediff({d1}, {d0})"
    return (
        f"CASE WHEN {steps} > {MAX_SPINE_STEPS} THEN raise_error(concat("
        f"'{op}: daily spine of ', CAST({steps} AS STRING), "
        f"' steps exceeds MAX_SPINE_STEPS={MAX_SPINE_STEPS}; an "
        f"out-of-domain event timestamp violates the event-time "
        f"ingestion contract (functions/guards.py) - validate or filter "
        f"the feed')) "
        f"ELSE sequence({d0}, {d1}, interval 1 day) END"
    )
