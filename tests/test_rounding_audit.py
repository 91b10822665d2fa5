"""Static audit of the native-round exact-ratio class (r12).

``round(avg(DOUBLE), d)`` is the double divergence surface the r11/r12
perturbed-corpus work eliminated: the double sum inside ``avg``
accumulates in engine/partition-specific order, and the native ``round``
rounds a boundary-capable rational differently in Spark (shortest-repr
BigDecimal HALF_UP) vs DuckDB (float-domain). Every converted site now
goes through the shared fragments in ``functions/rounding.py``
(``avg_2dec_exact_sql`` / ``avg_6dec_exact_sql`` / ``avg_exact_int_sql``
/ ``round_half_up``); this test greps the package so a NEW ``F.round(F.
avg(...))`` or ``round(avg(...))`` site cannot land silently.

The single allowed residue is the centroid-mean family
(``kmeans_update`` / ``embedding_drift_report``): those average
arbitrary float32-derived components, where a fix-point would change
the trained values and an ordered fold would collect per-group member
arrays. Since r13 the residue is a documented CONTRACT, not a hope:
``tools/centroid_margin.py`` proves per corpus (exact rational
arithmetic) that every group mean sits orders of magnitude further
from a rounding boundary than any summation order can move it — see
the margin tests below; the standing sweep runs the same scan on each
fresh-seed perturbed corpus. Adding a line here requires the same
adjudication.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "real_time_mobility_heatmap_spark"

# (filename, line-content-regex) pairs adjudicated as acceptable residue
ALLOWED = [
    ("operators/similarity.py", r'F\.round\(F\.avg\("v"\), ROUND_COS\)'),
    ("operators/similarity.py", r"round\(avg\(e\.embedding\[d\.pos \+ 1\]::DOUBLE\), \{ROUND_COS\}\)"),
    ("operators/similarity.py", r"round\(avg\(v\), \{ROUND_COS\}\)"),
    ("functions/rounding.py", r"``round\(avg\(DOUBLE\), d\)``"),  # docstring
]

PATTERN = re.compile(r"F\.round\(F\.avg\(|round\(avg\(")
COMMENT = re.compile(r"^\s*#")


def test_no_new_native_round_of_avg_sites():
    offenders = []
    for py in sorted(PKG.rglob("*.py")):
        rel = str(py.relative_to(PKG))
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if not PATTERN.search(line) or COMMENT.match(line):
                continue
            if any(
                rel == f and re.search(rx, line) for f, rx in ALLOWED
            ):
                continue
            offenders.append(f"{rel}:{i}: {line.strip()}")
    assert not offenders, (
        "native round(avg(...)) outside the shared engine-exact fragments "
        "(see functions/rounding.py; adjudicate + allowlist or convert):\n"
        + "\n".join(offenders)
    )


# ---------------------------------------------------------------------------
# Boundary-margin proof for the allowlisted residue (r13, closing the r12
# verdict's deferral): instead of waiting for a sweep seed to land a group
# mean on a round() boundary, tools/centroid_margin.py computes — with exact
# rational arithmetic — every centroid-mean group's distance to its nearest
# rounding boundary and a worst-case ANY-ORDER double summation error bound.
# distance >> bound means no accumulation order in either engine can flip
# the rounded value on this corpus: the residue is proved safe per corpus
# (the standing sweep runs the same scan on each fresh-seed perturbed
# corpus; see SCALE.md).


def test_centroid_mean_margins_dominate_order_error():
    import sys

    sys.path.insert(0, str(PKG.parent / "tools"))
    from centroid_margin import SAFETY, scan_corpus

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rep = scan_corpus(sf_dir)
        assert rep["groups"] > 0
        assert not rep["violations"], (
            f"{sf_dir}: centroid-mean group(s) within {SAFETY}x of a "
            f"rounding boundary — the allowlisted native round(avg) can "
            f"hash-flip here: {rep['violations'][:5]}"
        )
        # the fixtures sit ORDERS OF MAGNITUDE clear, not marginally so
        assert rep["min_ratio"] > 1e3, rep


def test_centroid_margin_detector_flags_boundary_straddler():
    """The scanner is not vacuous: a group whose exact mean sits within
    the double error bound of a rounding boundary must be flagged."""
    import sys

    sys.path.insert(0, str(PKG.parent / "tools"))
    from centroid_margin import SAFETY, group_margin

    # single member = the double nearest the 0.0000005 boundary: distance
    # is the double representation gap (~1e-23), bound the division ulp
    vals = [5e-07]
    dist, bound = group_margin(vals)
    assert bound > 0 and dist < SAFETY * bound

    # and a clearly-safe group is not flagged
    dist, bound = group_margin([0.25, 0.75, 0.125])
    assert dist > SAFETY * bound


def test_pandas_round_matches_engine_half_away_on_exact_boundaries():
    """The r14 ties sweep (seed 1410) caught the mapInPandas resample
    path flipping one ulp against the oracle on values landing EXACTLY
    on the scaled .5 boundary (-71.6828125 -> np.round said ...812
    half-EVEN, DuckDB round and Spark F.round say ...813 half-AWAY).
    _round_half_away must match the engines' convention on exact
    boundaries — and np.round must demonstrably differ there, or this
    pin is vacuous."""
    import duckdb
    import numpy as np

    from real_time_mobility_heatmap_spark.operators.trajectory import (
        _round_half_away,
    )

    boundary = np.array([-71.6828125, -71.3265625, 71.6828125, 2.5e-6])
    plain = np.array([-71.898118, 0.1234564999, 42.0000005])
    con = duckdb.connect()
    for v in np.concatenate([boundary, plain]):
        duck = con.execute("SELECT round(?::DOUBLE, 6)", [float(v)]).fetchone()[0]
        assert float(_round_half_away(np.array([v]))[0]) == duck, v
    # non-vacuity: half-even disagrees on the caught values
    assert float(np.round(np.array([-71.6828125]), 6)[0]) == -71.682812
    assert float(_round_half_away(np.array([-71.6828125]))[0]) == -71.682813
