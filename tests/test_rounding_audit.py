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


# ---------------------------------------------------------------------------
# r16 (r15 verdict #4): proactive -0.0 audit of every native-round site.
#
# The class trigger (functions/rounding.py round0 docstring): a NEGATIVE
# expression rounding to ZERO at the target scale — Spark's BigDecimal
# round has no -0.0 (emits +0.0) while DuckDB's IEEE scaled round keeps
# the sign, splitting the value hash. Two members were found seed-at-a-
# time (normalize r15, mad_outliers xval@1502); r16 swept ALL native
# round sites instead and converted every negative-capable OUTPUT column
# to round0/round0_sql (cosines, centroid coords, quantizer min, rp
# projections, signed-value percentiles/sums/ewma) — full-registry
# cross-tree hash differential 0-diff on the base corpus (SCALE.md r16).
# This test pins the converted state: every remaining native round(
# site must be (a) canonicalized (round0 / "+ CAST(0.0 AS DOUBLE)"),
# (b) immediately cast to an integer type (ints have no -0.0), or
# (c) adjudicated non-negative / zero-bounded in the allowlist below,
# with the domain reason. A new site fails until classified.
# ---------------------------------------------------------------------------

# (file, regex, reason) — reason documents WHY -0.0 is unreachable
NONNEG_ALLOWED = [
    ("functions/money.py", r"CAST\(round\(\{total\} \* \{scale\}",
     "money totals: in-contract measures are non-negative; exact-int rescale"),
    ("functions/rounding.py", r".", "the shared fragments themselves"),
    ("operators/analytics.py", r"mad|abs\(|F\.abs\(",
     "MAD / absolute deviation >= 0 by construction"),
    ("operators/analytics.py", r"monetary_cents",
     "o_totalprice > 0 in TPC-H domain"),
    ("operators/analytics.py", r"vals\[-1\] > round\(",
     "comparison-only copy: -0.0 == +0.0 in every IEEE compare"),
    ("operators/dedup.py", r'F\.max\("jaccard"\)|max\(jaccard\)',
     "jaccard in [0, 1]"),
    ("operators/flows.py", r"speedKmh|avg_speed",
     "speed >= 0 (measure-domain contract, value_domain_report)"),
    ("operators/flows.py", r"step_mm|dist_m|max_step",
     "euclidean step lengths >= 0"),
    ("operators/latest.py", r"speedKmh", "speed >= 0 (measure domain)"),
    ("operators/relational.py",
     r"l_quantity|l_extendedprice",
     "TPC-H lineitem measures are positive by generator domain"),
    ("operators/science.py", r"sqrt\(", "sqrt >= 0"),
    ("operators/similarity.py", r"rng / QUANT_LEVELS|list_max\(embedding",
     "quantizer scale = range/levels >= 0, floored at 1e-6"),
    ("operators/similarity.py", r"ORDER BY$|^ *round\(list_dot_product\(e\.embedding",
     "ORDER-BY-only dist2 copy: -0.0 sorts equal to +0.0 in both engines"),
    ("operators/similarity.py", r">= \{NEARDUP_COS\}",
     "threshold-comparison-only copy"),
    ("operators/spatial.py", r"speedKmh", "speed >= 0 (measure domain)"),
    ("operators/textops.py", r"tfidf|tf\.tf \* ln\(",
     "tf*idf >= 0: df <= N so ln(N/df) >= 0"),
    ("operators/textops.py", r"bm25|idf \* \(F\.col\(\"tf\"\)|^ *round\($",
     "bm25 >= 0: idf = ln(x + 1) > 0, tf-part > 0"),
    ("operators/textops.py", r"min\(qs\)|max\(qs\)|F\.(min|max)\(\"qs\"\)",
     "quality score in [0, 1]"),
    ("operators/tiles.py", r"speedKmh", "speed >= 0 (measure domain)"),
    ("operators/tpch.py", r"_den|total_revenue",
     "revenue sums of positive extendedprice*(1-disc)"),
    ("operators/tpch.py", r"o_totalprice|sum_qty",
     "TPC-H order/lineitem measures positive"),
    ("operators/tpch.py", r"c_acctbal",
     "q22 sums acctbals filtered > avg of positive balances"),
    ("operators/tpch.py", r"part_value", "part revenue > 0"),
    ("operators/trajectory.py", r"lat0 \+ \(lat1|lon0 \+ \(lon1",
     "interp stays in lat [42,43] / lon [-72,-71]: bounded away from 0"),
    ("operators/windows.py", r"leg", "leg = |dlat|+|dlon| >= 0"),
    ("operators/wire.py", r"l_quantity|l_extendedprice",
     "TPC-H measures positive"),
    ("producers/mobility_producer.py", r"speed_mps \* 3\.6",
     "wire speed >= 0 (producer domain)"),
    ("streaming/neardup.py", r"jaccard", "jaccard in [0, 1]"),
]

_ROUND_SITE = re.compile(r"F\.round\(|(?<![\w_.])round\(")
_INT_CAST = re.compile(r'\.(?:try_)?cast\("(?:long|int)"\)|AS (?:BIGINT|INT)\)')
_CANON = re.compile(r"round0|CAST\(0\.0 AS DOUBLE\)|round_half_up")


def _round_sites():
    """(relpath, lineno, line) for every native-round occurrence outside
    comments and docstrings — token-level, so docstring prose never
    counts and f-string SQL fragments always do.

    On Python >= 3.12 f-strings tokenize as FSTRING_START/MIDDLE/END
    instead of one STRING token (r16 advice: a STRING-only scan would
    silently skip every oracle ``round(`` inside an f-string there, and
    most oracle SQL lives in f-strings); FSTRING_MIDDLE chunks are
    scanned exactly like non-docstring STRING bodies. A non-vacuity
    floor in the classification test fails loudly if a future tokenizer
    change ever drops the count instead of passing with zero sites."""
    import io
    import tokenize

    fstring_middle = getattr(tokenize, "FSTRING_MIDDLE", None)
    out = []
    for py in sorted(PKG.rglob("*.py")):
        rel = str(py.relative_to(PKG))
        src = py.read_text()
        lines = src.splitlines()
        prev = None
        for t in tokenize.generate_tokens(io.StringIO(src).readline):
            if t.type == tokenize.COMMENT:
                continue
            if t.type == tokenize.STRING or t.type == fstring_middle:
                # an FSTRING_MIDDLE is never a docstring
                is_doc = t.type == tokenize.STRING and prev in (
                    tokenize.INDENT, tokenize.DEDENT, tokenize.NEWLINE, None
                )
                if not is_doc:
                    for m in re.finditer(r"(?<![\w_.])round\(", t.string):
                        ln = t.start[0] + t.string[: m.start()].count("\n")
                        out.append((rel, ln, lines[ln - 1]))
            elif t.type == tokenize.NAME and t.string == "round":
                out.append((rel, t.start[0], lines[t.start[0] - 1]))
            if t.type != tokenize.NL:
                prev = t.type
        # dedupe per line
    return sorted(set(out))


def test_every_native_round_site_is_classified():
    offenders = []
    by_file: dict = {}
    sites = _round_sites()
    # non-vacuity floor (r16 advice): 3.11 finds ~143 sites; a tokenizer
    # change that silently drops f-string coverage must fail here, not
    # pass with zero sites audited
    assert len(sites) >= 100, (
        f"only {len(sites)} native-round sites found — the scanner lost "
        "coverage (f-string tokenization change?)"
    )
    for rel, ln, line in sites:
        window = by_file.setdefault(rel, (PKG / rel).read_text().splitlines())
        ctx = "\n".join(window[ln - 1 : ln + 9])
        if _CANON.search(ctx):
            continue  # canonicalized (round0 family) within the site window
        if _INT_CAST.search(ctx):
            continue  # integer result: no -0.0
        if any(
            rel == f and (re.search(rx, line) or re.search(rx, ctx, re.M))
            for f, rx, _ in NONNEG_ALLOWED
        ):
            continue
        offenders.append(f"{rel}:{ln}: {line.strip()[:100]}")
    assert not offenders, (
        "native round( site neither canonicalized (round0/round0_sql), "
        "integer-cast, nor adjudicated non-negative in NONNEG_ALLOWED — "
        "a negative expression rounding to zero splits Spark (+0.0, "
        "BigDecimal) from DuckDB (-0.0, IEEE):\n" + "\n".join(offenders)
    )


def test_round_site_allowlist_is_not_stale():
    """Every NONNEG_ALLOWED entry must still match at least one live
    site, or it is dead weight that could silently exempt future code."""
    sites = _round_sites()
    by_file: dict = {}
    dead = []
    for f, rx, reason in NONNEG_ALLOWED:
        if f == "functions/rounding.py":
            continue  # blanket entry for the fragment module
        hit = False
        for rel, ln, line in sites:
            if rel != f:
                continue
            window = by_file.setdefault(rel, (PKG / rel).read_text().splitlines())
            ctx = "\n".join(window[ln - 1 : ln + 9])
            if re.search(rx, line) or re.search(rx, ctx, re.M):
                hit = True
                break
        if not hit:
            dead.append(f"{f} :: {rx}")
    assert not dead, "stale allowlist entries:\n" + "\n".join(dead)


# ---------------------------------------------------------------------------
# r17: floor-based fixed-point unit recovery audit.
#
# The --xval totality class (SCALE.md r17) showed Spark's floor(DOUBLE)
# returns BIGINT and silently SATURATES at +-2^63 (NaN -> 0) while
# DuckDB's stays DOUBLE and errors on the cast — so every floor-based
# unit-recovery site over a MEASURE-domain column must go through the
# guarded shared fragments (functions/rounding.fixed_units[_sql]). This
# audit greps the package for raw `floor(x * scale + 0.5)` spellings; a
# new site fails until it is converted or allowlisted with the domain
# argument that bounds its input away from the int64 grid edge.
# ---------------------------------------------------------------------------

_FLOOR_UNIT = re.compile(
    # greedy within the line: the scaled expression may carry nested
    # parens (ln(CAST(sum(c) AS DOUBLE)) * 1000000 + 5e-1)
    r"floor\(.*\*\s*(?:100|1e6|1e8|1000000)\b.*(?:\+\s*5e-1|\+\s*0\.5|F\.lit\(0\.5\))"
)

# (file, line-regex, reason-the-input-is-bounded)
FLOOR_UNIT_ALLOWED = [
    ("operators/relational.py", r"l_extendedprice|l_discount",
     "TPC-H money columns: per-row money < $1e5 by the money.py domain "
     "contract (cents < 1e7, 11 orders under the grid edge)"),
    ("operators/science.py", r"ln\(CAST\(sum\(c\) AS DOUBLE\)\)|ln\(CAST\(c AS DOUBLE\)\)|count\(\*\) \* ln\(",
     "ln-of-count and c*ln(c): c is a group COUNT >= 1, so the scaled "
     "value is <= ~n*42e6 — int64-sum-bounded for any corpus that fits "
     "in storage"),
]


def test_every_floor_unit_site_is_guarded_or_bounded():
    offenders = []
    n_sites = 0
    for py in sorted(PKG.rglob("*.py")):
        rel = str(py.relative_to(PKG))
        if rel == "functions/rounding.py":
            continue  # the shared fragments themselves (guard + docs)
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if not _FLOOR_UNIT.search(line) or COMMENT.match(line):
                continue
            n_sites += 1
            if "abs(" in line:  # inline-guarded (fixed_units_sql output)
                continue
            if any(
                rel == f and re.search(rx, line)
                for f, rx, _ in FLOOR_UNIT_ALLOWED
            ):
                continue
            offenders.append(f"{rel}:{i}: {line.strip()[:100]}")
    assert not offenders, (
        "raw floor-unit recovery over a measure-domain column — Spark "
        "saturates where DuckDB errors; convert to functions/rounding."
        "fixed_units[_sql] or allowlist with a boundedness argument:\n"
        + "\n".join(offenders)
    )
    # non-vacuity: the allowlisted residue itself must still exist
    assert n_sites >= 4, f"floor-unit scanner lost coverage ({n_sites})"


def test_floor_unit_allowlist_is_not_stale():
    live = []
    for py in sorted(PKG.rglob("*.py")):
        rel = str(py.relative_to(PKG))
        for line in py.read_text().splitlines():
            if _FLOOR_UNIT.search(line) and not COMMENT.match(line):
                live.append((rel, line))
    dead = [
        f"{f} :: {rx}"
        for f, rx, _ in FLOOR_UNIT_ALLOWED
        if not any(rel == f and re.search(rx, line) for rel, line in live)
    ]
    assert not dead, "stale FLOOR_UNIT_ALLOWED entries:\n" + "\n".join(dead)
