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
the trained values; they need a mantissa-exact treatment (named r12+
deferral, SCALE.md). Adding a line here requires the same adjudication.
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
