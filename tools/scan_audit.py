#!/usr/bin/env python
"""Static duplicate-scan audit (the r11 sweep, promoted to a tool).

For each registered query, count physical ``Scan parquet`` nodes per
distinct fixture file in the FORMATTED plan. A query whose plan scans
one file N>1 times either (a) has legitimate self-join semantics where
re-scanning is the right call at scale, or (b) re-plans a shared
frontier into several branches — the class fixed with
``lineage.cut_lineage(frontier, eager=False)`` (one materialization,
N cheap readers). The r11 sweep hand-adjudicated (a) vs (b); this tool
makes re-measuring mechanical so the adjudication can be re-checked
whenever a query changes.

Usage: python tools/scan_audit.py [sf_dir] [query ...]
    (no query names -> the full registry, sorted by worst count)
"""

from __future__ import annotations

import contextlib
import io
import re
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402
from real_time_mobility_heatmap_spark.session import get_spark  # noqa: E402


def scan_counts(df) -> Counter:
    """file-basename -> number of ``Scan parquet`` nodes over it."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    c: Counter = Counter()
    for m in re.finditer(r"Scan parquet[^\n]*\n(?:[^\n]*\n)*?Location:[^\n]*?([\w.]+\.parquet|[\w]+)\]?\n", plan):
        c[m.group(1)] += 1
    if not c:
        # fallback: header-only count when Location lines are absent
        c["<scan>"] = len(re.findall(r"Scan parquet", plan))
    return c


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a]
    qs = entry_mod.queries()
    if names:
        unknown = [n for n in names if n not in qs]
        if unknown:
            sys.exit(f"not registered: {unknown}")
    else:
        names = list(qs)
    spark = get_spark()
    rows = []
    for n in names:
        try:
            c = scan_counts(qs[n](spark, sf_dir))
        except Exception as e:  # streaming-only entries etc.
            print(f"{n}: ERR {type(e).__name__}: {e}", file=sys.stderr)
            continue
        worst = max(c.values()) if c else 0
        rows.append((worst, sum(c.values()), n, dict(c)))
    rows.sort(reverse=True)
    for worst, total, n, c in rows:
        print(f"{worst:3d} max  {total:3d} total  {n}  {c}")


if __name__ == "__main__":
    main()
