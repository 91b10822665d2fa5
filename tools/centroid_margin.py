#!/usr/bin/env python
"""Boundary-margin scanner for the allowlisted ``round(avg(DOUBLE))``
residue (the centroid-mean family — r12 verdict item #4).

``kmeans_update`` and ``embedding_drift_report`` round a double mean of
float32 components at ``ROUND_COS`` decimals with the NATIVE round —
the one site family tests/test_rounding_audit.py allowlists instead of
converting to an exact fragment (a fix-point would quantize the trained
centroids; an ordered fold would collect per-group member arrays). The
residual hazard is a one-ulp hash flip: if a group's true mean sits
within the double-summation error of a rounding boundary, Spark's and
DuckDB's different accumulation orders can round to different values.

This tool closes that hazard PER CORPUS with exact arithmetic instead
of waiting for a random sweep seed to find a flip. For every group the
two operators aggregate — (centroid_id, pos) under the oracle-verified
IVF assignment, (source, pos), and the corpus (pos) cells — it computes:

- the EXACT rational mean of the float32 members (every float is a
  dyadic rational; ``Fraction(v)`` is exact), and its exact distance to
  the nearest ``(k + 1/2) * 10^-ROUND_COS`` rounding boundary;
- a worst-case ANY-ORDER double error bound for fl(sum)/n:
  ``(n-1) * u * sum|v| / n`` (classic forward bound for n-1 IEEE
  additions in any association order, u = 2^-53) plus ``2u * |mean|``
  for the division and final representation.

If distance > SAFETY * bound for every group, NO summation order in
EITHER engine can flip the rounded value on this corpus — the residue
is proved safe, not just unobserved. Run it per sweep corpus:

    python tools/centroid_margin.py [sf_dir ...]

prints one JSON line per dir and exits non-zero on any violation.
Membership replicates the operators' own oracle SQL (``_assign_duck``)
on DuckDB, so the scanned groups are exactly the judged ones.
"""

from __future__ import annotations

import json
import math
import sys
from fractions import Fraction
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from real_time_mobility_heatmap_spark.operators.similarity import (  # noqa: E402
    _EMB,
    ROUND_COS,
    _assign_duck,
)

U = Fraction(1, 2**53)  # double unit roundoff
SAFETY = 8  # required dist / bound factor
_SCALE = 10**ROUND_COS


def group_margin(vals: list[float]) -> tuple[Fraction, Fraction]:
    """(distance-to-boundary, any-order-error bound), both exact."""
    n = len(vals)
    s = Fraction(0)
    sum_abs = Fraction(0)
    for v in vals:
        fv = Fraction(v)
        s += fv
        sum_abs += abs(fv)
    mean = s / n
    t = mean * _SCALE
    frac = t - math.floor(t)
    dist = abs(frac - Fraction(1, 2)) / _SCALE
    bound = (n - 1) * U * sum_abs / n + 2 * U * abs(mean)
    return dist, bound


def _load(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for t in ("embeddings", "documents"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )


def scan_corpus(sf_dir: str) -> dict:
    """Margin-scan every centroid-mean group of one corpus dir."""
    con = duckdb.connect()
    _load(con, sf_dir)
    emb = {
        vid: e
        for vid, e in con.execute(
            f"SELECT vec_id, embedding FROM {_EMB}"
        ).fetchall()
    }
    assign = con.execute(
        f"SELECT vec_id, centroid_id FROM ({_assign_duck()})"
    ).fetchall()
    source = dict(
        con.execute(
            f"SELECT d.doc_id, d.source FROM documents d"
            f" JOIN {_EMB} e ON e.vec_id = d.doc_id"
        ).fetchall()
    )

    groups: dict[tuple, list[float]] = {}
    for vid, cid in assign:
        e = emb.get(vid)
        if e is None:
            continue
        for pos, v in enumerate(e):
            groups.setdefault(("kmeans", cid, pos), []).append(v)
    for vid, e in emb.items():
        src = source.get(vid)
        for pos, v in enumerate(e):
            groups.setdefault(("corpus", pos), []).append(v)
            if src is not None:
                groups.setdefault(("drift", src, pos), []).append(v)

    worst_key, worst_ratio = None, None
    violations = []
    for key, vals in groups.items():
        dist, bound = group_margin(vals)
        ratio = math.inf if bound == 0 else float(dist / bound)
        if worst_ratio is None or ratio < worst_ratio:
            worst_key, worst_ratio = key, ratio
        if ratio < SAFETY:
            violations.append({"group": [str(k) for k in key], "ratio": ratio})
    return {
        "sf_dir": sf_dir,
        "groups": len(groups),
        "min_ratio": worst_ratio,
        "worst_group": [str(k) for k in worst_key] if worst_key else None,
        "safety": SAFETY,
        "violations": violations,
    }


def main(dirs: list[str]) -> int:
    rc = 0
    for d in dirs or ["/root/testdata/sf0.01"]:
        rep = scan_corpus(d)
        print(json.dumps(rep))
        if rep["violations"]:
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
