#!/usr/bin/env python
"""Local stand-in for the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, sorted column names, and order-insensitive values. Use while
iterating; the real gate is the driver's CORRECTNESS_r{N}.json.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
from decimal import Decimal
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402
from real_time_mobility_heatmap_spark.session import get_spark  # noqa: E402
from real_time_mobility_heatmap_spark.sources.tables import TABLES  # noqa: E402


def _norm_cell(v):
    """Canonicalize a cell, staying DTYPE-STRICT between int and float.

    The driver's value-hash distinguishes ``5`` from ``5.0`` (r3 failure mode:
    DuckDB window SUM -> HUGEINT -> pandas float64 vs Spark int64).  Python's
    ``5 == 5.0`` masked that here, so rows are compared by ``repr`` of the
    canonical cells: numpy ints collapse to ``int`` (width drift is invisible
    to the driver's hash), numpy floats to ``float`` WITHOUT integral-value
    coercion, Decimal to float (driver-green queries show it hashes as float).
    """
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return None
    # All timestamp-like cells canonicalize to the naive ISO string: the
    # engines deliver the SAME instant through THREE cell types — DuckDB
    # .df() always yields datetime64[us]/pd.Timestamp (full 1–9999
    # domain), Spark's in-window path yields pd.Timestamp, and Spark's
    # extreme-window fallback (``spark_to_pandas``) yields plain
    # datetime.datetime — and repr() would split them. Timestamp before
    # datetime: it is a subclass.
    if isinstance(v, pd.Timestamp):
        return (v.tz_localize(None) if v.tzinfo else v).isoformat()
    if isinstance(v, dt.datetime):
        return (v.replace(tzinfo=None) if v.tzinfo else v).isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, (float, np.floating)):
        return float(v)
    if isinstance(v, Decimal):
        return float(v)
    return v


def spark_to_pandas(df) -> pd.DataFrame:
    """``toPandas`` with an extreme-timestamp fallback.

    pandas' ns-unit window (~1677–2262) is narrower than both engines'
    timestamp domain: Spark's Arrow→pandas cast raises ``ArrowInvalid``
    on values outside it (year-1 / year-9999 / far-pre-epoch) while
    DuckDB's ``.df()`` delivers them as datetime64[us] — so the GATE
    broke on corpora the engines themselves agree on (SCALE.md r14
    extreme-ts probe). On that failure, re-fetch via the public Arrow
    path with ``timestamp_as_object=True``: Python datetimes are exact
    over the full 1–9999 domain. Exception-gated so every in-window
    query keeps today's byte-identical conversion.
    """
    try:
        return df.toPandas()
    except Exception:
        return df.toArrow().to_pandas(timestamp_as_object=True)


def _canon(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    rows = [
        repr(tuple(_norm_cell(v) for v in row))
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    spark = get_spark("oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = spark_to_pandas(fn(spark, sf_dir))
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        unhashable = [
            c
            for c in sdf.columns
            if sdf[c].map(lambda v: isinstance(v, (list, dict)) or type(v).__name__ == "ndarray").any()
        ]
        if unhashable:
            # the driver's canonicalizer sorts cell values; list/array cells
            # crash it (round-1 failure mode) — fail fast locally
            failures.append(name)
            print(f"FAIL  {name}: array/map-typed output columns {unhashable} "
                  "(driver canonicalizer cannot hash these - serialize with to_json)")
            continue
        if name not in oracles:
            print(f"SKIP  {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        ok = True
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rowcount spark={len(sdf)} duckdb={len(odf)}")
            ok = False
        elif sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL  {name}: columns spark={sorted(sdf.columns)} duckdb={sorted(odf.columns)}")
            ok = False
        else:
            a, b = _canon(sdf), _canon(odf)
            if a != b:
                ok = False
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL  {name}: values differ; first diffs: {diff}")
        if ok:
            print(f"OK    {name} ({len(sdf)} rows)")
        else:
            failures.append(name)

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILED: {failures}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
