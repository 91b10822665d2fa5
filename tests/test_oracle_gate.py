"""Regression tests for the local correctness gate (tools/check_oracles.py).

Round-3 post-mortem: two oracles (`vehicle_trips`, `pack_sequences`) computed a
window ``SUM`` of integers, which DuckDB returns as HUGEINT and pandas renders
as float64.  The driver's value-hash distinguishes ``5`` from ``5.0`` and
flagged both red — but the local gate compared with Python ``==`` (where
``5 == 5.0``) and stayed green.  These tests pin (a) that the gate is now
dtype-strict, and (b) that the two oracles now produce integral dtypes.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.check_oracles import _canon  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_canon_distinguishes_int_from_float():
    ints = pd.DataFrame({"k": ["a", "b"], "v": pd.array([5, 7], dtype="int64")})
    floats = pd.DataFrame({"k": ["a", "b"], "v": pd.array([5.0, 7.0], dtype="float64")})
    assert _canon(ints) != _canon(floats)
    # identical dtypes still match, order-insensitively
    assert _canon(ints) == _canon(ints.iloc[::-1])


def test_canon_collapses_int_width_but_not_kind():
    i32 = pd.DataFrame({"v": pd.array([5], dtype="int32")})
    i64 = pd.DataFrame({"v": pd.array([5], dtype="int64")})
    assert _canon(i32) == _canon(i64)


def test_canon_null_and_nan_are_equal():
    a = pd.DataFrame({"v": pd.array([None], dtype="float64")})
    b = pd.DataFrame({"v": pd.array([float("nan")], dtype="float64")})
    assert _canon(a) == _canon(b)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_vehicle_trips_oracle_emits_int64_trip_no(duck):
    from real_time_mobility_heatmap_spark.operators.windows import VEHICLE_TRIPS_ORACLE

    df = duck.sql(f"SELECT * FROM ({VEHICLE_TRIPS_ORACLE}) LIMIT 100").df()
    assert df["trip_no"].dtype.kind == "i", df.dtypes


def test_pack_sequences_oracle_emits_int64_offsets(duck):
    from real_time_mobility_heatmap_spark.operators.textops import PACK_SEQUENCES_ORACLE

    df = duck.sql(f"SELECT * FROM ({PACK_SEQUENCES_ORACLE}) LIMIT 100").df()
    for col in ("tok_start", "first_pack", "last_pack", "pack_offset", "n_tokens"):
        assert df[col].dtype.kind == "i", (col, df.dtypes)


def test_gate_flags_the_prefix_hugeint_shape(duck):
    """The exact r3 failure: uncast window SUM -> float64 must NOT pass _canon."""
    cast = duck.sql(
        "SELECT CAST(sum(v) OVER (ORDER BY v) AS BIGINT) AS s FROM (VALUES (1), (2)) t(v)"
    ).df()
    uncast = duck.sql(
        "SELECT sum(v) OVER (ORDER BY v) AS s FROM (VALUES (1), (2)) t(v)"
    ).df()
    assert uncast["s"].dtype.kind == "f"  # HUGEINT lands as float64 in pandas
    assert _canon(cast) != _canon(uncast)


def test_registry_contract_window_and_oracle_pairing():
    """The driver verifies the FIRST 50 queries() entries and hashes by
    column name: pin the contract — at least 50 entries, every oracle key
    registered, rows-only queries an explicit known set, and no duplicate
    stomping (dict literal silently keeps the last duplicate key, which
    would shrink the registry unnoticed)."""
    import ast
    import pathlib

    import __spark_entry__ as m

    qs = m.queries()
    oracles = m.oracle_sql()
    assert len(qs) >= 50, "driver window needs 50 entries"
    assert set(oracles) <= set(qs), "oracle without a registered query"
    rows_only = {k for k in qs if k not in oracles}
    assert rows_only == set(), (
        f"unexpected rows-only queries: {rows_only} — every registry entry "
        "must be hash-checkable (sketch ops register accuracy-report forms)"
    )

    # parse the source: duplicate dict keys never reach the runtime dict
    src = pathlib.Path(m.__file__).read_text()
    tree = ast.parse(src)
    fn = next(
        n for n in ast.walk(tree)
        if isinstance(n, ast.FunctionDef) and n.name == "queries"
    )
    ret = next(n for n in ast.walk(fn) if isinstance(n, ast.Return))
    keys = [k.value for k in ret.value.keys if isinstance(k, ast.Constant)]
    assert len(keys) == len(set(keys)), (
        f"duplicate registry keys: {[k for k in keys if keys.count(k) > 1]}"
    )
    assert len(keys) == len(qs)
