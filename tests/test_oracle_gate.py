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


def test_canon_unifies_timestamp_cell_types_across_the_full_domain():
    """The r15 extreme-ts harness fix: the same instant arrives as
    pd.Timestamp (DuckDB .df(), datetime64[us] over the full 1–9999
    domain; Spark's in-window path) or plain datetime.datetime (Spark's
    ``spark_to_pandas`` out-of-window fallback) and must canonicalize
    identically — including year-9999/year-1 values pandas' ns unit
    cannot represent, and NaT ≡ None for NULLs."""
    import datetime as dt

    extreme = [dt.datetime(9999, 12, 31, 23, 59, 59), dt.datetime(1, 1, 2, 3, 4, 5)]
    as_dt = pd.DataFrame({"v": pd.Series(extreme, dtype="object")})
    as_ts = pd.DataFrame({"v": pd.Series(extreme, dtype="datetime64[us]")})
    assert _canon(as_dt) == _canon(as_ts)
    nat = pd.DataFrame({"v": pd.Series([pd.NaT], dtype="datetime64[us]")})
    none = pd.DataFrame({"v": pd.Series([None], dtype="object")})
    assert _canon(nat) == _canon(none)
    # tz-aware strips to the wall-clock instant on both cell types
    aware_ts = pd.DataFrame(
        {"v": pd.Series([pd.Timestamp("2024-03-01 12:00:00", tz="UTC")])}
    )
    naive_ts = pd.DataFrame({"v": pd.Series([pd.Timestamp("2024-03-01 12:00:00")])})
    assert _canon(aware_ts) == _canon(naive_ts)


def test_spark_to_pandas_falls_back_on_out_of_ns_window_timestamps(spark):
    from tools.check_oracles import spark_to_pandas

    df = spark.sql(
        "SELECT TIMESTAMP '9999-12-31 23:59:59' AS hi,"
        " TIMESTAMP '0001-01-02 03:04:05' AS lo,"
        " CAST(NULL AS TIMESTAMP) AS nul, 1 AS k"
    )
    with pytest.raises(Exception):
        df.toPandas()  # the exact gap the fallback exists for
    pdf = spark_to_pandas(df)
    odf = duckdb.sql(
        "SELECT TIMESTAMP '9999-12-31 23:59:59' AS hi,"
        " TIMESTAMP '0001-01-02 03:04:05' AS lo,"
        " CAST(NULL AS TIMESTAMP) AS nul, 1 AS k"
    ).df()
    assert _canon(pdf) == _canon(odf)


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
