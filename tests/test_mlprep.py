"""Unit semantics for the feature-engineering family (operators/mlprep.py):
hashing-trick sign/slot determinism and sparsity, out-of-fold exclusion
in target encoding, degenerate-category NULL guard, and empty-input
totality."""

from __future__ import annotations

import datetime as dt

import pyarrow.parquet as pq
from pyspark.sql import Row

from real_time_mobility_heatmap_spark.operators.mlprep import (
    FH_DIM,
    TE_FOLDS,
    feature_hashing,
    target_encoding,
)

import __spark_entry__ as entry_mod


def _doc(doc_id, text):
    return Row(doc_id=doc_id, text=text, lang="en", source="s", n_chars=len(text or ""))


def _order(key, priority, price):
    return Row(
        o_orderkey=key,
        o_custkey=1,
        o_orderstatus="O",
        o_totalprice=float(price),
        o_orderdate=dt.datetime(2024, 1, 1),
        o_orderpriority=priority,
    )


# ---- feature_hashing ------------------------------------------------------


def test_hashing_trick_determinism_and_slots(spark):
    """The same token always lands in the same slot with the same sign:
    a doc of one token repeated 5x has exactly one row, |weight| == 5,
    n_tokens == 5, and slot in [0, FH_DIM)."""
    docs = spark.createDataFrame([_doc(1, "spark spark spark spark spark")])
    rows = feature_hashing(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0 <= r["slot"] < FH_DIM
    assert abs(r["weight"]) == 5 and r["n_tokens"] == 5


def test_hashing_null_and_empty_text_drop(spark):
    """NULL text explodes to nothing; empty text's single '' token is
    filtered — neither document emits rows."""
    docs = spark.createDataFrame([_doc(1, None), _doc(2, ""), _doc(3, "a b")])
    out = feature_hashing(docs).collect()
    assert {r["doc_id"] for r in out} == {3}
    assert sum(r["n_tokens"] for r in out) == 2


# ---- target_encoding ------------------------------------------------------


def _fold_of(spark, keys):
    """Each key's fold, recomputed from the module's own hash definition."""
    from pyspark.sql import functions as F

    from real_time_mobility_heatmap_spark.functions.textfns import hash60_spark_sql

    h = hash60_spark_sql("concat('te|', CAST(o_orderkey AS STRING))")
    df = spark.createDataFrame([Row(o_orderkey=k) for k in keys])
    return {
        r["o_orderkey"]: r["fold"]
        for r in df.select("o_orderkey", F.expr(f"{h} % {TE_FOLDS}").alias("fold")).collect()
    }


def test_out_of_fold_exclusion(spark):
    """Fold f's encoding equals the exact Python-computed mean over the
    OTHER folds' rows — leave-fold-out, floor-divided in milli-cents."""
    keys = list(range(1, 41))
    prices = {k: 100 + k for k in keys}
    fold_map = _fold_of(spark, keys)
    orders = spark.createDataFrame([_order(k, "1-URGENT", prices[k]) for k in keys])
    out = {r["fold"]: r for r in target_encoding(orders).collect()}
    cents = {k: round(prices[k] * 100) for k in keys}
    for f, r in out.items():
        mine = [k for k in keys if fold_map[k] == f]
        others = [k for k in keys if fold_map[k] != f]
        assert r["n_rows"] == len(mine)
        expect = sum(cents[k] for k in others) * 1000 // len(others)
        assert r["heldout_mean_millicents"] == expect
    assert sum(r["n_rows"] for r in out.values()) == 40
    assert len(out) <= TE_FOLDS


def test_single_fold_category_yields_null(spark):
    """A category whose rows all hash to one fold has no held-out data
    for that fold -> NULL encoding, never a divide-by-zero."""
    one = spark.createDataFrame([_order(7, "RARE", 50.0)])
    rows = target_encoding(one).collect()
    assert len(rows) == 1
    assert rows[0]["heldout_mean_millicents"] is None


def test_out_of_fold_mean_exact_value(spark):
    """Two keys in different folds: each fold's encoding is exactly the
    OTHER row's price in milli-cents."""
    fold_map = _fold_of(spark, list(range(1, 30)))
    keys_by_fold: dict[int, int] = {}
    for k, f in fold_map.items():
        keys_by_fold.setdefault(f, k)
        if len(keys_by_fold) == 2:
            break
    (fa, ka), (fb, kb) = list(keys_by_fold.items())[:2]
    orders = spark.createDataFrame([_order(ka, "P", 11.11), _order(kb, "P", 22.22)])
    out = {r["fold"]: r for r in target_encoding(orders).collect()}
    assert out[fa]["heldout_mean_millicents"] == round(22.22 * 100) * 1000
    assert out[fb]["heldout_mean_millicents"] == round(11.11 * 100) * 1000


# ---- totality -------------------------------------------------------------


def test_mlprep_total_on_empty_fixtures(spark, tmp_path):
    for src, name in (
        ("/root/testdata/sf0.001/documents.parquet", "documents.parquet"),
        ("/root/testdata/sf0.001/orders.parquet", "orders.parquet"),
    ):
        pq.write_table(pq.read_table(src).slice(0, 0), str(tmp_path / name))
    qs = entry_mod.queries()
    for name in ("feature_hashing", "target_encoding"):
        df = qs[name](spark, str(tmp_path))
        assert df.collect() == []
        assert df.schema.fieldNames()
