"""Perturbed-corpus differential regression net (r11).

The driver's fixtures observe ONE set of value combinations; the
rounding-boundary bug class (a money total landing within an ulp of a
half-cent) only fires when the data happens to reach a boundary, so the
r11 sweep jittered every non-key column (tools/perturb_corpus.py) and
ran the full registry — catching ``product_type_profit`` flipping
1433933.21 vs .22 between Spark and DuckDB. The class-wide fix is
functions/money.py (exact DECIMAL sums); this file pins

1. the helper itself on a manufactured exact half-cent boundary where
   the float-sum formulation provably COULD flip, and
2. the repaired money queries differentially vs DuckDB on a perturbed
   sf0.001 corpus — fresh value combinations every time the fixture
   changes shape, not just the ones the fixtures shipped with.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import __spark_entry__ as entry_mod
from check_oracles import _canon
from perturb_corpus import build as build_perturbed
from real_time_mobility_heatmap_spark.functions.money import (
    money_sum,
    money_sum_sql,
)
from real_time_mobility_heatmap_spark.sources.tables import TABLES

SRC = "/root/testdata/sf0.001"

# the r11 money-class queries (every F.round(F.sum(<4+-decimal product>))
# site found by the static audit, now exact-DECIMAL)
MONEY_QUERIES = [
    "product_type_profit",
    "pricing_summary",
    "sql_pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "nation_trade_volume",
    "market_share",
    "promo_revenue_share",
    "top_suppliers",
    "disjunctive_revenue",
    "forecast_revenue_change",
    "returned_item_reporting",
    "important_parts",
    "bucketed_join_stats",
    "bloom_semijoin_stats",
]


def test_money_sum_exact_on_half_cent_boundary(spark):
    """Two 0.1225 revenues total exactly 0.2450 — a half-cent boundary.
    The decimal path must round it half-up to 0.25 in BOTH engines; the
    old float path is hostage to whether the accumulated double lands
    above or below the boundary."""
    df = spark.createDataFrame(
        [(0.35, 0.35), (0.35, 0.35)], "price double, disc_compl double"
    )
    got = df.agg(money_sum("price * disc_compl").alias("s")).collect()[0]["s"]
    oracle = duckdb.sql(
        f"SELECT {money_sum_sql('a * b')} AS s"
        " FROM (VALUES (0.35, 0.35), (0.35, 0.35)) t(a, b)"
    ).fetchone()[0]
    assert got == oracle == 0.25
    # and the no-op-rounding variant (out_dec >= in_dec) stays exact
    got6 = df.agg(money_sum("price * disc_compl", 4, 6).alias("s")).collect()[
        0
    ]["s"]
    assert got6 == 0.245
    # hi/lo split reconstruction: units large enough that the lo half
    # wraps 1e6 repeatedly (9999.99 -> 99999900 units/row)
    big = spark.createDataFrame([(9999.99,)] * 7, "v double")
    got_big = big.agg(money_sum("v * 1.0").alias("s")).collect()[0]["s"]
    assert got_big == round(9999.99 * 7, 2) == 69999.93


@pytest.fixture(scope="module")
def perturbed_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf-perturbed")
    build_perturbed(SRC, str(d), seed=7)
    return str(d)


@pytest.mark.parametrize("name", MONEY_QUERIES)
def test_money_queries_match_oracle_on_perturbed_corpus(
    spark, perturbed_sf_dir, name
):
    """Same canonicalization as tools/check_oracles.py (the local stand-in
    for the driver's value-hash gate), on fresh value combinations."""
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    sdf = qs[name](spark, perturbed_sf_dir).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" '{perturbed_sf_dir}/{t}.parquet'"
        )
    odf = con.sql(oracles[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert len(sdf) == len(odf), name
    assert _canon(sdf) == _canon(odf), name


# ---------------------------------------------------------------------------
# r13: the NULL-embedding / zero-length-blob axis, pinned as a permanent
# differential net (the r13 sweep's first contact found 14 diverging
# queries in three classes — DuckDB list_inner_product erroring on NULL
# vectors, ANSI divide-by-zero on empty text, and the empty-blob
# totality split in media_resize; all fixed via the load_embeddings /
# _EMB boundary, nullif(length(text),0), and the resize left-join).

NULL_AXIS_QUERIES = [
    # NULL-vector boundary class
    "kmeans_update",
    "semantic_dedup",
    "quantize_embeddings",
    "lsh_buckets",
    "embedding_neardup",
    "rp_project",
    "rp_recall_report",
    "vband_geometry_report",
    # empty-text ANSI-division class
    "quality_score",
    "quality_filter",
    "quality_decile_report",
    "dedup_keep_best",
    # zero-length-blob totality class
    "media_features",
    "media_resize",
]


@pytest.fixture(scope="module")
def null_perturbed_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf-perturbed-nulls")
    build_perturbed(SRC, str(d), seed=7, nulls=True)
    # the axis must actually exist in the corpus, or these tests rot
    con = duckdb.connect()
    n_null_emb, n_null_seed = con.sql(
        f"SELECT count(*) FILTER (embedding IS NULL),"
        f" count(*) FILTER (embedding IS NULL AND vec_id < 4)"
        f" FROM '{d}/embeddings.parquet'"
    ).fetchone()
    assert n_null_emb > 0, "--nulls must NULL an embedding slice"
    assert n_null_seed == 0, "seed centroids must stay non-null"
    n_empty, n_bad_meta = con.sql(
        f"SELECT count(*) FILTER (text = ''),"
        f" count(*) FILTER (text = '' AND n_chars != 0)"
        f" FROM '{d}/documents.parquet'"
    ).fetchone()
    assert n_empty > 0, "--nulls must empty a text slice"
    assert n_bad_meta == 0, "empty text must carry n_chars = 0"
    return str(d)


@pytest.mark.parametrize("name", NULL_AXIS_QUERIES)
def test_null_axis_queries_match_oracle(spark, null_perturbed_sf_dir, name):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    sdf = qs[name](spark, null_perturbed_sf_dir).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" '{null_perturbed_sf_dir}/{t}.parquet'"
        )
    odf = con.sql(oracles[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert len(sdf) == len(odf), name
    assert _canon(sdf) == _canon(odf), name
