"""Semantic unit tests for the tpch.py query shapes.

The oracle gate (tools/check_oracles.py + the driver) proves value equality
against DuckDB; these tests pin the SEMANTIC traps each shape exists to
exercise — the ones a refactor could silently break while still "running".
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from real_time_mobility_heatmap_spark.operators import tpch


TS = dt.datetime


def test_q13_outer_join_keeps_zero_order_customers(spark):
    customer = spark.createDataFrame(
        [Row(c_custkey=1), Row(c_custkey=2), Row(c_custkey=3)]
    )
    orders = spark.createDataFrame(
        [
            Row(o_orderkey=10, o_custkey=1, o_orderpriority="1-URGENT"),
            Row(o_orderkey=11, o_custkey=1, o_orderpriority="5-LOW"),
            # customer 2's only order is filtered by the ON clause -> must
            # still land in the c_count = 0 bucket, not vanish.
            Row(o_orderkey=12, o_custkey=2, o_orderpriority="5-LOW"),
        ]
    )
    got = {
        r["c_count"]: r["custdist"]
        for r in tpch.customer_order_distribution(customer, orders).collect()
    }
    assert got == {1: 1, 0: 2}


def test_q21_sole_late_supplier_logic(spark):
    base = TS(2000, 1, 1)
    orders = spark.createDataFrame(
        [
            Row(o_orderkey=k, o_orderdate=base, o_orderstatus=s)
            for k, s in [(1, "F"), (2, "F"), (3, "F"), (4, "O")]
        ]
    )
    late, ok = base + dt.timedelta(days=90), base + dt.timedelta(days=10)
    lineitem = spark.createDataFrame(
        [
            # order 1: supplier 7 late, supplier 8 on time -> counts for 7.
            Row(l_orderkey=1, l_suppkey=7, l_shipdate=late),
            Row(l_orderkey=1, l_suppkey=8, l_shipdate=ok),
            # order 2: both suppliers late -> counts for nobody.
            Row(l_orderkey=2, l_suppkey=7, l_shipdate=late),
            Row(l_orderkey=2, l_suppkey=8, l_shipdate=late),
            # order 3: single-supplier order -> excluded (needs a co-supplier).
            Row(l_orderkey=3, l_suppkey=7, l_shipdate=late),
            # order 4: late but status 'O' -> excluded.
            Row(l_orderkey=4, l_suppkey=7, l_shipdate=late),
            Row(l_orderkey=4, l_suppkey=8, l_shipdate=ok),
        ]
    )
    supplier = spark.createDataFrame(
        [
            Row(s_suppkey=7, s_name="S7", s_nationkey=1),
            Row(s_suppkey=8, s_name="S8", s_nationkey=1),
        ]
    )
    nation = spark.createDataFrame([Row(n_nationkey=1, n_name="N1", n_regionkey=0)])
    got = tpch.late_shipment_suppliers(nation, supplier, orders, lineitem).collect()
    assert [(r["s_name"], r["numwait"]) for r in got] == [("S7", 1)]


def test_q21_multiple_late_lines_count_once(spark):
    base = TS(2000, 1, 1)
    orders = spark.createDataFrame(
        [Row(o_orderkey=1, o_orderdate=base, o_orderstatus="F")]
    )
    late, ok = base + dt.timedelta(days=90), base + dt.timedelta(days=10)
    lineitem = spark.createDataFrame(
        [
            Row(l_orderkey=1, l_suppkey=7, l_shipdate=late),
            Row(l_orderkey=1, l_suppkey=7, l_shipdate=late),  # second late line
            Row(l_orderkey=1, l_suppkey=8, l_shipdate=ok),
        ]
    )
    supplier = spark.createDataFrame([Row(s_suppkey=7, s_name="S7", s_nationkey=1)])
    nation = spark.createDataFrame([Row(n_nationkey=1, n_name="N1", n_regionkey=0)])
    got = tpch.late_shipment_suppliers(nation, supplier, orders, lineitem).collect()
    assert [(r["s_name"], r["numwait"]) for r in got] == [("S7", 1)]


def test_q15_ties_both_survive_and_rounding_precedes_max(spark):
    d = TS(1997, 2, 1)
    lineitem = spark.createDataFrame(
        [
            # suppliers 1 and 2 tie at 100.00 after cent rounding.
            Row(l_suppkey=1, l_extendedprice=100.0, l_discount=0.0, l_shipdate=d),
            Row(l_suppkey=2, l_extendedprice=200.0, l_discount=0.5, l_shipdate=d),
            Row(l_suppkey=3, l_extendedprice=50.0, l_discount=0.0, l_shipdate=d),
        ]
    )
    supplier = spark.createDataFrame(
        [Row(s_suppkey=i, s_name=f"S{i}", s_nationkey=0, s_acctbal=0.0) for i in (1, 2, 3)]
    )
    got = sorted(
        r["s_suppkey"] for r in tpch.top_suppliers(supplier, lineitem).collect()
    )
    assert got == [1, 2]


def test_q18_having_threshold_is_exact_on_integral_qty(spark):
    d = TS(1997, 2, 1)
    lineitem = spark.createDataFrame(
        [Row(l_orderkey=1, l_quantity=125.0), Row(l_orderkey=1, l_quantity=126.0)]
        + [Row(l_orderkey=2, l_quantity=250.0)]
    )
    orders = spark.createDataFrame(
        [
            Row(o_orderkey=1, o_custkey=1, o_totalprice=10.0, o_orderdate=d),
            Row(o_orderkey=2, o_custkey=1, o_totalprice=20.0, o_orderdate=d),
        ]
    )
    customer = spark.createDataFrame([Row(c_custkey=1, c_name="C1")])
    got = tpch.large_volume_customers(customer, orders, lineitem).collect()
    # 251 > 250 qualifies; exactly 250 does not.
    assert [(r["o_orderkey"], r["sum_qty"]) for r in got] == [(1, 251.0)]


def test_q2_all_min_cost_suppliers_survive(spark, sf_dir):
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    out = tpch.q_min_cost_supplier(spark, sf_dir)
    # every surviving (part, supplier) row carries its part's minimum cost:
    # re-derive the per-part min and check no row exceeds it.
    w_min = out.groupBy("p_partkey").agg(F.min("supply_cost").alias("m"))
    bad = out.join(w_min, "p_partkey").filter(F.col("supply_cost") > F.col("m"))
    assert bad.count() == 0


def test_registry_has_all_tpch_entries():
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    for name in [
        "min_cost_supplier",
        "late_order_priority",
        "nation_trade_volume",
        "market_share",
        "product_type_profit",
        "customer_order_distribution",
        "promo_revenue_share",
        "top_suppliers",
        "part_supplier_counts",
        "large_volume_customers",
        "disjunctive_revenue",
        "excess_shipment_suppliers",
        "late_shipment_suppliers",
        "idle_customer_balance",
    ]:
        assert name in qs and name in oracles
