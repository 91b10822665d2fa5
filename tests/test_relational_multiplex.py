from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from real_time_mobility_heatmap_spark.operators.multiplex import TAG, multiplexed
from real_time_mobility_heatmap_spark.operators.relational import (
    customers_without_orders,
    orders_with_big_items,
    sales_rollup,
)
from real_time_mobility_heatmap_spark.schema import PING_SCHEMA


def test_semi_anti_semantics(spark):
    orders = spark.createDataFrame(
        [(1, "O", 10.0, dt.datetime(2001, 2, 1)), (2, "F", 20.0, dt.datetime(2000, 1, 1))],
        "o_orderkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp",
    )
    lineitem = spark.createDataFrame(
        [(1, 50.0), (1, 3.0), (2, 10.0)], "l_orderkey long, l_quantity double"
    )
    semi = orders_with_big_items(orders, lineitem).collect()
    # only order 1 has a >=49.5 item; semi join emits it once despite 2 items
    assert [r["o_orderkey"] for r in semi] == [1]

    customer = spark.createDataFrame(
        [(10, "a", "BUILDING"), (20, "b", "AUTO")],
        "c_custkey long, c_name string, c_mktsegment string",
    )
    orders2 = spark.createDataFrame(
        [(100, 10, dt.datetime(2001, 6, 1)), (101, 20, dt.datetime(1999, 1, 1))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    anti = customers_without_orders(customer, orders2).collect()
    # customer 20's only order predates 2001 -> appears; customer 10 doesn't
    assert [r["c_custkey"] for r in anti] == [20]


def test_rollup_has_subtotals_and_grand_total(spark):
    li = spark.createDataFrame(
        [("A", "F", 1.0), ("A", "O", 2.0), ("B", "F", 3.0)],
        "l_returnflag string, l_linestatus string, l_quantity double",
    )
    rows = sales_rollup(li).collect()
    # 3 leaf groups + 2 flag subtotals + 1 grand total
    assert len(rows) == 6
    grand = [r for r in rows if r["l_returnflag"] is None and r["l_linestatus"] is None]
    assert grand[0]["n_items"] == 3 and grand[0]["sum_qty"] == 6.0


def test_multiplex_null_fill(spark):
    pings = spark.createDataFrame(
        [("mbta", "v1", dt.datetime(2024, 1, 1, 10, 2), 42.1, -71.1, 5.0, 1, None)],
        PING_SCHEMA,
    )
    u = multiplexed(pings)
    tiles_part = u.where(F.col(TAG) == "tiles")
    latest_part = u.where(F.col(TAG) == "latest")
    # missing columns null-filled on the opposite branch (U1 contract)
    assert tiles_part.where(F.col("vehicleId").isNull()).count() == tiles_part.count() == 1
    assert latest_part.where(F.col("tile_id").isNull()).count() == latest_part.count() == 1


def test_approx_distinct_within_5pct_of_exact(spark):
    """HLL++ (rsd=0.02) estimate per cell must land within ±5% of the exact
    count_distinct on the fixture — a quantitative bound, not a row count."""
    from real_time_mobility_heatmap_spark.operators.relational import (
        approx_distinct_vehicles,
        distinct_vehicles_per_cell,
    )
    from real_time_mobility_heatmap_spark.sources.tables import pings_from_events

    pings = pings_from_events(spark, "/root/testdata/sf0.01")
    exact = {r["cell_id"]: r["unique_vehicles"] for r in distinct_vehicles_per_cell(pings).collect()}
    approx = {r["cell_id"]: r["approx_unique_vehicles"] for r in approx_distinct_vehicles(pings).collect()}

    assert set(exact) == set(approx)
    worst = max(abs(approx[c] - exact[c]) / exact[c] for c in exact)
    assert worst <= 0.05, f"worst per-cell HLL error {worst:.3f} > 5%"


def test_approx_percentiles_close_to_exact(spark):
    """approx_percentile(1000) per event_type must land within 2% of the
    exact interpolated percentile (KLL-style sketch accuracy bound)."""
    from real_time_mobility_heatmap_spark.operators.windows import (
        approx_value_percentiles,
        value_percentiles,
    )
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.01", "events")
    exact = {r["event_type"]: r for r in value_percentiles(events).collect()}
    approx = {r["event_type"]: r for r in approx_value_percentiles(events).collect()}
    assert set(exact) == set(approx)
    for et in exact:
        for e_col, a_col in (("p50", "p50_approx"), ("p95", "p95_approx"), ("p99", "p99_approx")):
            e, a = exact[et][e_col], approx[et][a_col]
            assert abs(a - e) / e <= 0.02, (et, e_col, e, a)


def test_table_profile_approx_within_hll_tolerance(spark):
    """table_profile_approx (the 100 TB path: HLL instead of a 6-way exact
    count_distinct Expand) must agree with the exact profile on every
    column's null_rate/min/max and land within ±10% on n_distinct
    (approx_count_distinct default rsd is 5%; 2 sigma)."""
    from real_time_mobility_heatmap_spark.operators.windows import (
        table_profile,
        table_profile_approx,
    )
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.01", "events")
    exact = {r["column_name"]: r for r in table_profile(events).collect()}
    approx = {r["column_name"]: r for r in table_profile_approx(events).collect()}
    assert set(exact) == set(approx)
    for c in exact:
        e, a = exact[c], approx[c]
        assert (
            a["null_rate"], a["min_str"], a["max_str"],
            a["min_num"], a["max_num"],
        ) == (
            e["null_rate"], e["min_str"], e["max_str"],
            e["min_num"], e["max_num"],
        ), c
        rel = abs(a["n_distinct"] - e["n_distinct"]) / max(e["n_distinct"], 1)
        assert rel <= 0.10, (c, e["n_distinct"], a["n_distinct"], rel)


def test_attribution_models_agree_on_totals(spark, sf_dir):
    """First/last/linear models redistribute the SAME attributed value —
    their per-channel sums must all total the attributed purchase value."""
    from real_time_mobility_heatmap_spark.operators.relational import (
        q_attribution_report,
    )

    rows = q_attribution_report(spark, sf_dir).collect()
    assert {r["channel"] for r in rows} == {"click", "view"}
    tot_first = round(sum(r["first_touch_value"] for r in rows), 1)
    tot_last = round(sum(r["last_touch_value"] for r in rows), 1)
    tot_linear = round(sum(r["linear_value"] for r in rows), 1)
    assert tot_first == tot_last == tot_linear > 0


def test_scd2_merge_apply_equals_full_rebuild(spark):
    """The incremental MERGE must reproduce the full rebuild exactly on a
    set that exercises every boundary: a segment change ACROSS the
    cutoff, an unchanged-segment delta (no new version), a delta-only
    new user, and an untouched history-only user."""
    from real_time_mobility_heatmap_spark.operators.windows import (
        SCD2_CUTOFF,
        scd2_merge_apply,
        scd2_user_segments,
    )

    cut = dt.datetime.fromisoformat(SCD2_CUTOFF)
    day = dt.timedelta(days=1)
    rows = [
        # u1: history A,B then delta C (cross-cutoff change) and C again
        (1, "A", cut - 3 * day, 1),
        (1, "B", cut - 2 * day, 2),
        (1, "C", cut + 1 * day, 3),
        (1, "C", cut + 2 * day, 4),  # same segment: no new version
        # u2: history-only, must pass through untouched
        (2, "A", cut - 5 * day, 5),
        (2, "B", cut - 4 * day, 6),
        # u3: delta-only new user
        (3, "Z", cut + 1 * day, 7),
        # u4: delta equals last history segment -> NO new row at all
        (4, "A", cut - 1 * day, 8),
        (4, "A", cut + 1 * day, 9),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    key = lambda r: (r["user_id"], r["version"])
    full = {key(r): r for r in scd2_user_segments(events).collect()}
    merged = {key(r): r for r in scd2_merge_apply(events).collect()}
    assert set(full) == set(merged)
    for k in full:
        assert full[k].asDict() == merged[k].asDict(), k
    # the crafted semantics themselves
    assert merged[(1, 3)]["segment"] == "C" and merged[(1, 3)]["is_current"]
    assert (1, 4) not in merged  # repeat-C delta added no version
    assert (4, 2) not in merged  # boundary same-segment delta added none
    assert merged[(3, 1)]["segment"] == "Z"
    assert merged[(2, 2)]["segment"] == "B" and merged[(2, 2)]["is_current"]
