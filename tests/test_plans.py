"""Physical-plan assertions: the optimizations the engine is DESIGNED
around must actually appear in the executed plans (SURVEY.md §4) — a
broadcast that silently degrades to a sort-merge join, or a filter that
stops reaching the parquet scan, is a performance regression even while
results stay correct."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = entry_mod.queries()[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _pushed(plan: str) -> str:
    return " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))


def _hint_subtrees(spark, name: str) -> list[str]:
    """Return the analyzed-plan subtree under every ResolvedHint node."""
    df = entry_mod.queries()[name](spark, SF_DIR)
    lines = df._jdf.queryExecution().analyzed().toString().split("\n")

    def depth(line: str) -> int:
        return len(line) - len(line.lstrip(" :+-"))

    out = []
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line:
            continue
        d = depth(line)
        j = i + 1
        while j < len(lines) and depth(lines[j]) > d:
            j += 1
        out.append("\n".join(lines[i:j]))
    return out


# All 22 TPC-H-shape queries (+ the brand_volume variant): broadcast
# hints may remain ONLY on provably bounded relations — region/nation
# lookups and 1-row global aggregates — never on anything SF-scaled
# (customer, supplier, part, orders, lineitem, OR a filtered/derived
# slice of them: a p_type equality still keeps a fixed FRACTION of an
# SF-scaled table, so its absolute size grows linearly with SF; r8
# verdict items #1/#2).
SF_SCALED_DEHINTED = (
    "brand_volume",
    "pricing_summary",
    "min_cost_supplier",
    "shipping_priority",
    "late_order_priority",
    "local_supplier_volume",
    "forecast_revenue_change",
    "nation_trade_volume",
    "market_share",
    "product_type_profit",
    "returned_item_reporting",
    "important_parts",
    "shipmode_priority_counts",
    "customer_order_distribution",
    "promo_revenue_share",
    "top_suppliers",
    "part_supplier_counts",
    "small_quantity_revenue",
    "large_volume_customers",
    "disjunctive_revenue",
    "excess_shipment_suppliers",
    "late_shipment_suppliers",
    "idle_customer_balance",
)

# Any Relation line inside a (non-exempt) hint subtree carrying one of
# these columns means the hint wraps an SF-scaled table or a slice of
# one.  One key per TPC-H table; l_orderkey covers lineitem-derived
# sets (e.g. a HAVING tail, which is a tiny FRACTION but still grows
# linearly with SF).
SF_SCALED_KEYS = ("c_custkey", "s_suppkey", "p_partkey", "o_orderkey", "l_orderkey")

# Operators that cannot grow a hint subtree's row count; used when
# walking down from the hint to its topmost row-determining node.
_PASSTHROUGH_NODES = ("Project", "Filter", "SubqueryAlias", "Sort", "Deduplicate")


def _hint_is_one_row_bounded(subtree: str) -> bool:
    """True iff the hinted subtree provably returns O(1) rows regardless
    of input scale: its topmost row-determining node is a GLOBAL
    aggregate (``Aggregate [exprs]`` — one bracket list; a grouped
    aggregate prints ``Aggregate [keys], [exprs]``) or a GlobalLimit.
    Such hints (the Q15 scalar MAX, the Q22 average balance, the Q11
    total) are legitimate even though their subtree SCANS an SF-scaled
    table — the broadcast payload is one row."""
    for raw in subtree.split("\n")[1:]:  # [0] is the ResolvedHint line
        line = raw.lstrip(" :+-")
        if not line:
            continue
        if line.startswith("GlobalLimit"):
            return True
        if line.startswith("Aggregate ["):
            rest = line[len("Aggregate ") :]
            depth = 0
            for i, ch in enumerate(rest):
                if ch == "[":
                    depth += 1
                elif ch == "]":
                    depth -= 1
                    if depth == 0:
                        # grouped agg: first balanced list is followed
                        # by ", [" (the aggregate-expression list)
                        return not rest[i + 1 :].lstrip().startswith(", [")
            return False
        if any(line.startswith(p) for p in _PASSTHROUGH_NODES):
            continue
        return False  # Join/Relation/Union/... — row count not bounded
    return False


def test_no_broadcast_hint_wraps_sf_scaled_relation(spark):
    """Every TPC-H table grows linearly with scale factor (lineitem ~600B
    rows at a 100 TB TPC-H) — an unconditional broadcast hint on one, or
    on a filtered slice of one, is a driver OOM at scale. Hints may only
    wrap bounded relations (region/nation, 1-row global aggregates); the
    SF-scaled sides are left to size stats / AQE.

    Detection: analyzed-plan Relation nodes print OUTPUT COLUMNS (never
    file paths), so a hint subtree scanning an SF-scaled table shows a
    ``Relation [c_custkey...]`` / ``Relation [p_partkey...]`` /... line —
    that's what we grep, exempting subtrees whose topmost node is a
    1-row global aggregate. Verified non-vacuous by
    test_hint_detector_catches_reintroduced_broadcast below."""
    for name in SF_SCALED_DEHINTED:
        for sub in _hint_subtrees(spark, name):
            if _hint_is_one_row_bounded(sub):
                continue
            for line in sub.split("\n"):
                if "Relation" not in line:
                    continue
                for bad in SF_SCALED_KEYS:
                    assert bad not in line, (
                        f"{name}: broadcast hint wraps an SF-scaled relation: {line.strip()}"
                    )


def test_one_row_exemption_is_not_a_loophole(spark):
    """Self-test of _hint_is_one_row_bounded: a GROUPED aggregate over
    customer (SF-scaled output, one row per key) must NOT be exempt,
    while a global aggregate over the same scan must be."""
    from pyspark.sql import functions as F

    from real_time_mobility_heatmap_spark.sources.tables import load_table

    customer = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")

    def subtrees_of(df):
        lines = df._jdf.queryExecution().analyzed().toString().split("\n")

        def depth(line):
            return len(line) - len(line.lstrip(" :+-"))

        out = []
        for i, line in enumerate(lines):
            if "ResolvedHint" not in line:
                continue
            d = depth(line)
            j = i + 1
            while j < len(lines) and depth(lines[j]) > d:
                j += 1
            out.append("\n".join(lines[i:j]))
        return out

    grouped = customer.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("a"))
    bad = orders.join(F.broadcast(grouped), orders.o_custkey == grouped.c_nationkey)
    (sub,) = subtrees_of(bad)
    assert not _hint_is_one_row_bounded(sub)

    scalar = customer.agg(F.avg("c_acctbal").alias("a"))
    ok = orders.crossJoin(F.broadcast(scalar))
    (sub,) = subtrees_of(ok)
    assert _hint_is_one_row_bounded(sub)


def test_hint_detector_catches_reintroduced_broadcast(spark):
    """Self-test of the detector above: a deliberately hinted customer
    join MUST trip the same Relation-column grep (guards against the
    r8 review finding that a path-based grep could never fail)."""
    from pyspark.sql import functions as F

    from real_time_mobility_heatmap_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    df = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    lines = df._jdf.queryExecution().analyzed().toString().split("\n")

    def depth(line):
        return len(line) - len(line.lstrip(" :+-"))

    tripped = False
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line:
            continue
        d = depth(line)
        j = i + 1
        while j < len(lines) and depth(lines[j]) > d:
            if "Relation" in lines[j] and "c_custkey" in lines[j]:
                tripped = True
            j += 1
    assert tripped, "detector failed to flag a hinted customer relation"


def _final_plan(spark, name: str) -> str:
    """Execute the query and return the FINAL adaptive plan (static
    join-size estimates for un-hinted joins are worst-case products, so
    the initial plan may show SMJ that AQE replaces with a broadcast at
    runtime — the final plan is the one that matters at scale)."""
    df = entry_mod.queries()[name](spark, SF_DIR)
    df.collect()
    full = df._jdf.queryExecution().executedPlan().toString()
    return full.split("== Initial Plan ==")[0]


def test_dim_joins_are_broadcast_not_sort_merge(spark):
    """With the SF-scaled hints gone, runtime stats must still pick
    broadcast joins at fixture scale — de-hinting moves the decision to
    AQE, it does not degrade small-scale execution to SMJ."""
    for name in ("brand_volume", "shipping_priority", "local_supplier_volume"):
        plan = _final_plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, f"{name}: dim join degraded to SMJ"


def test_semi_anti_joins_ship_key_sets(spark):
    assert "LeftSemi" in _plan(spark, "orders_with_big_items")
    assert "LeftAnti" in _plan(spark, "customers_without_orders")


def test_filters_reach_parquet_scan(spark):
    assert "l_shipdate" in _pushed(_plan(spark, "pricing_summary"))
    p = _plan(spark, "conversion_window_counts")
    assert "EqualTo(event_type,purchase)" in _pushed(p)
    assert "EqualTo(event_type,click)" in _pushed(p)


def test_topk_is_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "shipping_priority")
    assert "TakeOrderedAndProject" in plan


def test_aggregates_are_partial_then_final(spark):
    # partial (map-side) + final HashAggregate around one exchange: the
    # shuffle carries group cardinality, not input rows
    plan = _plan(spark, "mobility_tiles")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_flag_rewrite_uses_fewer_shuffles_than_setops(spark):
    setops = _plan(spark, "active_cells_setops").count("Exchange")
    flags = _plan(spark, "active_cells_flags").count("Exchange")
    assert flags < setops, (flags, setops)


def test_zone_counts_is_equi_join_not_nested_loop(spark):
    """The grid-bucketed containment join must plan as a hash equi-join
    on cell_id — never a nested-loop / cartesian theta join (the naive
    bbox BETWEEN formulation)."""
    plan = _plan(spark, "zone_counts")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_salted_join_spreads_hot_keys(spark):
    """The salted join must keep the forced shuffle-join shape (the
    pattern exists for two-large-sides skew) and join on the COMPOSITE
    (event_type, salt) key."""
    plan = _plan(spark, "salted_join_stats")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "salt" in plan


def test_bucketed_join_has_no_exchange_on_either_input(spark):
    """The co-located join must read both bucketed tables WITHOUT
    re-shuffling: zero Exchange below the SortMergeJoin (the write-time
    bucketing IS the shuffle). The registered query's only Exchange is
    the final group-by aggregate."""
    from real_time_mobility_heatmap_spark.operators.relational import (
        bucketed_tables,
    )

    orders, lineitem = bucketed_tables(spark, SF_DIR)
    joined = orders.hint("merge").join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join re-shuffled an input"
    assert "SelectedBucketsCount" in plan  # scans really are bucket-aware

    # formatted explain prints each node in the tree AND a detail section,
    # so count node headers: exactly one Exchange (the final aggregate's)
    full = _plan(spark, "bucketed_join_stats")
    assert len(re.findall(r"\(\d+\) Exchange", full)) == 1, (
        "only the final aggregate may shuffle"
    )


def test_neardup_verify_joins_carry_no_broadcast_hint(spark):
    """embedding_neardup's exact-cosine verify joins must NOT force a
    broadcast on either side: the embeddings relation is corpus-sized at
    100 TB (hinting it => driver OOM) and the candidate pair set is only
    cap-bounded per bucket (hinting it regressed 2x on the heavy-collision
    fixture, r7 bench). What we pin is the absence of any unconditional
    hint in the logical plan — size-based/AQE planning picks the build
    side from actual stats instead. The single allowed broadcast is the
    1-row bucket-cap bound (a crossJoin, not one of the verify joins)."""
    df = entry_mod.queries()["embedding_neardup"](spark, SF_DIR)
    # DataFrame-API hints land in the analyzed plan as ResolvedHint nodes
    logical = df._jdf.queryExecution().analyzed().toString()
    hints = logical.count("ResolvedHint (strategy=broadcast)")
    assert hints == 1, f"expected only the 1-row cap-bound hint, saw {hints}"


def test_dedup_clusters_size_join_is_not_broadcast(spark):
    """The cluster-size back-join must NOT hint a broadcast: cluster
    count is corpus-scale in the worst case (all-singleton corpus). At
    fixture scale AQE may still legitimately pick a broadcast from
    runtime stats; what we pin is the ABSENCE of the unconditional hint
    in the logical plan, which is what would force the OOM at 100 TB."""
    df = entry_mod.queries()["dedup_clusters"](spark, SF_DIR)
    # DataFrame-API hints land in the analyzed plan as ResolvedHint nodes
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical, "unexpected broadcast hint"


def test_vocab_topv_is_take_ordered_not_global_sort(spark):
    """The top-V vocabulary must plan as TakeOrderedAndProject (a
    distributed partial top-k), never a global Sort of the token-count
    relation — the difference between O(V) driver memory and a full
    corpus-vocabulary sort at 100 TB."""
    plan = _plan(spark, "vocab_coverage_report")
    assert "TakeOrderedAndProject" in plan
    # no global (non-partial) Sort node anywhere in the plan
    assert not re.search(r"\(\d+\) Sort\b", plan), "unexpected global sort"


def test_winnow_match_spans_no_broadcast_hint_and_semi_pruned(spark):
    """The span-alignment joins must NOT hint a broadcast on the
    fingerprint relation (corpus-sized at 100 TB => driver OOM; r7
    verdict item #2) AND the fp relation must be left-semi-pruned to the
    matched-pair member set before the alignment joins so the span
    shuffle is pair-cap-bounded, not corpus-bounded. The single allowed
    broadcast is winnow_match_pairs' 1-row bucket-cap bound (a
    crossJoin, not an alignment join — same carve-out as
    embedding_neardup's)."""
    df = entry_mod.queries()["winnow_match_spans"](spark, SF_DIR)
    logical = df._jdf.queryExecution().analyzed().toString()
    lines = logical.split("\n")
    # r17: the pair relation is materialized once (localCheckpoint), so
    # the pair stage's own lineage — including its cap-bound hint — no
    # longer prints in the outer plan. The outer plan must contain NO
    # broadcast hint except (defensively) the 1-row df_cap aggregate...
    for i, l in enumerate(lines):
        if "ResolvedHint" in l:
            assert "df_cap" in lines[i + 1], (
                f"broadcast hint on a non-cap relation: {lines[i + 1]}"
            )
    assert "LeftSemi" in logical, "fingerprints not member-pruned"
    # ...and the checkpointed PAIR stage keeps the original guarantee:
    # its only hint wraps the 1-row cap aggregate (corpus-sized
    # relations unhinted; r7 verdict item #2), checked on the stage's
    # own analyzed plan since the outer one can't see through the cut.
    from real_time_mobility_heatmap_spark.operators.dedup import (
        _winnow_fingerprints_body,
        _winnow_match_pairs_body,
        collapse_doc_identity,
    )
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    docs = collapse_doc_identity(load_table(spark, SF_DIR, "documents"))
    pair_df = _winnow_match_pairs_body(docs, _winnow_fingerprints_body(docs))
    pair_lines = pair_df._jdf.queryExecution().analyzed().toString().split("\n")
    pair_hints = [i for i, l in enumerate(pair_lines) if "ResolvedHint" in l]
    assert pair_hints, "expected the cap-bound hint in the pair stage"
    for i in pair_hints:
        assert "df_cap" in pair_lines[i + 1], (
            f"broadcast hint on a non-cap relation: {pair_lines[i + 1]}"
        )


def test_per_source_cap_pushes_group_limit_below_shuffle(spark):
    """The rank<=cap filter must plan as WindowGroupLimit on BOTH sides
    of the exchange (Spark 3.5+ rewrite): the map-side partial keeps only
    its local top-cap per source BEFORE shuffling, so a hot domain ships
    cap x n_partitions rows, not its full row set — the property
    curation.per_source_cap's 100 TB claim rests on."""
    plan = _plan(spark, "per_source_cap")
    # keep only the tree section (the per-node detail block repeats names)
    tree = plan.split("\n(1)")[0]
    assert tree.count("WindowGroupLimit") == 2, "missing partial+final pair"
    # the tree prints root-first, so the MAP-SIDE partial is the
    # WindowGroupLimit that appears BELOW (textually after) the Exchange
    below_exchange = tree.split("Exchange", 1)[1]
    assert "WindowGroupLimit" in below_exchange, "no map-side partial group limit"


def test_stay_points_and_ping_gap_single_exchange(spark):
    """Both flow-family window pipelines claim ONE corpus shuffle: the
    vehicleId window partitioning is reused by every later aggregate
    (stay_points' run aggregate keys on (vehicleId, run_id) — a superset
    clustered distribution hashpartitioning(vehicleId) satisfies)."""
    for name in ("stay_points", "ping_gap_report"):
        tree = _plan(spark, name).split("\n(1)")[0]
        assert tree.count(" Exchange (") == 1, name


def test_od_matrix_windows_and_endpoint_agg_share_one_exchange(spark):
    """od_matrix's two row_number windows and the endpoint SortAggregate
    all run inside ONE (vehicleId, trip_hour) partitioning: no Exchange
    may appear between the first Window node and the aggregate above it
    (only the final flow aggregate and the count-distinct expansion
    shuffle afterwards, on trip-level rows)."""
    tree = _plan(spark, "od_matrix").split("\n(1)")[0]
    first_window = tree.index("Window")
    scan_section = tree[first_window:]
    assert " Exchange (" in tree[:first_window]  # flow agg shuffles above
    # below (after, in root-first text) the first Window: only the sort
    # for the second window and the scan — the shared input exchange
    assert scan_section.count(" Exchange (") == 1


def test_kring_smooth_cell_relation_broadcast_no_smj(spark):
    """The scatter/regroup side is cells-bounded: the join back to the
    raw counts must be a broadcast hash join (planner-chosen, unhinted),
    never a sort-merge join over two shuffles."""
    tree = _plan(spark, "kring_smooth").split("\n(1)")[0]
    assert "BroadcastHashJoin" in tree
    assert "SortMergeJoin" not in tree


def test_tile_gap_fill_top_cells_bounded_limit(spark):
    """The spine source must be a bounded top-N (TakeOrdered), never a
    global sort of the cell relation."""
    tree = _plan(spark, "tile_gap_fill").split("\n(1)")[0]
    assert "TakeOrderedAndProject" in tree
    assert "GlobalLimit" not in tree  # no separate sort+limit pair


def test_registry_wide_plan_lint_no_cartesian_no_scalar_python_udf(spark):
    """Anti-pattern sweep over EVERY registered query's plan:

    - CartesianProduct is forbidden outright (the join shape that cannot
      scale; the engine's broadcast single-row bounds plan as
      BroadcastNestedLoopJoin with a 1-row side, which is fine);
    - BatchEvalPython (row-at-a-time Python UDF) is forbidden — Python
      only ever enters via Arrow (ArrowEvalPython / MapInPandas /
      FlatMapGroupsInPandas), which batches through codegen'd scans.
    """
    for name, fn in entry_mod.queries().items():
        if name == "streaming_tiles":
            continue  # runs a live streaming query; covered by streaming tests
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


# A partition-less Window funnels its whole input into ONE task
# (WindowExec warns "Moving all data to a single partition") — a plan
# shape that only survives 100 TB when the windowed relation is bounded
# by construction. Every allowed site below is, with the bound stated;
# anything new must justify itself here or partition its window.
_GLOBAL_WINDOW_ALLOWED = {
    # cumulative share over the quality-score HISTOGRAM (bucket-bounded)
    "quality_decile_report",
    # rank over top-N heavy hitters — window runs AFTER .limit(N)
    "key_skew_report",
    # rank over the distinct-adjacent-pair count aggregate (vocab-bounded)
    "bpe_merge_round",
    # file-metadata relation (files, not rows)
    "compaction_plan",
    # B-bounded bucket-occupancy report (relational.py range_partition_plan:
    # boundaries via the distinct-n_chars percentile path, window over B rows)
    "range_partition_plan",
    # documented |customers| single-task ntile caveat (analytics.py
    # rfm_segments docstring: corpus-scale deployments bucket by
    # histogram thresholds instead)
    "rfm_segments",
}


def _window_spec_first_args(plan: str) -> list[str]:
    """FIRST top-level argument of every windowspecdefinition(...) in
    the plan, via a balanced-paren walk. The r13 regex (`[^()]*`)
    truncated at the first '(' — an ordering expression that is itself
    a call (e.g. ``cast(x as double) ASC NULLS FIRST``) captured only
    ``cast`` and never matched the ASC/DESC marker, a false NEGATIVE in
    the exact guard meant to block single-task window funnels (r13
    advisor)."""
    out: list[str] = []
    needle = "windowspecdefinition("
    i = plan.find(needle)
    while i != -1:
        j = i + len(needle)
        depth = 1
        cur: list[str] = []
        while j < len(plan) and depth > 0:
            ch = plan[j]
            if ch == "'":
                # skip single-quoted literal spans whole (r14 advice): a
                # paren/comma inside a string argument (e.g. a regex in
                # regexp_replace(x, '(a,b)', ...)) must not move the
                # depth counter or end the argument early
                k = plan.find("'", j + 1)
                if k == -1:
                    k = len(plan) - 1
                cur.append(plan[j : k + 1])
                j = k + 1
                continue
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            elif ch == "," and depth == 1:
                break  # first top-level argument complete
            cur.append(ch)
            j += 1
        out.append("".join(cur).strip())
        i = plan.find(needle, i + len(needle))
    return out


def test_window_spec_walker_sees_through_call_orderings():
    """Detector sanity: an ordering expression wrapped in a call must
    still expose its ASC/DESC NULLS marker (the shape the r13 regex
    silently passed)."""
    plan = (
        "Window [row_number() windowspecdefinition("
        "cast(x#1 as double) ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$())) AS rn#2]"
    )
    firsts = _window_spec_first_args(plan)
    assert firsts == ["cast(x#1 as double) ASC NULLS FIRST"]
    assert re.search(r" (ASC|DESC) NULLS", firsts[0])


def test_window_spec_walker_skips_quoted_paren_and_comma():
    """Detector sanity (r14 advice): parens/commas inside string
    literals within the ordering expression must not desynchronize the
    balanced-paren walk or split the first argument early."""
    plan = (
        "Window [max(y#3) windowspecdefinition("
        "regexp_replace(x#1, '(a,b)(', 'z') ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$())) AS m#4]"
    )
    firsts = _window_spec_first_args(plan)
    assert firsts == ["regexp_replace(x#1, '(a,b)(', 'z') ASC NULLS FIRST"]
    # and a partitioned spec's first arg is the bare partition column
    plan2 = (
        "windowspecdefinition(k#3, cast(x#1 as double) ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$()))"
    )
    assert _window_spec_first_args(plan2) == ["k#3"]


def test_registry_wide_plan_lint_global_windows_are_allowlisted(spark):
    """No registered plan may contain an un-adjudicated partition-less
    window. Detection: in windowspecdefinition(...), partition columns
    print BARE before the ordering columns (which carry ASC/DESC NULLS
    markers) — a spec whose FIRST argument is an ordering column has an
    empty partition spec."""
    for name, fn in entry_mod.queries().items():
        if name.startswith("streaming_"):
            continue  # live runs; batch twins cover the plan shapes
        plan = _plan(spark, name)
        for first in _window_spec_first_args(plan):
            if re.search(r" (ASC|DESC) NULLS", first):
                assert name in _GLOBAL_WINDOW_ALLOWED, (
                    f"{name}: partition-less window over {first!r} — "
                    "bound the input and allowlist it, or partition it"
                )
                break


def test_tpch_exists_shapes_plan_as_semi_anti(spark):
    # Q4 (r18): EXISTS(late item) == max(l_shipdate) > cutoff per order —
    # the probe must be a MAP-SIDE-COMBINED per-order aggregate (a
    # partial_max below the exchange), not a semi join shuffling the full
    # lineitem projection; the lateness predicate is a residual above it
    p4 = _plan(spark, "late_order_priority")
    assert "partial_max(l_shipdate" in p4, (
        "Q4 lost its map-side per-order max; the lineitem shuffle is back"
    )
    assert "LeftSemi" not in p4
    # Q22: NOT EXISTS(recent orders) -> left anti
    assert "LeftAnti" in _plan(spark, "idle_customer_balance")
    # Q16: supplier denylist NOT IN -> broadcast left anti
    p = _plan(spark, "part_supplier_counts")
    assert "LeftAnti" in p and "BroadcastHashJoin" in p


def test_tpch_dims_broadcast_facts_shuffle(spark):
    # 7-table Q8 star: at fixture scale AQE still broadcasts every dim
    # side from runtime stats alone (no hints on the SF-scaled sides —
    # test_no_broadcast_hint_wraps_customer_or_supplier), never leaving
    # a sort-merge join in the final plan
    p = _final_plan(spark, "market_share")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    p = _final_plan(spark, "product_type_profit")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_q6_predicates_reach_the_scan(spark):
    pushed = _pushed(_plan(spark, "forecast_revenue_change"))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"Q6 predicate on {col} not pushed to scan"


def test_q10_topk_is_take_ordered(spark):
    assert "TakeOrderedAndProject" in _plan(spark, "returned_item_reporting")


def test_q13_join_stays_outer_with_filter_on_null_side(spark):
    # the ON-clause filter is legal (and optimal) to push into the ORDERS
    # scan — orders is the null-producing side of the LEFT OUTER join — but
    # the join itself must never convert to inner (that drops the
    # zero-order customers bucket, Q13's defining trap)
    plan = _plan(spark, "customer_order_distribution")
    assert "LeftOuter" in plan
    assert "o_orderpriority" in _pushed(plan)


def test_partitioned_scan_prunes_directories(spark):
    from real_time_mobility_heatmap_spark.operators import relational

    df = relational.partition_pruned_stats(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the type/date predicates must resolve as PartitionFilters on the
    # partitioned layout (directory pruning), not post-scan Filters
    assert re.search(r"PartitionFilters: \[[^\]]*event_type[^\]]*\]", plan)
    assert re.search(r"PartitionFilters: \[[^\]]*event_date[^\]]*\]", plan)


def test_aqe_skew_join_splits_hot_partition(spark):
    """The r8 verdict item #6 pair: the SAME hot-key join executed with
    AQE skew-join handling on vs off. With thresholds lowered to fixture
    scale and broadcast disabled (forcing the sort-merge path a 100 TB
    two-large-sides join takes), OptimizeSkewedJoin must split the 80%
    hot partition — visible in the FINAL adaptive plan as
    ``SortMergeJoin(skew=true)`` + ``AQEShuffleRead ... skewed``; with
    skewJoin.enabled=false the same plan must carry no skew annotation
    and both runs must return identical rows (the optimization changes
    the physical carving only; value correctness vs the plain join is
    the driver's skewjoin_aqe_stats oracle row).

    The fact side is repartition(8)'d first: AQE splits a skewed reduce
    partition along MAPPER boundaries, and the one-file fixture scan
    yields a single mapper (one parquet row group), which is
    unsplittable by construction — the repartition emulates the
    thousands of mappers any real-scale scan has naturally."""
    from real_time_mobility_heatmap_spark.operators.relational import (
        skewjoin_aqe_stats,
    )
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        events = load_table(spark, SF_DIR, "events").repartition(8)
        customer = load_table(spark, SF_DIR, "customer")

        df = skewjoin_aqe_stats(events, customer)
        rows_on = {tuple(r) for r in df.collect()}
        final_on = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_on, (
            "OptimizeSkewedJoin did not split the hot partition:\n" + final_on
        )

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        df_off = skewjoin_aqe_stats(events, customer)
        rows_off = {tuple(r) for r in df_off.collect()}
        final_off = df_off._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in final_off
        assert rows_on == rows_off
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# Frontier-cut pins (r12): the r11 duplicate-corpus-scan audit found a tail
# of report/dial queries whose branches differ only by a constant (band
# geometry, probe count, k), so Catalyst canonicalizes them UNEQUAL and
# re-plans the shared corpus frontier into every branch.  Each is now
# lineage-cut (one materialization, N cheap readers); these pins hold the
# formatted-plan parquet-scan count at the adjudicated value so a refactor
# that silently drops a cut fails here, not at 100 TB.  A count of 0 means
# every corpus read goes through the materialized checkpoint (the one real
# scan runs inside the checkpoint's own computation, exactly once).

FRONTIER_CUT_SCAN_PINS = {
    # r11 audit count -> post-cut pin
    "vband_geometry_report": 0,       # was 16
    "cluster_quality_report": 1,      # was 10 (the re-assignment's own scan)
    "semantic_dedup": 0,              # was 9
    "filtered_topk_recall_report": 0, # was 8 embeddings + 4 documents
    "ivf_recall_report": 0,           # was 8 (4 after the r11 assign cut)
    "topk_cosine_ivf_probe2": 0,      # was 6
    "mobility_pipeline_report": 0,    # was 6
    "similar_speed_profiles": 0,      # was 6
    "active_cells_setops": 0,         # was 6
    # r17 inline assignment: ONE corpus scan (was 2 around the cut
    # assignment join) + three pushed-filter scans of <= N_QUERIES rows
    # (LessThan(vec_id, 4/5) reaches the parquet scan) — more scan
    # NODES, strictly fewer corpus passes and no assignment join
    "topk_cosine_ivf": 4,
    "rp_recall_report": 4,            # adjudicated: filter-pushed q branches, no real dup
    "quantized_recall_report": 0,     # was 4 (r12 re-audit straggler)
    "media_phash_pairs": 0,           # was 4 (one media hash pass, not three)
    "snapshot_diff_report": 0,        # was 4 (grain aggregate once, not per branch)
    "co_dwell_pairs": 0,              # was 4 (stay-point frontier cut, r13)
}


@pytest.mark.parametrize("name", sorted(FRONTIER_CUT_SCAN_PINS))
def test_frontier_cut_scan_counts_pinned(spark, name):
    plan = _plan(spark, name)
    # count detail-section node headers "(k) Scan parquet" - the tree
    # section repeats each node name, which would double-count
    n = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n <= FRONTIER_CUT_SCAN_PINS[name], (
        f"{name}: {n} parquet scans (pin {FRONTIER_CUT_SCAN_PINS[name]}) - "
        "a shared-frontier lineage cut was dropped"
    )
