"""Semantics tests for the event-analytics family (operators/analytics.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_mobility_heatmap_spark.operators import analytics
from real_time_mobility_heatmap_spark.sources.tables import load_table


def test_cohort_retention_invariants(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = analytics.cohort_retention(events).collect()
    assert out, "no cohorts"
    by_cohort = {}
    for r in out:
        by_cohort.setdefault(r.cohort_epoch, {})[r.week_offset] = r
    total_week0 = 0
    for cohort, rows in by_cohort.items():
        assert 0 in rows, "every cohort must have its offset-0 row"
        size = rows[0].n_active
        total_week0 += size
        assert rows[0].retention_ppm == 1_000_000
        for off, r in rows.items():
            assert off >= 0
            assert 0 < r.n_active <= size
            assert r.retention_ppm == r.n_active * 1_000_000 // size
    n_users = events.select("user_id").distinct().count()
    assert total_week0 == n_users, "cohorts must partition the user base"


def test_markov_transitions_rows_and_ppm(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = analytics.markov_transitions(events).collect()
    types = {r.event_type for r in events.select("event_type").distinct().collect()}
    assert {r.prev_type for r in out} <= types
    assert {r.next_type for r in out} <= types
    # transition count conservation: every event except each user's first
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    assert sum(r.n_transitions for r in out) == n_events - n_users
    # per-source ppm rows sum to <= 1e6 (integer floor division)
    per_prev = {}
    for r in out:
        per_prev.setdefault(r.prev_type, []).append(r.prob_ppm)
    for prev, ppms in per_prev.items():
        assert 1_000_000 - len(ppms) < sum(ppms) <= 1_000_000


def test_zscore_outliers_rate_and_symmetry(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = analytics.zscore_outliers(events)
    n = events.count()
    assert out.count() == n
    flagged = out.filter("is_outlier").count()
    # Chebyshev bound: at most 1/4 of rows can sit beyond 2 sigma
    assert flagged <= n / 4
    # z-scores recenter: per-type mean of z is ~0
    means = (
        out.groupBy("event_type").agg(F.avg("zscore").alias("m")).collect()
    )
    for r in means:
        assert abs(r.m) < 1e-3


def test_boilerplate_scrub_segment_math(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import textops

    docs = load_table(spark, sf_dir, "documents")
    out = textops.boilerplate_scrub(docs)
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n_tok"),
    )
    joined = out.join(toks, "doc_id").collect()
    assert len(joined) == docs.count()
    w = textops.BOILER_SEG_TOKENS
    any_boiler = any_clean = 0
    for r in joined:
        assert r.n_segments == (r.n_tok + w - 1) // w
        assert 0 <= r.n_boiler_segments <= r.n_segments
        assert r.clean_n_tokens <= r.n_tok
        if r.n_boiler_segments:
            any_boiler += 1
            assert r.clean_n_tokens < r.n_tok
        else:
            any_clean += 1
            assert r.clean_n_tokens == r.n_tok
    # the fixture must exercise both classes for the op to mean anything
    assert any_boiler > 0 and any_clean > 0


def test_quality_deciles_partition_and_order(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import textops

    docs = load_table(spark, sf_dir, "documents")
    rows = sorted(
        textops.quality_decile_report(docs).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, len(rows) + 1))
    assert sum(r.n_docs for r in rows) == docs.count()
    for a, b in zip(rows, rows[1:]):
        assert a.max_score <= b.min_score, "decile score bands must not overlap"


def test_rp_projection_preserves_geometry(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    proj = similarity.rp_project(emb)
    assert proj.count() == emb.count()
    # JL norm preservation: E[|y|^2] = |x|^2; corpus mean ratio near 1
    sq = sum(F.col(f"rp_{k}") * F.col(f"rp_{k}") for k in range(similarity.RP_DIM))
    xn = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda a, v: a + v * v,
    )
    r = (
        proj.join(emb.select("vec_id", "embedding"), "vec_id")
        .select((sq / xn).alias("ratio"))
        .agg(F.avg("ratio").alias("m"))
        .collect()[0]
    )
    assert 0.7 < r.m < 1.3, f"mean squared-norm ratio {r.m} outside JL band"
    # projected space must retain real neighborhood signal
    rec = similarity.rp_recall_report(emb).collect()
    assert len(rec) == similarity.N_QUERIES
    mean_recall = sum(x.recall_ppm for x in rec) / len(rec)
    assert mean_recall > 0, "JL projection lost all neighborhood structure"


def test_media_phash_locality_and_banding(spark):
    from real_time_mobility_heatmap_spark.operators import multimodal

    base = "x" * 300
    edited = base[:200] + "Q" + base[201:]  # single-byte edit, same length
    docs = spark.createDataFrame(
        [(1, base, "en", "src00001", 300), (2, edited, "en", "src00001", 300),
         (3, "totally different words " * 20, "en", "src00002", 480)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    ph = {r.doc_id: r.phash for r in multimodal.media_phash(docs).collect()}
    x = ph[1] ^ ph[2]
    flipped = sum(1 for i in range(multimodal.PHASH_REGIONS) if (x >> (4 * i)) & 15)
    assert flipped <= 1, "single-byte edit must flip at most its own region nibble"
    pairs = {(r.doc_a, r.doc_b): r for r in multimodal.media_phash_pairs(docs).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)].is_near
    assert pairs[(1, 2)].nibble_dist == flipped


def test_bloom_semijoin_prunes_and_preserves(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import relational

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    out = {
        (r.l_returnflag, r.l_linestatus): r
        for r in relational.bloom_semijoin_stats(orders, lineitem).collect()
    }
    # exactness: identical to the plain join (no-bloom twin)
    plain = (
        lineitem.join(
            orders.filter(
                (F.col("o_orderpriority") == relational.BSJ_PRIORITY)
                & (F.col("o_orderdate") >= F.lit(relational.BSJ_DATE_LO).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(relational.BSJ_DATE_HI).cast("timestamp"))
            ).select("o_orderkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        )
        .collect()
    )
    assert len(plain) == len(out)
    for r in plain:
        got = out[(r.l_returnflag, r.l_linestatus)]
        assert got.n_items == r.n_items and got.sum_qty == r.sum_qty
    # the filter must actually prune: joined rows << fact rows means the
    # bloom pass admits far less than the full table (FP rate + true rate)
    n_fact = lineitem.count()
    n_joined = sum(r.n_items for r in plain)
    assert n_joined < n_fact * 0.10, "dim filter lost its selectivity"


def test_dq_expectations_rules(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import relational

    out = {
        r.rule: r
        for r in relational.dq_expectations(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "customer"),
        ).collect()
    }
    assert len(out) == 7
    for r in out.values():
        assert 0 <= r.n_violations <= r.n_checked
        assert r.violation_ppm == r.n_violations * 1_000_000 // r.n_checked
    # referential integrity holds in the generated star schema
    assert out["lineitem_orphan_orderkey"].n_violations == 0
    assert out["orders_orphan_custkey"].n_violations == 0


def test_rollup_delta_merge_touched_set(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import tiles
    from real_time_mobility_heatmap_spark.sources.tables import pings_from_events

    out = tiles.rollup_delta_merge(pings_from_events(spark, sf_dir)).collect()
    touched = [r for r in out if r.n_delta_pings > 0]
    untouched = [r for r in out if r.n_delta_pings == 0]
    assert touched and untouched, "cutoff must split the bucket space"
    for r in out:
        assert 0 <= r.n_delta_pings <= r.n_pings


def test_modality_agreement_report(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import dedup, similarity

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.modality_agreement_report(docs, emb).collect()
    n_pairs = dedup.ngram_jaccard_pairs(docs).count()
    assert len(out) == n_pairs and n_pairs > 0
    for r in out:
        assert r.jaccard >= dedup.JACCARD_THRESHOLD
        assert -1.0 <= r.cosine <= 1.0
        assert r.semantic_agrees == (r.cosine >= similarity.NEARDUP_COS)


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    edges = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs).select("doc_a", "doc_b").collect()
    }
    expect = {}
    for a, b in edges:
        expect.setdefault(a, 0)
        expect.setdefault(b, 0)
    for a, b in edges:
        for c, d in edges:
            if c == b and (a, d) in edges:  # a<b<c triangle
                for n in (a, b, d):
                    expect[n] += 1
    got = {r.doc_id: r.n_triangles for r in dedup.triangle_count(docs).collect()}
    assert got == expect


def test_range_frame_vs_rows_frame(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import relational

    events = load_table(spark, sf_dir, "events")
    out = relational.range_frame_speed(events)
    assert out.count() == events.count()
    rows = out.filter("n_events_10m >= 2").count()
    assert rows > 0, "frame must span multiple events somewhere"


def test_order_rank_report_bounds(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import relational

    orders = load_table(spark, sf_dir, "orders")
    out = relational.order_rank_report(orders).collect()
    assert len(out) == orders.count()
    for r in out:
        assert 0.0 <= r.pct_rank <= 1.0
        assert 0.0 < r.cume_dist <= 1.0
        assert 1 <= r.quartile <= 4


def test_bpe_merge_round_statistics(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import textops

    docs = load_table(spark, sf_dir, "documents")
    rows = textops.bpe_merge_round(docs).collect()
    assert 0 < len(rows) <= textops.BPE_TOP
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
        range(1, len(rows) + 1)
    )
    counts = [r.pair_count for r in sorted(rows, key=lambda r: r.rank)]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r.pair) == 2 for r in rows)


def test_cms_never_underestimates(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import textops

    docs = load_table(spark, sf_dir, "documents")
    rows = textops.cms_token_counts(docs).collect()
    assert rows
    for r in rows:
        assert r.cms_n >= r.exact_n, "CMS must never undercount"
        assert r.overestimate_ppm >= 0


def test_leakage_safe_split_never_splits_a_cluster(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    out = dedup.leakage_safe_split(docs)
    assert out.count() == docs.count()
    # the guarantee: one split per cluster
    viol = (
        out.filter("is_clustered")
        .groupBy("group_key")
        .agg(F.countDistinct("split").alias("n"))
        .filter("n > 1")
        .count()
    )
    assert viol == 0
    # clustered docs exist in the fixture, and all three splits appear
    assert out.filter("is_clustered").count() > 0
    assert {r.split for r in out.select("split").distinct().collect()} == {
        "train", "val", "test"
    }


def test_compaction_plan_bins_are_target_sized(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import spatial

    li = load_table(spark, sf_dir, "lineitem")
    out = spatial.compaction_plan(li).collect()
    assert sum(r.n_rows for r in out) == li.count(), "plan must cover every row"
    bins = {}
    for r in out:
        bins.setdefault(r.bin_id, []).append(r)
    for bid, files in bins.items():
        total = sum(f.n_rows for f in files)
        assert all(f.bin_rows == total for f in files)
        assert all(f.n_bin_files == len(files) for f in files)
        # sorted-fill property: a bin overshoots the target by at most
        # its last file, so bin start stays under the target
        assert total - max(f.n_rows for f in files) < spatial.COMPACT_TARGET_ROWS
    # compaction actually compacts: fewer bins than files
    assert len(bins) < len(out)


def test_similar_speed_profiles_topk(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import trajectory

    events = load_table(spark, sf_dir, "events")
    out = trajectory.similar_speed_profiles(events).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_user, []).append(r)
    assert set(by_q) == set(range(trajectory.TS_N_QUERIES))
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, trajectory.TS_TOP_K + 1))
        dists = [r.dist for r in rows]
        assert dists == sorted(dists)
        assert all(r.cand_user != q and r.dist >= 0 for r in rows)


def test_ewma_matches_sequential_fold(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import analytics

    events = load_table(spark, sf_dir, "events")
    got = {r.user_id: r for r in analytics.ewma_speed(events).collect()}
    rows = events.select("user_id", "ts", "event_id", "value").collect()
    seqs = {}
    for r in sorted(rows, key=lambda r: (r.ts, r.event_id)):
        seqs.setdefault(r.user_id, []).append(r.value)
    assert set(got) == set(seqs)
    for uid, vals in seqs.items():
        acc = vals[0]
        for x in vals[1:]:
            acc = acc / 2.0 + x / 2.0
        assert got[uid].n_events == len(vals)
        assert got[uid].last_value == vals[-1]
        assert abs(got[uid].ewma - round(acc, 6)) < 1e-9


def test_k_anonymity_report_accounting(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import relational

    cust = load_table(spark, sf_dir, "customer")
    rows = relational.k_anonymity_report(cust).collect()
    assert sum(r.group_size for r in rows) == cust.count()
    risky = sum(r.group_size for r in rows if r.below_k)
    total = sum(r.group_size for r in rows)
    expect_ppm = risky * 1_000_000 // total
    assert {r.corpus_risky_ppm for r in rows} == {expect_ppm}
    for r in rows:
        assert r.below_k == (r.group_size < relational.K_ANON_THRESHOLD)


def test_join_size_estimate_exact_on_pk_fk(spark, sf_dir):
    """On a PK-FK join (orders.o_orderkey unique), the System-R bucket
    estimate collapses to the true size: ndv_a == ca per bucket, so
    ca*cb/max(ndv) == cb summed == |join|. A skewed/duplicated key side
    would surface as nonzero err_ppm."""
    from real_time_mobility_heatmap_spark.operators import relational

    r = relational.join_size_estimate(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    ).first()
    assert r.actual_rows == load_table(spark, sf_dir, "lineitem").count()
    assert r.err_ppm == 0 and r.est_rows == r.actual_rows


def test_polygon_containment_is_subset_of_bbox(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import spatial
    from real_time_mobility_heatmap_spark.sources.tables import pings_from_events

    pings = pings_from_events(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    box = {r.zone_key: r.n_pings for r in spatial.zone_counts(pings, nation).collect()}
    poly = {
        r.zone_key: r.n_pings
        for r in spatial.polygon_zone_counts(pings, nation).collect()
    }
    assert poly, "pentagons must contain some points"
    for zk, n in poly.items():
        assert 0 < n < box[zk], "pentagon ⊂ bbox must hold strictly on this data"
    # pentagon covers ~66% of the bbox area; containment counts should
    # land in a broad band around that, confirming the cast is real
    frac = sum(poly.values()) / sum(box[z] for z in poly)
    assert 0.4 < frac < 0.9


def test_grouping_sets_levels(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import relational

    li = load_table(spark, sf_dir, "lineitem")
    rows = relational.grouping_sets_sales(li).collect()
    by_level = {}
    for r in rows:
        by_level.setdefault(r.level_id, []).append(r)
    # level 0 = (flag,status); 1 = per-flag (status grouped); 2 = per-status
    assert set(by_level) == {0, 1, 2}
    total = li.count()
    assert sum(r.n_items for r in by_level[1]) == total
    assert sum(r.n_items for r in by_level[2]) == total
    assert sum(r.n_items for r in by_level[0]) == total
    assert all(r.l_linestatus is None for r in by_level[1])
    assert all(r.l_returnflag is None for r in by_level[2])


def test_props_key_stats_covers_all_events(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import decode

    events = load_table(spark, sf_dir, "events")
    rows = decode.props_key_stats(events).collect()
    assert rows
    assert sum(r.n_events for r in rows) == events.filter(
        "props IS NOT NULL"
    ).count()
    for r in rows:
        assert r.min_value <= r.max_value


def test_snapshot_diff_classes_account_for_both_versions(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import relational

    li = load_table(spark, sf_dir, "lineitem")
    out = {r.diff_class: r.n_rows for r in relational.snapshot_diff_report(li).collect()}
    assert set(out) == {"added", "removed", "changed", "unchanged"}
    n_old = li.select("l_orderkey", "l_linenumber").distinct().count()
    # every old key is removed, changed, or unchanged
    assert out["removed"] + out["changed"] + out["unchanged"] == n_old
    # derivation rates: ~2% changed, ~2% removed, ~1% added of the corpus
    assert 0.005 < out["changed"] / n_old < 0.05
    assert 0.005 < out["removed"] / n_old < 0.05
    assert 0.001 < out["added"] / n_old < 0.03


def test_mad_outliers_is_robust_where_zscore_is_not(spark):
    """The point of MAD: one extreme reading must not change the
    flag threshold. Injecting a 1e9 value into a type leaves every
    OTHER row's flagged/unflagged status identical (median and MAD move
    by at most one rank), while the extreme row itself flags."""
    from real_time_mobility_heatmap_spark.operators.analytics import mad_outliers
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    events = load_table(spark, sf_dir, "events")
    base = {r["event_id"] for r in mad_outliers(events).collect()}

    poison = spark.createDataFrame(
        [(10**12, events.select("ts").first()["ts"], 1, "click", 1e9, None)],
        events.schema,
    )
    spiked = mad_outliers(events.unionByName(poison)).collect()
    spiked_ids = {r["event_id"] for r in spiked}
    assert 10**12 in spiked_ids, "the injected extreme must flag"
    others = spiked_ids - {10**12}
    # at most a handful of boundary rows may shift by the one-rank move
    assert len(others ^ base) <= len(base) * 0.02 + 2


def test_percentile_disc_exact_matches_builtin(spark, sf_dir):
    """The distributed exact-percentile reformulation (r8 verdict item
    #3) must be value-identical to Spark's built-in percentile_disc —
    grouped on a continuous double column AND global on an integer
    column, across every dyadic p the repo uses."""
    from real_time_mobility_heatmap_spark.functions.percentiles import (
        percentile_disc_exact,
    )

    events = load_table(spark, sf_dir, "events")
    got = {
        r["event_type"]: (r["p50"], r["p25"])
        for r in percentile_disc_exact(
            events, ["event_type"], "value", [0.5, 0.25], ["p50", "p25"]
        ).collect()
    }
    want = {
        r["event_type"]: (r["p50"], r["p25"])
        for r in events.groupBy("event_type")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
            F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").alias("p25"),
        )
        .collect()
    }
    assert got == want

    docs = load_table(spark, sf_dir, "documents")
    qs = [i / 8 for i in range(1, 8)]
    got_g = percentile_disc_exact(
        docs, [], "n_chars", qs, [f"b{i}" for i in range(7)]
    ).collect()[0]
    want_g = docs.agg(
        *[
            F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY n_chars)").alias(
                f"b{i}"
            )
            for i, q in enumerate(qs)
        ]
    ).collect()[0]
    assert tuple(got_g) == tuple(want_g)


def test_percentile_disc_exact_null_groups_and_p0(spark):
    """r9 advice #1/#3: an all-NULL group must still emit its row (with a
    NULL percentile, like the built-in), NULLs inside a mixed group are
    ignored, and p=0 is accepted and returns the group minimum."""
    from real_time_mobility_heatmap_spark.functions.percentiles import (
        percentile_disc_exact,
    )

    df = spark.createDataFrame(
        [("a", 3.0), ("a", 1.0), ("a", None), ("b", None), ("b", None), ("c", 7.0)],
        "k string, v double",
    )
    got = {
        r["k"]: (r["p0"], r["p50"])
        for r in percentile_disc_exact(df, ["k"], "v", [0.0, 0.5], ["p0", "p50"]).collect()
    }
    want = {
        r["k"]: (r["p0"], r["p50"])
        for r in df.groupBy("k")
        .agg(
            F.expr("percentile_disc(0.0) WITHIN GROUP (ORDER BY v)").alias("p0"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").alias("p50"),
        )
        .collect()
    }
    assert got == want == {"a": (1.0, 1.0), "b": (None, None), "c": (7.0, 7.0)}


def test_rfm_segments_scores_and_exact_cents(spark):
    import datetime as dt

    from real_time_mobility_heatmap_spark.operators.analytics import rfm_segments

    rows = [
        # cust 1: 3 orders, most recent, biggest spend
        (1, 1, "O", 100.10, dt.date(2024, 3, 1), "1-URGENT"),
        (2, 1, "O", 200.20, dt.date(2024, 2, 1), "1-URGENT"),
        (3, 1, "O", 0.03, dt.date(2024, 1, 1), "1-URGENT"),
        # cust 2: 1 old cheap order
        (4, 2, "O", 10.00, dt.date(2023, 1, 1), "1-URGENT"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    out = {r["o_custkey"]: r for r in rfm_segments(df).collect()}
    assert out[1]["recency_days"] == 0 and out[2]["recency_days"] == 425
    assert out[1]["frequency"] == 3
    assert out[1]["monetary"] == 300.33  # exact cents, no float drift
    assert out[1]["r_score"] < out[2]["r_score"]  # cust1 more recent
    assert out[1]["m_score"] < out[2]["m_score"]  # cust1 higher spend


def test_copurchase_affinity_support_and_lift(spark):
    from real_time_mobility_heatmap_spark.operators.analytics import (
        copurchase_affinity,
    )

    # parts 10+20 co-occur in 2 of 4 orders; 10+30 only once (below
    # min support); duplicate line rows must not inflate support
    rows = [
        (1, 10), (1, 10), (1, 20),
        (2, 10), (2, 20),
        (3, 10), (3, 30),
        (4, 40),
    ]
    df = spark.createDataFrame(
        [(ok, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None) for ok, pk in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate date",
    )
    out = copurchase_affinity(df).collect()
    assert len(out) == 1
    (r,) = out
    assert (r["part_a"], r["part_b"]) == (10, 20)
    assert r["support_orders"] == 2
    assert r["support_ppm"] == 500_000  # 2 of 4 orders
    # lift two-step at ppb inner scale: ((2e9 div 3) * 4 div 2) div 1000
    # = 1_333_333 (exact 4/3 ppm-rounded; truncation < 1 ppm)
    assert r["lift_ppm"] == 1_333_333


def test_autocorrelation_perfect_alternation_and_null_guard(spark):
    """An exactly alternating 1/3 hourly series: every lag-1 pair obeys
    y = 4 - x (acf == -1.0 bit-exactly: the sums are small ints and the
    denominator is a perfect square), every lag-2 pair y = x (+1.0);
    a constant series has zero variance -> NULL acf, and the relation
    is total (empty) on an empty event set."""
    import datetime as dt
    from pyspark.sql import Row

    def hour_rows(counts):
        base = dt.datetime(2024, 1, 1)
        rows = []
        for h, c in enumerate(counts):
            for j in range(c):
                rows.append(Row(ts=base + dt.timedelta(hours=h, minutes=j)))
        return spark.createDataFrame(rows, "ts timestamp")

    out = {
        r["lag"]: r
        for r in analytics.autocorrelation_report(
            hour_rows([1, 3, 1, 3, 1, 3, 1, 3])
        ).collect()
    }
    assert out[1]["n_pairs"] == 7 and out[1]["acf"] == -1.0
    assert out[2]["n_pairs"] == 6 and out[2]["acf"] == 1.0
    assert out[6]["n_pairs"] == 2 and out[6]["acf"] == 1.0

    const = {
        r["lag"]: r["acf"]
        for r in analytics.autocorrelation_report(hour_rows([2] * 8)).collect()
    }
    assert set(const) == {1, 2, 3, 4, 5, 6} and all(v is None for v in const.values())

    empty = analytics.autocorrelation_report(
        spark.createDataFrame([], "ts timestamp")
    )
    assert empty.columns == ["lag", "n_pairs", "acf"] and empty.count() == 0


def test_autocorrelation_gap_hours_pair_only_existing(spark):
    """A missing hour drops exactly the pairs that would touch it: the
    series join is on hour_id, so gaps never fabricate zero-count rows
    (tile_gap_fill is the operator that DOES build a spine)."""
    import datetime as dt
    from pyspark.sql import Row

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in (0, 1, 3, 4):  # hour 2 missing
        for j in range(2 + (h % 2)):
            rows.append(Row(ts=base + dt.timedelta(hours=h, minutes=j)))
    out = {
        r["lag"]: r["n_pairs"]
        for r in analytics.autocorrelation_report(
            spark.createDataFrame(rows, "ts timestamp")
        ).collect()
    }
    # present hours {0,1,3,4}: lag-1 pairs (0,1),(3,4); lag-2 only (1,3);
    # lag-3 (0,3),(1,4); lag-4 (0,4); lags 5-6 have no pairs at all
    assert out[1] == 2 and out[2] == 1 and out[3] == 2 and out[4] == 1
    assert 5 not in out and 6 not in out


def test_l_diversity_report_accounting(spark, sf_dir):
    """Row accounting mirrors the k-report; l_distinct is bounded by the
    group size, below_l tracks the floor exactly, and a constructed
    single-balance group is flagged while a 3-bucket group is not."""
    from decimal import Decimal

    from real_time_mobility_heatmap_spark.operators import relational

    cust = load_table(spark, sf_dir, "customer")
    rows = relational.l_diversity_report(cust).collect()
    assert sum(r.group_size for r in rows) == cust.count()
    under = sum(r.group_size for r in rows if r.below_l)
    total = sum(r.group_size for r in rows)
    assert {r.corpus_underdiverse_ppm for r in rows} == {under * 1_000_000 // total}
    for r in rows:
        assert 1 <= r.l_distinct <= r.group_size
        assert r.below_l == (r.l_distinct < relational.L_DIVERSITY)

    tiny = spark.createDataFrame(
        # group (1, A): five rows, one balance bucket -> k-anonymous yet
        # underdiverse; group (2, B): three distinct thousand-buckets -> ok;
        # the -999.99 row pins the negative-balance bucket floor/trunc parity
        [(1, "A", Decimal("500.00"))] * 5
        + [
            (2, "B", Decimal("-999.99")),
            (2, "B", Decimal("1500.00")),
            (2, "B", Decimal("2500.00")),
        ],
        "c_nationkey long, c_mktsegment string, c_acctbal decimal(15,2)",
    )
    got = {
        (r.c_nationkey, r.c_mktsegment): r
        for r in relational.l_diversity_report(tiny).collect()
    }
    assert got[(1, "A")].l_distinct == 1 and got[(1, "A")].below_l
    assert got[(2, "B")].l_distinct == 3 and not got[(2, "B")].below_l
    assert got[(1, "A")].corpus_underdiverse_ppm == 5 * 1_000_000 // 8
