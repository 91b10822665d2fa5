"""Property-based tests (hypothesis) for the sink-merge contracts — the
invariants the streaming exactly-once story rests on (SURVEY.md ST6),
checked against randomized batch sequences rather than hand-picked
examples. Example counts are small: each example runs real Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from real_time_mobility_heatmap_spark.streaming.sinks import KeyedParquetStore

KEYS = st.sampled_from(["a", "b", "c"])
BATCH = st.lists(st.tuples(KEYS, st.integers(0, 9), st.integers(0, 99)), min_size=1, max_size=6)
SEQ = st.lists(BATCH, min_size=1, max_size=3)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, ts int, v int")


@given(seq=SEQ)
@_SETTINGS
def test_conditional_merge_keeps_per_key_ts_max_regardless_of_batching(spark, tmp_path_factory, seq):
    """However the rows are split into micro-batches and whatever their
    order, the conditional store ends at each key's max-ts row (stored
    row wins ties - the S5 monotonic guard)."""
    store = KeyedParquetStore(
        str(tmp_path_factory.mktemp("prop")), key_cols=["k"], newer_col="ts", n_buckets=4
    )
    for batch in seq:
        store.merge(_df(spark, batch))

    # model: first-seen row among those with the max ts per key, in merge
    # order (incoming only beats stored when STRICTLY newer). Within one
    # batch the argmax picks __stored desc... incoming batch rows tie-break
    # by the row_number order; restrict the model to unique (k, ts) rows to
    # keep it deterministic.
    rows = [r for batch in seq for r in batch]
    seen_ts = {}
    for k, ts, v in rows:
        cur = seen_ts.get(k)
        if cur is None or ts > cur[0]:
            seen_ts[k] = (ts, v)
    got = {r["k"]: r["ts"] for r in store.read(spark).collect()}
    want = {k: ts for k, (ts, _v) in seen_ts.items()}
    assert got == want


@given(batch=BATCH)
@_SETTINGS
def test_merge_is_idempotent_under_replay(spark, tmp_path_factory, batch):
    """merge(batch); merge(batch) == merge(batch) for both merge modes."""
    for newer in (None, "ts"):
        store = KeyedParquetStore(
            str(tmp_path_factory.mktemp("prop")), key_cols=["k", "ts"], newer_col=newer, n_buckets=4
        )
        df = _df(spark, batch)
        store.merge(df)
        once = sorted(map(tuple, store.read(spark).collect()))
        store.merge(df)
        twice = sorted(map(tuple, store.read(spark).collect()))
        assert once == twice


WIDE_KEYS = st.sampled_from([f"k{i}" for i in range(12)])
WIDE_BATCH = st.lists(
    st.tuples(WIDE_KEYS, st.integers(0, 9), st.integers(0, 99)),
    min_size=1,
    max_size=10,
)
WIDE_SEQ = st.lists(WIDE_BATCH, min_size=2, max_size=4)


def test_store_rejects_driver_unsafe_bucket_counts(tmp_path):
    """merge()/delete() collect touched-bucket ids to the driver, so the
    bucket count must be bounded at CONSTRUCTION — a misconfigured
    n_buckets should fail fast, not OOM the driver mid-stream."""
    import pytest

    for bad in (0, -1, KeyedParquetStore.MAX_BUCKETS + 1):
        with pytest.raises(ValueError, match="n_buckets"):
            KeyedParquetStore(str(tmp_path / "s"), key_cols=["k"], n_buckets=bad)
    # boundary values construct fine
    KeyedParquetStore(str(tmp_path / "a"), key_cols=["k"], n_buckets=1)
    KeyedParquetStore(
        str(tmp_path / "b"), key_cols=["k"], n_buckets=KeyedParquetStore.MAX_BUCKETS
    )


@given(seq=WIDE_SEQ, n_buckets=st.sampled_from([1, 2]))
@_SETTINGS
def test_merge_under_bucket_collision_pressure(
    spark, tmp_path_factory, seq, n_buckets
):
    """n_buckets far below the key count forces every merge to rewrite
    buckets holding MANY unrelated keys (the SCALE.md Delta-mapping
    claim's stress case): colliding keys must never clobber each other,
    the end state must equal the dict-model replay, and with
    retain_versions > 1 a reader pinned to an old snapshot must survive
    subsequent merges of the same buckets."""
    store = KeyedParquetStore(
        str(tmp_path_factory.mktemp("prop")),
        key_cols=["k"],
        newer_col=None,
        n_buckets=n_buckets,
        retain_versions=2,
    )
    snapshots = []  # (version, model-at-that-version)
    model: dict[str, tuple[int, int]] = {}
    for batch in seq:
        # last-writer-wins within a batch follows row_number over
        # __stored only, which is nondeterministic among same-key rows of
        # one batch — keep one row per key per batch to keep the model exact
        dedup = {k: (k, ts, v) for k, ts, v in batch}
        store.merge(_df(spark, list(dedup.values())))
        for k, ts, v in dedup.values():
            model[k] = (ts, v)
        snapshots.append((store.versions()[-1], dict(model)))

    got = {r["k"]: (r["ts"], r["v"]) for r in store.read(spark).collect()}
    assert got == model
    # every RETAINED snapshot still reads back exactly its historical state,
    # even though later merges rewrote the same (colliding) buckets
    retained = set(store.versions())
    for version, state in snapshots:
        if version in retained:
            old = {
                r["k"]: (r["ts"], r["v"])
                for r in store.read(spark, version=version).collect()
            }
            assert old == state, f"snapshot v{version} corrupted by later merges"
    # vacuum must be a no-op on referenced dirs: state unchanged after it
    store.vacuum()
    assert {
        r["k"]: (r["ts"], r["v"]) for r in store.read(spark).collect()
    } == model


TEXTS = st.lists(
    st.text(alphabet="ab cd", min_size=1, max_size=30).filter(lambda t: t.strip()),
    min_size=1,
    max_size=8,
)


@given(texts=TEXTS)
@_SETTINGS
def test_pack_sequences_layout_is_gapless_for_any_corpus(spark, texts):
    """For ANY document set: per shard, token spans tile [0, total) with
    no gaps or overlaps, and pack ids/offsets are consistent with the
    span arithmetic."""
    from real_time_mobility_heatmap_spark.operators.textops import SEQ_LEN, pack_sequences

    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = pack_sequences(docs).collect()
    assert len(out) == len(texts)
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for rows_ in by_shard.values():
        rows_.sort(key=lambda r: r["tok_start"])
        pos = 0
        for r in rows_:
            assert r["tok_start"] == pos
            assert r["pack_offset"] == pos % SEQ_LEN
            assert r["first_pack"] == pos // SEQ_LEN
            assert r["last_pack"] == (pos + r["n_tokens"] - 1) // SEQ_LEN
            pos += r["n_tokens"]


@given(
    counts=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=4)
)
@_SETTINGS
def test_mixture_sample_rate_is_exact_ppm_of_source_size(spark, counts):
    """Rates are exactly min(1e6, target*1e6 // n_source) for ANY source
    size mix, and every row of a source carries the same rate."""
    from real_time_mobility_heatmap_spark.operators.textops import (
        MIX_TARGET_PER_SOURCE,
        mixture_sample,
    )

    rows, did = [], 0
    for s, n in enumerate(counts):
        for _ in range(n):
            rows.append((did, f"t {did}", "en", f"s{s}", 4))
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = mixture_sample(docs).collect()
    assert len(out) == did
    for r in out:
        n = counts[int(r["source"][1:])]
        assert r["n_source"] == n
        assert r["rate_ppm"] == min(1_000_000, MIX_TARGET_PER_SOURCE * 1_000_000 // n)


@given(n_tokens=st.lists(st.integers(1, 400), min_size=1, max_size=4))
@_SETTINGS
def test_chunk_documents_layout_invariants(spark, n_tokens):
    """For any document length: chunk starts advance by exactly the
    stride; every token index is covered; only the final chunk may be
    shorter than the window; chunk count matches the exact ceil formula."""
    from real_time_mobility_heatmap_spark.operators.textops import (
        CHUNK_OVERLAP,
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"t{j}" for j in range(n)), "en", f"s{i}", n)
            for i, n in enumerate(n_tokens)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    by_doc = {}
    for r in chunk_documents(docs).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)

    for i, n in enumerate(n_tokens):
        chunks = sorted(by_doc[i], key=lambda c: c["chunk_no"])
        expected = (max(n - CHUNK_OVERLAP, 1) + CHUNK_STRIDE - 1) // CHUNK_STRIDE
        assert len(chunks) == expected, (n, len(chunks))
        assert [c["chunk_start"] for c in chunks] == [
            k * CHUNK_STRIDE for k in range(expected)
        ]
        # full windows everywhere except possibly the last
        for c in chunks[:-1]:
            assert c["n_chunk_tokens"] == CHUNK_TOKENS
        last = chunks[-1]
        assert last["chunk_start"] + last["n_chunk_tokens"] == n  # covers the tail
        assert 1 <= last["n_chunk_tokens"] <= CHUNK_TOKENS


VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]
DOC_TOKENS = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=40)
CORPUS = st.lists(DOC_TOKENS, min_size=1, max_size=8)


@given(corpus=CORPUS)
@_SETTINGS
def test_boilerplate_scrub_reconstruction_property(spark, corpus):
    """For ANY corpus, the scrubbed text equals the in-order join of the
    doc's non-boilerplate segments (boilerplate = segment text occurring
    in >= BOILER_MIN_DF distinct docs), and the token accounting is
    exact. The tiny vocabulary forces heavy cross-doc segment collisions,
    exercising the boiler path hypothesis-style."""
    import hashlib

    from real_time_mobility_heatmap_spark.operators import textops

    w = textops.BOILER_SEG_TOKENS
    docs = spark.createDataFrame(
        [(i, " ".join(toks), "en", "src", len(" ".join(toks)))
         for i, toks in enumerate(corpus)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    seg_docs = {}
    per_doc_segs = []
    for i, toks in enumerate(corpus):
        segs = [" ".join(toks[j * w:(j + 1) * w]) for j in range((len(toks) + w - 1) // w)]
        per_doc_segs.append(segs)
        for s in set(segs):
            seg_docs.setdefault(s, set()).add(i)
    out = {r.doc_id: r for r in textops.boilerplate_scrub(docs).collect()}
    for i, toks in enumerate(corpus):
        segs = per_doc_segs[i]
        kept = [s for s in segs if len(seg_docs[s]) < textops.BOILER_MIN_DF]
        clean = " ".join(kept)
        r = out[i]
        assert r.n_segments == len(segs)
        assert r.n_boiler_segments == len(segs) - len(kept)
        assert r.clean_n_tokens == (len(clean.split()) if clean else 0)
        assert r.clean_sha256 == hashlib.sha256(clean.encode()).hexdigest()


DEL_KEYS = st.lists(KEYS, min_size=0, max_size=3, unique=True)


@given(batch=BATCH, to_delete=DEL_KEYS)
@_SETTINGS
def test_delete_purges_exactly_the_requested_keys(spark, tmp_path_factory, batch, to_delete):
    """delete() removes all rows of the requested keys and nothing else,
    drops fully-emptied buckets from the manifest, and is idempotent."""
    store = KeyedParquetStore(
        str(tmp_path_factory.mktemp("del")), key_cols=["k"], newer_col="ts", n_buckets=2
    )
    store.merge(_df(spark, batch))
    before = {r["k"]: r for r in store.read(spark).collect()}
    kdf = spark.createDataFrame([(k,) for k in to_delete] or [("zz",)], "k string")
    store.delete(kdf)
    snap = store.read(spark)
    after = {} if snap is None else {r["k"]: r for r in snap.collect()}
    assert set(after) == set(before) - set(to_delete)
    for k, row in after.items():
        assert row == before[k], "survivors must be byte-identical"
    # idempotent second delete
    store.delete(kdf)
    snap2 = store.read(spark)
    after2 = {} if snap2 is None else {r["k"]: r for r in snap2.collect()}
    assert after2 == after


# ---- repeated_span_report differential property ------------------------

TOKENS_ALPHABET = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
DOC_TEXT = st.lists(
    st.sampled_from(TOKENS_ALPHABET), min_size=0, max_size=30
).map(" ".join)
CORPUS = st.lists(DOC_TEXT, min_size=2, max_size=6)


def _ref_spans(texts):
    """Brute-force O(n_docs² · len²) reference of repeated_span_report's
    semantics: 5-token grams, DF in [2, SPAN_DF_CAP] distinct docs,
    distinct position matches, maximal consecutive runs per (pair,
    diagonal), span >= MIN_SPAN_TOKENS."""
    from real_time_mobility_heatmap_spark.operators.dedup import (
        K_SPAN,
        MIN_SPAN_TOKENS,
        SPAN_DF_CAP,
    )

    grams = {}  # doc -> list[(pos, gram)]
    for d, t in texts.items():
        toks = t.lower().strip().split()
        grams[d] = [
            (i, " ".join(toks[i : i + K_SPAN]))
            for i in range(max(0, len(toks) - K_SPAN + 1))
        ]
    df = {}
    for d, lst in grams.items():
        for g in {g for _, g in lst}:
            df[g] = df.get(g, 0) + 1
    ok = {g for g, n in df.items() if 2 <= n <= SPAN_DF_CAP}
    spans = set()
    docs = sorted(grams)
    for ai, a in enumerate(docs):
        for b in docs[ai + 1 :]:
            matches = {
                (pa, pb)
                for pa, ga in grams[a]
                for pb, gb in grams[b]
                if ga == gb and ga in ok
            }
            by_diag = {}
            for pa, pb in matches:
                by_diag.setdefault(pa - pb, set()).add(pa)
            for diag, pas in by_diag.items():
                run = []
                for p in sorted(pas) + [None]:
                    if run and (p is None or p != run[-1] + 1):
                        if len(run) + K_SPAN - 1 >= MIN_SPAN_TOKENS:
                            spans.add(
                                (a, b, run[0], run[0] - diag, len(run) + K_SPAN - 1)
                            )
                        run = []
                    if p is not None:
                        run.append(p)
    return spans


@given(corpus=CORPUS)
@_SETTINGS
def test_repeated_span_report_matches_bruteforce(spark, corpus):
    """Differential check on random tiny corpora from a 6-token alphabet
    (high gram-collision pressure): the distributed gaps-and-islands
    implementation must emit exactly the brute-force span set."""
    from real_time_mobility_heatmap_spark.operators.dedup import repeated_span_report

    texts = {i: t for i, t in enumerate(corpus)}
    docs = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["span_tokens"])
        for r in repeated_span_report(docs).collect()
    }
    assert got == _ref_spans(texts)


PCT_VALS = st.lists(
    st.one_of(st.none(), st.integers(-5, 5).map(float)), min_size=1, max_size=12
)


@given(
    groups=st.dictionaries(
        st.sampled_from(["g1", "g2", "g3"]), PCT_VALS, min_size=1, max_size=3
    ),
    ps=st.lists(
        st.sampled_from([0.0, 0.125, 0.25, 0.5, 0.75, 0.875, 1.0]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
@_SETTINGS
def test_percentile_disc_exact_equals_builtin_on_random_groups(spark, groups, ps):
    """Differential check for the distributed exact-percentile rewrite
    (functions/percentiles.py) on randomized groups with duplicate values
    and NULLs — including ALL-NULL groups (which must emit a NULL row,
    the r9 advice #1 fix) and p in {0, 1} — against Spark's built-in
    percentile_disc at every dyadic p the repo's call sites use."""
    from real_time_mobility_heatmap_spark.functions.percentiles import (
        percentile_disc_exact,
    )
    from pyspark.sql import functions as F

    rows = [(k, v) for k, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "k string, v double")
    aliases = [f"p{i}" for i in range(len(ps))]
    got = {
        r["k"]: tuple(r[a] for a in aliases)
        for r in percentile_disc_exact(df, ["k"], "v", ps, aliases).collect()
    }
    want = {
        r["k"]: tuple(r[a] for a in aliases)
        for r in df.groupBy("k")
        .agg(
            *[
                F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY v)").alias(a)
                for p, a in zip(ps, aliases)
            ]
        )
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# movement-flow invariants (operators/flows.py)
# ---------------------------------------------------------------------------

import datetime as _dt

from pyspark.sql import Row as _Row

from real_time_mobility_heatmap_spark.schema import PING_SCHEMA as _PING_SCHEMA

_VIDS = st.sampled_from(["v1", "v2", "v3"])
# minutes 0..119 within one fixed 2-hour span, lat snapped to 3 cells
_PINGS = st.lists(
    st.tuples(_VIDS, st.integers(0, 119), st.sampled_from([42.35, 42.40, 42.90])),
    min_size=1,
    max_size=25,
)


def _ping_df(spark, rows):
    base = _dt.datetime(2024, 1, 1, 10, 0, 0)
    return spark.createDataFrame(
        [
            _Row(
                provider="p",
                vehicleId=vid,
                eventTs=base + _dt.timedelta(minutes=m),
                lat=lat,
                lon=-71.06,
                speedKmh=20.0,
                event_id=i,
                props=None,
            )
            for i, (vid, m, lat) in enumerate(rows)
        ],
        _PING_SCHEMA,
    )


@given(rows=_PINGS)
@_SETTINGS
def test_od_matrix_trip_count_equals_vehicle_hours(spark, rows):
    """Every observed (vehicle, hour) contributes exactly one trip —
    no matter how pings distribute over cells and times."""
    from real_time_mobility_heatmap_spark.operators.flows import od_matrix

    df = _ping_df(spark, rows)
    total_trips = sum(r["n_trips"] for r in od_matrix(df).collect())
    vehicle_hours = len({(vid, m // 60) for vid, m, _ in rows})
    assert total_trips == vehicle_hours


@given(rows=_PINGS)
@_SETTINGS
def test_stay_points_are_disjoint_and_within_observation(spark, rows):
    """Per vehicle: stay intervals never overlap, and every stay's ping
    count is bounded by the vehicle's total pings."""
    from collections import defaultdict

    from real_time_mobility_heatmap_spark.operators.flows import stay_points

    df = _ping_df(spark, rows)
    by_vid = defaultdict(list)
    for r in stay_points(df).collect():
        by_vid[r["vehicleId"]].append(r)
    totals = defaultdict(int)
    for vid, m, _ in rows:
        totals[vid] += 1
    for vid, stays in by_vid.items():
        stays.sort(key=lambda r: r["stay_start_es"])
        assert sum(r["n_pings"] for r in stays) <= totals[vid]
        for a, b in zip(stays, stays[1:]):
            assert a["stay_end_es"] < b["stay_start_es"]


@given(rows=_PINGS)
@_SETTINGS
def test_encounter_counts_bounded_by_shared_windows(spark, rows):
    """A pair's n_encounters can never exceed the number of 5-minute
    windows in which BOTH vehicles pinged at all (any cell)."""
    from collections import defaultdict

    from real_time_mobility_heatmap_spark.operators.flows import encounter_pairs

    df = _ping_df(spark, rows)
    windows = defaultdict(set)
    for vid, m, _ in rows:
        windows[vid].add(m // 5)
    for r in encounter_pairs(df).collect():
        shared = windows[r["vehicle_a"]] & windows[r["vehicle_b"]]
        assert 1 <= r["n_encounters"] <= len(shared)


_OLS_GROUP = st.lists(
    st.tuples(st.integers(0, 1000), st.integers(-100000, 100000)),
    min_size=1,
    max_size=12,
)


@given(pts=_OLS_GROUP)
@_SETTINGS
def test_grouped_ols_matches_numpy_least_squares(spark, pts):
    """functions/ols.grouped_ols against an independent reference: on
    any integer (x, y) set, slope equals numpy's lstsq fit and r2 equals
    the squared Pearson correlation — and the degenerate cases (single
    point, zero x-variance, zero y-variance) emit NULLs per the
    documented contract instead of dividing by zero."""
    import numpy as np

    from real_time_mobility_heatmap_spark.functions.ols import grouped_ols

    rel = spark.createDataFrame([("g", x, y) for x, y in pts], "k string, x long, y long")
    row = grouped_ols(rel, ["k"]).collect()[0]

    xs = np.array([x for x, _ in pts], dtype=float)
    ys = np.array([y for _, y in pts], dtype=float)
    n = len(pts)
    den_x = n * (xs * xs).sum() - xs.sum() ** 2
    den_y = n * (ys * ys).sum() - ys.sum() ** 2
    assert row["n_points"] == n
    if den_x <= 0:
        assert row["slope"] is None and row["r2"] is None
        return
    coef = np.linalg.lstsq(np.stack([xs, np.ones(n)], axis=1), ys, rcond=None)[0][0]
    assert row["slope"] == __import__("pytest").approx(coef, rel=1e-9, abs=1e-9)
    if den_y <= 0:
        assert row["r2"] is None
    else:
        r = np.corrcoef(xs, ys)[0, 1]
        assert row["r2"] == __import__("pytest").approx(r * r, rel=1e-9, abs=1e-9)


_MONEY_ROWS = st.lists(
    st.tuples(
        st.integers(1, 10_000_000),  # price in cents (<= $100k/row)
        st.integers(0, 10),          # discount percent
    ),
    min_size=1,
    max_size=12,
)


@given(rows=_MONEY_ROWS)
@_SETTINGS
def test_money_sum_matches_decimal_reference(spark, rows):
    """functions/money.money_sum against an independent exact reference:
    on ANY set of (cents, discount%) rows, the split-sum formulation must
    equal Python Decimal arithmetic with ROUND_HALF_UP — including totals
    that land exactly on a half-cent, the case the r11 perturbed-corpus
    sweep caught the float formulation flipping cross-engine."""
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb

    from real_time_mobility_heatmap_spark.functions.money import (
        money_sum,
        money_sum_sql,
    )

    df = spark.createDataFrame(
        [(c / 100.0, (100 - d) / 100.0) for c, d in rows],
        "price double, mult double",
    )
    got = df.agg(money_sum("price * mult").alias("s")).collect()[0]["s"]

    exact = sum(
        (Decimal(c) / 100) * (Decimal(100 - d) / 100) for c, d in rows
    )
    want = float(exact.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
    assert got == want, (rows, got, want, exact)

    values = ", ".join(f"({c / 100.0!r}, {(100 - d) / 100.0!r})" for c, d in rows)
    oracle = duckdb.sql(
        f"SELECT {money_sum_sql('a * b')} FROM (VALUES {values}) t(a, b)"
    ).fetchone()[0]
    assert oracle == want
