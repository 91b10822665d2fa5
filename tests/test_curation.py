"""Semantic tests for the corpus-curation family (operators/curation.py):
per-source caps, deterministic training order, padding accounting,
tokenizer fertility, and embedding-space decontamination. The DuckDB
hash-equivalence is the driver gate; these pin the SEMANTICS."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from real_time_mobility_heatmap_spark.operators.curation import (
    CAP_PER_SOURCE,
    CONTAM_COS,
    MAX_LEN,
    N_EPOCHS,
    N_SHARDS,
    PAD_BUCKET,
    TEST_MOD,
    padding_waste_report,
    per_source_cap,
    semantic_decontaminate,
    tokenizer_fertility_report,
    training_order,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _corpus(spark, per_source: dict[str, int]):
    rows, i = [], 0
    for src, n in per_source.items():
        for _ in range(n):
            rows.append((i, f"doc {i} body words", "en", src, 17))
            i += 1
    return _docs(spark, rows)


# ---------------------------------------------------------------------------
# per_source_cap


def test_cap_enforced_and_small_sources_untouched(spark):
    docs = _corpus(spark, {"big": CAP_PER_SOURCE * 3, "small": 3})
    out = per_source_cap(docs).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src["big"]) == CAP_PER_SOURCE
    assert len(by_src["small"]) == 3  # under the cap: everything kept
    for rs in by_src.values():
        assert sorted(r["keep_rank"] for r in rs) == list(range(1, len(rs) + 1))


def test_cap_is_reproducible_and_input_order_free(spark):
    docs = _corpus(spark, {"a": 25, "b": 25})
    kept1 = {r["doc_id"] for r in per_source_cap(docs).collect()}
    shuffled = docs.orderBy(F.desc("doc_id")).repartition(7)
    kept2 = {r["doc_id"] for r in per_source_cap(shuffled).collect()}
    assert kept1 == kept2  # hash-chosen keep-set, not a row-order prefix


# ---------------------------------------------------------------------------
# training_order


def test_training_order_is_a_permutation_per_epoch(spark):
    docs = _corpus(spark, {"s": 40})
    out = training_order(docs).collect()
    assert len(out) == 40 * N_EPOCHS
    for e in range(N_EPOCHS):
        rows = [r for r in out if r["epoch"] == e]
        assert {r["doc_id"] for r in rows} == set(range(40))
        for s in {r["shard"] for r in rows}:
            assert 0 <= s < N_SHARDS
            pos = sorted(r["pos"] for r in rows if r["shard"] == s)
            assert pos == list(range(1, len(pos) + 1))  # dense in-shard order


def test_training_order_reshuffles_between_epochs(spark):
    docs = _corpus(spark, {"s": 60})
    out = training_order(docs).collect()
    order = {
        e: [r["doc_id"] for r in sorted(
            (x for x in out if x["epoch"] == e),
            key=lambda x: (x["shard"], x["pos"]),
        )]
        for e in range(N_EPOCHS)
    }
    assert order[0] != order[1]  # epoch salt actually reshuffles


# ---------------------------------------------------------------------------
# padding_waste_report


def test_padding_buckets_truncation_and_exact_ppm(spark):
    # 3 tokens -> bucket PAD_BUCKET; MAX_LEN+9 tokens -> capped, truncated
    short = "a b c"
    long = " ".join(["tok"] * (MAX_LEN + 9))
    docs = _docs(spark, [(0, short, "en", "s", 5), (1, long, "en", "s", 9)])
    out = {r["bucket_len"]: r for r in padding_waste_report(docs).collect()}
    assert set(out) == {PAD_BUCKET, MAX_LEN}
    lo, hi = out[PAD_BUCKET], out[MAX_LEN]
    assert (lo["sum_tokens"], lo["sum_padded"], lo["sum_truncated"]) == (3, PAD_BUCKET, 0)
    assert (hi["sum_tokens"], hi["sum_padded"], hi["sum_truncated"]) == (
        MAX_LEN, MAX_LEN, 9,
    )
    assert lo["waste_ppm"] == (PAD_BUCKET - 3) * 1_000_000 // PAD_BUCKET
    assert hi["waste_ppm"] == 0


def test_padding_total_on_null_and_empty_text(spark):
    docs = _docs(spark, [(0, None, "en", "s", 0), (1, "", "en", "s", 0)])
    out = padding_waste_report(docs).collect()
    assert len(out) == 1  # both land in the minimum bucket, no crash
    assert out[0]["bucket_len"] == PAD_BUCKET and out[0]["sum_tokens"] == 0


# ---------------------------------------------------------------------------
# tokenizer_fertility_report


def test_fertility_exact_integer_ppm_and_zero_char_guard(spark):
    docs = _docs(
        spark,
        [
            (0, "ab cd", "en", "s", 5),   # 2 tokens / 5 chars
            (1, "efg", "en", "s", 3),     # 1 token  / 3 chars
            (2, "", "zz", "s", 0),        # zero chars -> NULL fertility
        ],
    )
    out = {(r["lang"], r["source"]): r for r in tokenizer_fertility_report(docs).collect()}
    en = out[("en", "s")]
    assert en["sum_tokens"] == 3 and en["sum_chars"] == 8
    assert en["fertility_ppm"] == 3 * 1_000_000 // 8
    assert en["tokens_per_doc_ppm"] == 3 * 1_000_000 // 2
    assert out[("zz", "s")]["fertility_ppm"] is None  # no ANSI div-by-zero


# ---------------------------------------------------------------------------
# semantic_decontaminate


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_decontaminate_flags_match_bruteforce(spark):
    # label 0: train vec 1 nearly parallel to test vec 0; train vec 2 orthogonal.
    # label 1: train only -> never compared -> NULL best, not contaminated.
    rows = [
        (0, [1.0, 0.0, 0.0], 0),            # test (0 % TEST_MOD == 0)
        (1, [0.9, 0.1, 0.0], 0),            # train, close to test 0
        (2, [0.0, 0.0, 1.0], 0),            # train, orthogonal
        (3, [0.5, 0.5, 0.0], 1),            # train, empty-cell case
    ]
    out = {r["train_id"]: r for r in semantic_decontaminate(_emb(spark, rows)).collect()}
    assert set(out) == {1, 2, 3}
    exp1 = 0.9 / math.sqrt(0.9**2 + 0.1**2)
    assert abs(out[1]["best_cosine"] - exp1) < 1e-6
    assert out[1]["contaminated"] and out[1]["best_test_id"] == 0
    assert out[2]["best_cosine"] == 0.0 and not out[2]["contaminated"]
    assert out[3]["best_cosine"] is None and out[3]["best_test_id"] is None
    assert out[3]["contaminated"] is False
    assert exp1 >= CONTAM_COS  # the fixture actually crosses the threshold


def test_decontaminate_tie_breaks_to_smallest_test_id(spark):
    # two identical test vectors -> equal cosine -> keep the smaller id
    rows = [
        (0, [1.0, 0.0], 0),                 # test
        (TEST_MOD, [1.0, 0.0], 0),          # test (same direction)
        (1, [2.0, 0.0], 0),                 # train
    ]
    out = semantic_decontaminate(_emb(spark, rows)).collect()
    assert len(out) == 1 and out[0]["best_test_id"] == 0
    assert out[0]["best_cosine"] == 1.0 and out[0]["contaminated"]
