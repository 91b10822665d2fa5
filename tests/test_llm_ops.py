from __future__ import annotations

from real_time_mobility_heatmap_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from real_time_mobility_heatmap_spark.operators.multimodal import media_features
from real_time_mobility_heatmap_spark.operators.similarity import lsh_buckets, topk_cosine

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", f"src{i}", len(t)) for i, t in enumerate(texts)], DOC_SCHEMA
    )


def test_exact_dedup_groups_identical_content(spark):
    docs = _docs(spark, ["a b c d", "a b c d", "x y z w"])
    out = {r["keeper_doc_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert out == {0: 2, 2: 1}


def test_minhash_finds_near_duplicates_and_skips_distinct(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")  # high shingle overlap
    other = "completely different words appear inside this unrelated sentence structure here"
    docs = _docs(spark, [base, near, other])
    pairs = minhash_lsh_pairs(docs).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(0, 1)]
    assert pairs[0]["jaccard"] > 0.5

    # ground-truth variant agrees
    gt = ngram_jaccard_pairs(docs).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in gt] == [(0, 1)]


def test_identical_docs_have_equal_signatures_and_simhash(spark):
    docs = _docs(spark, ["alpha beta gamma delta epsilon", "alpha beta gamma delta epsilon"])
    sigs = minhash_signatures(docs).collect()
    assert sigs[0][1:] == sigs[1][1:]
    sh = simhash(docs).collect()
    assert sh[0]["simhash16"] == sh[1]["simhash16"]
    assert 0 <= sh[0]["simhash16"] < 2**16


def test_topk_cosine_self_similarity(spark):
    # vec 0 == vec 5 (identical direction) -> top-1 neighbor with cosine 1.0
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.0, 1.0, 0.0], 0),
        (2, [0.6, 0.8, 0.0], 0),
        (5, [2.0, 0.0, 0.0], 0),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {(r["query_id"], r["rank"]): r for r in topk_cosine(emb).collect()}
    assert out[(0, 1)]["cand_id"] == 5 and out[(0, 1)]["cosine"] == 1.0


def test_lsh_buckets_identical_vectors_collide(spark):
    import random

    rng = random.Random(1)
    v = [rng.uniform(-1, 1) for _ in range(64)]
    emb = spark.createDataFrame(
        [(0, v, 0), (1, v, 0), (2, [-x for x in v], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["vec_id"]: r["bucket"] for r in lsh_buckets(emb).collect()}
    assert out[0] == out[1]          # same vector -> same bucket
    assert out[2] == 65535 - out[0]  # negated vector -> complement bits


def test_media_features_deterministic_plumbing(spark):
    docs = _docs(spark, ["hello world", "hello world", "abc"])
    feats = {r["doc_id"]: r for r in media_features(docs).collect()}
    assert feats[0]["byte_len"] == 11 and feats[2]["byte_len"] == 3
    assert feats[0]["checksum"] == feats[1]["checksum"]
    assert feats[0]["checksum"] == sum(b"hello world") % 65521


def test_dedup_clusters_connected_components(spark):
    """Chained near-dups must land in ONE cluster labeled by the min
    doc_id: A~B and B~C (A never directly paired with C) -> {A,B,C}."""
    from real_time_mobility_heatmap_spark.operators.dedup import dedup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = [
        base,                                      # 0
        base.replace("today", "tomorrow"),         # 1 ~ 0
        base.replace("quick", "swift"),            # 2 ~ 0, ~1
        "a completely unrelated document with different words entirely here now",  # 3
        "a completely unrelated document with different words entirely here soon", # 4 ~ 3
    ]
    docs = _docs(spark, texts)
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in dedup_clusters(docs).collect()}
    assert got[0] == (0, 3) and got[1] == (0, 3) and got[2] == (0, 3)
    assert got[3] == (3, 2) and got[4] == (3, 2)


def test_trajectory_resampling_forms_agree(spark):
    """The mapInPandas partition form (registered; ~10x faster with many
    small groups) and the applyInPandas grouped-map form must produce
    identical interpolated trajectories."""
    from real_time_mobility_heatmap_spark.operators.trajectory import (
        resample_trajectories,
        resample_trajectories_grouped,
    )
    from real_time_mobility_heatmap_spark.sources.tables import pings_from_events

    pings = pings_from_events(spark, "/root/testdata/sf0.001")
    a = sorted(map(tuple, resample_trajectories(pings).collect()))
    b = sorted(map(tuple, resample_trajectories_grouped(pings).collect()))
    assert a == b and len(a) > 0


def test_media_batch_functions_handle_empty_blobs_anywhere():
    """Pure-pandas regression for the r2 reduceat bug: a batch whose LAST
    blob is empty corrupted the PRECEDING blob's checksum (clamped offsets
    made its segment drop the final byte). Prefix-sum segment sums are
    exact for empty blobs at any position."""
    import pandas as pd

    from real_time_mobility_heatmap_spark.operators.multimodal import (
        FRAME_BYTES,
        RESIZE_TARGET,
        fake_features,
        resize_media,
        sample_frames,
    )

    batch = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "content": [b"ab", b"", b"x" * (FRAME_BYTES + 1), b""],
    })

    feats = next(fake_features(iter([batch])))
    assert list(feats["checksum"]) == [
        (97 + 98) % 65521, 0, (120 * (FRAME_BYTES + 1)) % 65521, 0,
    ]
    assert list(feats["byte_len"]) == [2, 0, FRAME_BYTES + 1, 0]

    frames = next(sample_frames(iter([batch])))
    # doc 0: 1 frame of 2 bytes; docs 1/3: none; doc 2: frame 0 kept
    # (FRAME_BYTES bytes), frame 1 exists but stride-4 sampling skips it
    assert list(frames["doc_id"]) == [0, 2]
    assert list(frames["frame_idx"]) == [0, 0]
    assert list(frames["frame_len"]) == [2, FRAME_BYTES]
    assert list(frames["frame_checksum"]) == [195, (120 * FRAME_BYTES) % 65521]

    resized = next(resize_media(iter([batch])))
    assert list(resized["resized_len"]) == [RESIZE_TARGET, 0, RESIZE_TARGET, 0]
    # doc 0: floor(i*2/32) -> 16x 'a' + 16x 'b'
    assert resized["resized_checksum"][0] == (16 * 97 + 16 * 98) % 65521
    assert resized["resized_checksum"][2] == (RESIZE_TARGET * 120) % 65521
    assert list(resized["resized_checksum"])[1] == 0


def test_sample_frames_tail_frame_and_stride():
    """Multi-frame doc: kept frames are 0, 4, 8, ... and a short tail
    frame keeps its true length/checksum."""
    import pandas as pd

    from real_time_mobility_heatmap_spark.operators.multimodal import (
        FRAME_BYTES,
        FRAME_STRIDE,
        sample_frames,
    )

    # 9 frames: 8 full + 1 tail of 3 bytes; stride 4 keeps frames 0, 4, 8
    blob = (b"\x01" * (FRAME_BYTES * 8)) + b"abc"
    batch = pd.DataFrame({"doc_id": [7], "content": [blob]})
    out = next(sample_frames(iter([batch])))
    assert list(out["frame_idx"]) == [0, 4, 8]
    assert list(out["frame_len"]) == [FRAME_BYTES, FRAME_BYTES, 3]
    assert list(out["frame_checksum"]) == [
        FRAME_BYTES, FRAME_BYTES, (97 + 98 + 99) % 65521,
    ]
    assert FRAME_STRIDE == 4


def test_redact_pii_masks_and_counts(spark):
    """Synthetic PII: counts per pattern, masking changes the hash, and
    clean docs pass through untouched (fixture docs carry no PII, so the
    oracle check alone can't exercise the positive path)."""
    import hashlib

    from real_time_mobility_heatmap_spark.operators.textops import redact_pii

    docs = _docs(spark, [
        "contact bob.smith+spam@example.co.uk or 192.168.0.1 today",
        "call 555-123-4567 and 555.987.6543 now",
        "a perfectly clean document with no identifiers at all",
    ])
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}

    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (1, 1, 0)
    assert out[0]["was_redacted"]
    expect0 = "contact <EMAIL> or <IP> today"
    assert out[0]["redacted_sha256"] == hashlib.sha256(expect0.encode()).hexdigest()

    assert out[1]["n_phone"] == 2 and out[1]["was_redacted"]
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)
    assert not out[2]["was_redacted"]


def test_ivf_assign_partitions_and_probe_recall(spark):
    """Every vector gets exactly one cell; a query's IVF top-1 equals its
    brute-force top-1 whenever the true neighbor shares the query's cell
    (nprobe=1 recall semantics, checked on the fixture)."""
    from real_time_mobility_heatmap_spark.operators.similarity import (
        ivf_assign,
        topk_cosine,
        topk_cosine_ivf,
    )
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cells = {r["vec_id"]: r["centroid_id"] for r in ivf_assign(emb).collect()}
    assert len(cells) == emb.count()          # total function
    assert set(cells.values()) <= set(range(4))
    for c in range(4):
        assert cells[c] == c                  # a seed is its own centroid

    brute = {(r["query_id"], r["rank"]): r["cand_id"] for r in topk_cosine(emb).collect()}
    ivf = {(r["query_id"], r["rank"]): r["cand_id"] for r in topk_cosine_ivf(emb).collect()}
    for q in range(5):
        best = brute.get((q, 1))
        if best is not None and cells.get(best) == cells.get(q):
            assert ivf.get((q, 1)) == best, (q, best, ivf.get((q, 1)))


def test_ivf_probe2_recall_dominates_probe1(spark):
    """nprobe=2 must return every probe1 hit plus possibly better ones:
    for each query, the probe2 top-1 cosine >= the probe1 top-1 cosine."""
    from real_time_mobility_heatmap_spark.operators.similarity import (
        topk_cosine_ivf,
        topk_cosine_ivf_probe2,
    )
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    p1 = {r["query_id"]: r["cosine"] for r in topk_cosine_ivf(emb).collect() if r["rank"] == 1}
    p2 = {r["query_id"]: r["cosine"] for r in topk_cosine_ivf_probe2(emb).collect() if r["rank"] == 1}
    assert set(p1) <= set(p2)
    for q in p1:
        assert p2[q] >= p1[q], (q, p1[q], p2[q])


def test_kmeans_update_means_and_trained_assignment(spark):
    """One Lloyd round: (a) the update emits k*dim cells whose n_members
    partition the corpus and whose coords are the member means; (b) the
    trained re-assignment is total and strictly-no-worse in total within-
    cluster distance than assigning against the seed centroids (the
    monotone-improvement property of Lloyd's algorithm)."""
    from real_time_mobility_heatmap_spark.operators.similarity import (
        DIM,
        N_CENTROIDS,
        ivf_assign,
        ivf_assign_trained,
        kmeans_update,
    )
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()

    upd = kmeans_update(emb).collect()
    assert len(upd) == N_CENTROIDS * DIM
    # every (centroid, pos) slice counts the same members; slices partition the corpus
    by_cent = {}
    for r in upd:
        by_cent.setdefault(r["centroid_id"], set()).add(r["n_members"])
    assert all(len(v) == 1 for v in by_cent.values())
    assert sum(next(iter(v)) for v in by_cent.values()) == n

    # hand-check one cell mean: centroid 0 / pos 0
    assign = {r["vec_id"]: r["centroid_id"] for r in ivf_assign(emb).collect()}
    members0 = [
        float(r["embedding"][0])
        for r in emb.select("vec_id", "embedding").collect()
        if assign[r["vec_id"]] == 0
    ]
    got = next(r["coord"] for r in upd if r["centroid_id"] == 0 and r["pos"] == 0)
    assert abs(got - sum(members0) / len(members0)) < 1e-5

    trained = ivf_assign_trained(emb).collect()
    assert len(trained) == n  # total function after the update too
    seed_cost = sum(r["dist2"] for r in ivf_assign(emb).collect())
    trained_cost = sum(r["dist2"] for r in trained)
    assert trained_cost <= seed_cost + 1e-6, (trained_cost, seed_cost)


def test_bloom_decontaminate_upper_bounds_exact(spark):
    """Bloom semantics: no false negatives — per test doc the bloom
    contaminated count is >= the exact count, with identical n_shingles
    and doc coverage (fixture corpus, both operators end to end)."""
    from real_time_mobility_heatmap_spark.operators.dedup import (
        decontaminate,
        decontaminate_bloom,
    )
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    exact = {r["doc_id"]: r for r in decontaminate(docs).collect()}
    bloom = {r["doc_id"]: r for r in decontaminate_bloom(docs).collect()}
    assert set(exact) == set(bloom) and exact
    for d, e in exact.items():
        b = bloom[d]
        assert b["n_shingles"] == e["n_shingles"]
        assert b["n_contaminated"] >= e["n_contaminated"], d
        assert b["contamination_ppm"] >= e["contamination_ppm"], d


def test_bloom_bitmap_equals_join_formulation(spark):
    """The broadcast-bitmap Arrow-UDF probe and the position-equi-join
    formulation share mixes and M, so they must agree row-for-row —
    including identical false positives."""
    from real_time_mobility_heatmap_spark.operators.dedup import (
        decontaminate_bloom,
        decontaminate_bloom_bitmap,
    )
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    join_form = {r["doc_id"]: tuple(r) for r in decontaminate_bloom(docs).collect()}
    bitmap = {r["doc_id"]: tuple(r) for r in decontaminate_bloom_bitmap(docs).collect()}
    assert join_form == bitmap and join_form


def test_lm_score_hand_computed_micronats(spark):
    """Corpus 'aaaa' + 'abcd': trigram counts aaa:2, abc:1, bcd:1 over a
    total of 4 -> doc0 avg ln p = ln(1/2), doc1 = ln(1/4), exactly (all
    per-trigram micro-nat values are whole integers here). Fluent
    (repetitive) text must outscore the all-rare doc."""
    import math

    from real_time_mobility_heatmap_spark.operators.textops import lm_score

    docs = _docs(spark, ["aaaa", "abcd"])
    out = {r["doc_id"]: r for r in lm_score(docs).collect()}
    assert out[0]["n_trigrams"] == 2 and out[1]["n_trigrams"] == 2
    assert out[0]["avg_logp"] == round(round(math.log(0.5) * 1e6) / 1e6, 6)
    assert out[1]["avg_logp"] == round(round(math.log(0.25) * 1e6) / 1e6, 6)
    assert out[0]["avg_logp"] > out[1]["avg_logp"]


def test_chunk_documents_overlap_and_coverage(spark):
    """Chunk layout invariants on hand-sized docs: a short doc yields one
    chunk; a doc just past the window splits with the configured overlap;
    every token index is covered; the final chunk may be short."""
    from real_time_mobility_heatmap_spark.operators.textops import (
        CHUNK_OVERLAP,
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_documents,
    )

    short = " ".join(f"t{i}" for i in range(5))
    exact = " ".join(f"t{i}" for i in range(CHUNK_TOKENS))
    long = " ".join(f"t{i}" for i in range(CHUNK_TOKENS + 1))
    docs = _docs(spark, [short, exact, long])
    out = {}
    for r in chunk_documents(docs).collect():
        out.setdefault(r["doc_id"], []).append(r)

    assert [c["n_chunk_tokens"] for c in out[0]] == [5]
    assert [c["n_chunk_tokens"] for c in out[1]] == [CHUNK_TOKENS]
    two = sorted(out[2], key=lambda c: c["chunk_no"])
    assert [c["chunk_start"] for c in two] == [0, CHUNK_STRIDE]
    assert two[0]["n_chunk_tokens"] == CHUNK_TOKENS
    # final chunk: overlap tokens re-covered plus the one new token
    assert two[1]["n_chunk_tokens"] == CHUNK_OVERLAP + 1
    # coverage: last chunk reaches the final token
    assert two[1]["chunk_start"] + two[1]["n_chunk_tokens"] == CHUNK_TOKENS + 1


def test_repetition_stats_hand_counts(spark):
    from real_time_mobility_heatmap_spark.operators.textops import repetition_stats

    docs = _docs(spark, ["a a a b", "solo"])  # 1-token doc has no bigram
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(out) == {0}
    r = out[0]
    assert r["n_tokens"] == 4
    assert r["top_token_count"] == 3                    # "a" x3
    assert r["top_token_ppm"] == 3 * 1_000_000 // 4     # 750000
    assert r["top_bigram_count"] == 2                   # "a a" x2 of 3 bigrams
    assert r["top_bigram_ppm"] == 2 * 1_000_000 // 3    # 666666


def test_decontaminate_flags_cross_split_overlap(spark):
    """A test-split doc sharing all shingles with a train-split doc scores
    1e6 ppm; a disjoint test doc scores 0. Split is the pure doc_id hash,
    so the test picks ids that actually land in each split."""
    import hashlib

    from real_time_mobility_heatmap_spark.operators.dedup import decontaminate

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(f"split|{doc_id}".encode()).hexdigest()[:15], 16) % 100

    train_id = next(i for i in range(1000) if bucket(i) < 90)
    test_a, test_b = [i for i in range(1000) if bucket(i) >= 95][:2]

    shared = "one two three four five"            # 5 tokens -> 3 shingles
    rows = [
        (train_id, shared, "en", "s", len(shared)),
        (test_a, shared, "en", "s", len(shared)),
        (test_b, "alpha beta gamma delta", "en", "s", 22),
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {r["doc_id"]: r for r in decontaminate(docs).collect()}
    assert set(out) == {test_a, test_b}
    assert out[test_a]["n_shingles"] == 3
    assert out[test_a]["n_contaminated"] == 3
    assert out[test_a]["contamination_ppm"] == 1_000_000
    assert out[test_b]["n_contaminated"] == 0
    assert out[test_b]["contamination_ppm"] == 0


def test_mixture_sample_rates_and_determinism(spark):
    """Over-represented source gets a < 1e6 ppm rate; small source keeps
    everything. Keep decisions are the pure doc_id hash — recomputed here
    byte-for-byte."""
    import hashlib

    from real_time_mobility_heatmap_spark.operators.textops import (
        MIX_TARGET_PER_SOURCE,
        mixture_sample,
    )

    rows = [(i, f"text {i}", "en", "big" if i < 30 else "small", 6)
            for i in range(40)]  # big: 30 docs, small: 10 docs
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {r["doc_id"]: r for r in mixture_sample(docs).collect()}
    assert len(out) == 40
    big_rate = MIX_TARGET_PER_SOURCE * 1_000_000 // 30   # 500000
    for i, r in out.items():
        want_rate = big_rate if i < 30 else 1_000_000
        assert r["rate_ppm"] == want_rate
        h = int(hashlib.md5(f"mix|{i}".encode()).hexdigest()[:15], 16)
        assert r["kept"] == (h % 1_000_000 < want_rate)
    assert all(out[i]["kept"] for i in range(30, 40))    # rate 1e6 keeps all


def test_pack_sequences_contiguous_layout(spark):
    """Within each shard the token layout is gapless and non-overlapping:
    sorted by tok_start, each doc starts where the previous one ended."""
    from real_time_mobility_heatmap_spark.operators.textops import (
        SEQ_LEN,
        pack_sequences,
    )
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = pack_sequences(docs).collect()
    assert len(out) == docs.count()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= {0, 1, 2, 3}
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["tok_start"])
        pos = 0
        for r in rows:
            assert r["tok_start"] == pos, (shard, r)
            assert r["first_pack"] == r["tok_start"] // SEQ_LEN
            assert r["last_pack"] == (r["tok_start"] + r["n_tokens"] - 1) // SEQ_LEN
            assert r["pack_offset"] == r["tok_start"] % SEQ_LEN
            pos += r["n_tokens"]


def test_semantic_dedup_drops_only_near_duplicate_cluster_mates(spark):
    """Hand-built embeddings: two identical vectors land in one cluster
    (cosine 1.0 => the higher id is dropped); an orthogonal vector is
    kept; every cluster retains at least one member."""
    from real_time_mobility_heatmap_spark.operators.similarity import (
        SEMDEDUP_COS,
        semantic_dedup,
    )

    dim = 64
    e0 = [1.0] + [0.0] * (dim - 1)
    e1 = [0.0, 1.0] + [0.0] * (dim - 2)
    e2 = [0.0, 0.0, 1.0] + [0.0] * (dim - 3)
    e3 = [0.0, 0.0, 0.0, 1.0] + [0.0] * (dim - 4)
    dup_of_0 = list(e0)
    rows = [(i, v, 0) for i, v in enumerate([e0, e1, e2, e3, dup_of_0])]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["vec_id"]: r for r in semantic_dedup(emb).collect()}
    assert len(out) == 5
    # centroids are vec_id 0..3's vectors; vec 4 == vec 0 => same cluster,
    # cosine 1.0 with lower-id mate => dropped
    assert out[4]["is_kept"] == 0 and out[4]["max_lower_cos"] == 1.0
    for i in range(4):
        assert out[i]["is_kept"] == 1, i
        assert out[i]["max_lower_cos"] < SEMDEDUP_COS
    # per-cluster: at least one keeper
    by_cluster = {}
    for r in out.values():
        by_cluster.setdefault(r["centroid_id"], []).append(r["is_kept"])
    assert all(any(k == 1 for k in ks) for ks in by_cluster.values())


def test_pagerank_pairs_mass_and_symmetry(spark):
    """On a path graph a-b-c built from near-identical docs, the center
    node outranks the leaves, equal-role leaves tie exactly (integer
    arithmetic), and total mass stays within integer-truncation slack of
    PR_SCALE."""
    from real_time_mobility_heatmap_spark.operators.dedup import (
        PR_SCALE,
        pagerank_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = _docs(
        spark,
        [base, base.replace("today", "tomorrow"), base, "zz qq ww ee rr tt yy uu"],
    )
    out = {r["doc_id"]: r for r in pagerank_pairs(docs).collect()}
    assert set(out) >= {0, 1, 2}, "near-dup trio must form the graph"
    assert 3 not in out, "distinct doc must stay outside the pair graph"
    n = len(out)
    total = sum(r["rank_ppb"] for r in out.values())
    # each of `iters` rounds can truncate up to ~1 ppb per node per div
    assert PR_SCALE * 0.99 <= total <= PR_SCALE
    if out[0]["deg"] != out[1]["deg"]:
        center = max(out.values(), key=lambda r: r["deg"])
        leaves = [r for r in out.values() if r["doc_id"] != center["doc_id"]]
        assert all(center["rank_ppb"] >= l["rank_ppb"] for l in leaves)
    # exact tie between structurally identical nodes (docs 0 and 2 are
    # verbatim copies => same neighborhoods)
    assert out[0]["rank_ppb"] == out[2]["rank_ppb"]


def test_fuzzy_part_matches_blocks_and_threshold(spark):
    from real_time_mobility_heatmap_spark.operators.relational import (
        FUZZY_MAX_EDIT,
        fuzzy_part_matches,
    )

    rows = [
        (1, "red widget", "B1", "T1", 1, 1.0),
        (2, "red widgit", "B1", "T1", 1, 1.0),   # dist 1, same block
        (3, "red widget", "B2", "T1", 1, 1.0),   # identical name, other block
        (4, "blue spanner", "B1", "T1", 1, 1.0),  # same block, too far
    ]
    part = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    out = fuzzy_part_matches(part).collect()
    assert [(r["part_a"], r["part_b"], r["edit_dist"]) for r in out] == [(1, 2, 1)]
    assert all(r["edit_dist"] <= FUZZY_MAX_EDIT for r in out)


def test_key_skew_report_ranks_and_shares(spark):
    from real_time_mobility_heatmap_spark.operators.relational import (
        SKEW_TOP_N,
        key_skew_report,
    )

    # key 7 appears 6x, key 8 3x, keys 100.. once each
    keys = [7] * 6 + [8] * 3 + list(range(100, 110))
    li = spark.createDataFrame(
        [(k, 1.0) for k in keys], "l_partkey long, l_quantity double"
    )
    out = sorted(key_skew_report(li).collect(), key=lambda r: r["rank"])
    assert len(out) == min(SKEW_TOP_N, 12)
    assert (out[0]["l_partkey"], out[0]["cnt"]) == (7, 6)
    assert (out[1]["l_partkey"], out[1]["cnt"]) == (8, 3)
    assert out[0]["share_ppm"] == 6 * 1_000_000 // len(keys)
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(
        range(1, len(out) + 1)
    )


def test_containment_pairs_detects_doc_in_doc(spark):
    """A small doc fully embedded in a large one: containment of the
    small side hits 100% while symmetric Jaccard stays low."""
    from real_time_mobility_heatmap_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"w{i}" for i in range(40))
    docs = _docs(spark, [small, big, "totally different words here now ok"])
    out = containment_pairs(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["cont_a_ppm"] == 1_000_000      # all of small's shingles in big
    assert r["cont_b_ppm"] < 600_000         # big is mostly NOT the small doc
    # symmetric jaccard misses this pair entirely at its 0.5 threshold
    assert not ngram_jaccard_pairs(docs).collect()


def test_dedup_keep_best_picks_highest_quality_cluster_mate(spark):
    """Two near-dup docs: the keeper is the higher-quality one even when
    it has the larger doc_id (min-id would pick the other)."""
    from real_time_mobility_heatmap_spark.operators.dedup import dedup_keep_best
    from real_time_mobility_heatmap_spark.operators.textops import quality_score

    base = (
        "the quick brown fox jumps over the lazy dog again and again today "
        "with many more plain words that read like a normal sentence"
    )
    noisy = "!!! " + base.replace("today", "tomorrow") + " ###"
    docs = _docs(spark, [noisy, base])
    qs = {r["doc_id"]: r["quality_score"] for r in quality_score(docs).collect()}
    out = dedup_keep_best(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cluster_size"] == 2
    best = max(qs, key=lambda d: (qs[d], -d))
    assert r["keeper_doc_id"] == best
    assert r["keeper_quality"] == qs[best]


def test_minhash_error_report_bounds(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators import dedup

    rows = dedup.q_minhash_error_report(spark, sf_dir).collect()
    assert rows, "fixture corpus must produce co-shingle pairs"
    for r in rows:
        assert 0 <= r["jaccard_decile"] <= 10
        # errors are ppm values inside [0, 1e6] by construction
        assert 0 <= r["mean_abs_err_ppm"] <= 1_000_000
        assert r["mean_abs_err_ppm"] <= r["max_abs_err_ppm"] <= 1_000_000
        assert r["n_pairs"] >= 1


def test_zorder_layout_beats_roundrobin(spark, sf_dir):
    """The point of the operator: Morton-clustered files must have a
    dramatically tighter average bbox footprint than arrival-order files."""
    from real_time_mobility_heatmap_spark.operators import spatial

    got = {
        r["layout"]: r for r in spark.createDataFrame(
            spatial.q_zorder_layout_report(spark, sf_dir).collect()
        ).collect()
    }
    z, rr = got["zorder"], got["roundrobin"]
    # every round-robin file spans (almost) the full data extent; z-order
    # files cover a small fraction of it — at least 4x tighter on average
    assert z["avg_bbox_area"] * 4 < rr["avg_bbox_area"]
    assert z["avg_bbox_ppm"] * 4 < rr["avg_bbox_ppm"]
    assert z["max_bbox_area"] < rr["max_bbox_area"]


def test_reliable_checkpoint_switch(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_CHECKPOINT_DIR flips every lineage cut from
    localCheckpoint (executor-local, unreplicated) to a reliable
    checkpoint() in that directory — same results, plus materialized
    RDD files the cluster can recover from (SCALE.md tradeoff, now a
    switch)."""
    from real_time_mobility_heatmap_spark.lineage import CHECKPOINT_DIR_ENV
    from real_time_mobility_heatmap_spark.operators.dedup import dedup_clusters
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    baseline = sorted(
        (r["doc_id"], r["cluster_id"]) for r in dedup_clusters(docs).collect()
    )

    ck = tmp_path / "reliable-ck"
    monkeypatch.setenv(CHECKPOINT_DIR_ENV, str(ck))
    reliable = sorted(
        (r["doc_id"], r["cluster_id"]) for r in dedup_clusters(docs).collect()
    )
    assert reliable == baseline
    # the reliable path really wrote checkpoint data to the chosen dir
    files = [p for p in ck.rglob("*") if p.is_file()]
    assert files, "no checkpoint files written under SPARK_GRAFT_CHECKPOINT_DIR"


def test_repeated_spans_are_real_verbatim_matches(spark, sf_dir):
    """Every reported span must correspond to ACTUALLY IDENTICAL token
    runs in both documents (exactness is the operator's whole claim),
    and be at least MIN_SPAN_TOKENS long."""
    from real_time_mobility_heatmap_spark.operators.dedup import (
        MIN_SPAN_TOKENS,
        q_repeated_span_report,
    )
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    spans = q_repeated_span_report(spark, sf_dir).collect()
    assert spans, "fixture contains near-dups; expected at least one span"
    texts = {
        r["doc_id"]: r["text"].lower().split()
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for s in spans:
        assert s["span_tokens"] >= MIN_SPAN_TOKENS
        a = texts[s["doc_a"]][s["start_a"] : s["start_a"] + s["span_tokens"]]
        b = texts[s["doc_b"]][s["start_b"] : s["start_b"] + s["span_tokens"]]
        assert a == b, (s, a[:5], b[:5])


def test_weighted_sample_is_deterministic_and_length_biased(spark, sf_dir):
    """A-ES sampling: exactly k rows per source (fixture groups exceed
    k), identical output across invocations, and the length-weighted
    draw overrepresents long documents vs the corpus mean."""
    from real_time_mobility_heatmap_spark.operators.textops import (
        WEIGHTED_SAMPLE_K,
        q_weighted_sample,
    )
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    r1 = sorted(map(tuple, q_weighted_sample(spark, sf_dir).collect()))
    r2 = sorted(map(tuple, q_weighted_sample(spark, sf_dir).collect()))
    assert r1 == r2
    per_src = {}
    for src, doc_id, n_chars, rank in r1:
        per_src.setdefault(src, []).append(n_chars)
    assert all(len(v) == WEIGHTED_SAMPLE_K for v in per_src.values())
    corpus = [r["n_chars"] for r in load_table(spark, sf_dir, "documents").collect()]
    sampled = [c for v in per_src.values() for c in v]
    assert sum(sampled) / len(sampled) > sum(corpus) / len(corpus), (
        "length-weighted sample should skew long"
    )


def test_ln_u60_exact_is_bit_identical_across_engines(spark):
    """r9 verdict #3: weighted_sample's ordering key must be ENGINE-EXACT
    — the Spark and DuckDB evaluations of ln_u60_exact_sql must agree to
    the BIT (not epsilon), including adversarial h at power-of-two
    mantissa/exponent boundaries where the old libm-ln path could flip
    by an ulp. Bit-identical priorities make an ulp-boundary rank flip
    impossible by construction, so ordering is stable wherever two
    priorities differ at all (and exact ties fall to the doc_id
    tie-break identically in both engines)."""
    import struct

    import duckdb

    from real_time_mobility_heatmap_spark.functions.textfns import ln_u60_exact_sql

    hs = [0, 1, 2, 3]
    for k in (52, 53, 59):
        hs += [(1 << k) - 1, 1 << k, (1 << k) + 1]
    hs += [(1 << 60) - 2, (1 << 60) - 1]
    import random

    rng = random.Random(20260814)
    hs += [rng.getrandbits(60) for _ in range(3000)]

    sdf = spark.createDataFrame([(h,) for h in hs], "h bigint")
    spark_vals = [
        r["v"]
        for r in sdf.selectExpr("h", f"{ln_u60_exact_sql('h', 'spark')} AS v")
        .orderBy("h")
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(h BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(h,) for h in hs])
    duck_vals = [
        v for (v,) in con.execute(
            f"SELECT {ln_u60_exact_sql('h', 'duck')} FROM t ORDER BY h"
        ).fetchall()
    ]
    assert len(spark_vals) == len(duck_vals)
    for s, d in zip(spark_vals, duck_vals):
        assert struct.pack("<d", s) == struct.pack("<d", d), (s, d)
    # sanity: monotone non-decreasing in h (sorted h => sorted ln(u))
    assert all(a <= b for a, b in zip(spark_vals, spark_vals[1:]))


def test_range_partition_plan_balances_buckets(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators.relational import (
        RANGE_BUCKETS,
        q_range_partition_plan,
    )

    rows = {r["bucket"]: r for r in q_range_partition_plan(spark, sf_dir).collect()}
    assert set(rows) == set(range(RANGE_BUCKETS)), "every range bucket occupied"
    total_ppm = sum(r["share_ppm"] for r in rows.values())
    assert 999000 <= total_ppm <= 1000000  # integer-floor shares
    assert max(r["skew_ppm"] for r in rows.values()) <= 100000, (
        "exact percentile bounds must keep buckets within 10% of ideal"
    )
    # ranges are disjoint and ordered
    ordered = [rows[b] for b in range(RANGE_BUCKETS)]
    for lo, hi in zip(ordered, ordered[1:]):
        assert lo["hi_chars"] <= hi["lo_chars"]


def test_source_overlap_matrix_accounts_for_every_pair(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators.dedup import (
        minhash_lsh_pairs,
        q_source_overlap_matrix,
    )
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    n_pairs = minhash_lsh_pairs(load_table(spark, sf_dir, "documents")).count()
    matrix = q_source_overlap_matrix(spark, sf_dir).collect()
    assert sum(r["n_pairs"] for r in matrix) == n_pairs
    for r in matrix:
        assert r["source_a"] <= r["source_b"]
        assert r["n_docs_lo"] <= r["n_pairs"] and r["n_docs_hi"] <= r["n_pairs"]


def test_vocab_and_lang_mix_reports_are_nontrivial(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators.textops import (
        q_lang_mix_report,
        q_vocab_coverage_report,
    )

    vocab = q_vocab_coverage_report(spark, sf_dir).collect()
    assert vocab and all(0 <= r["oov_ppm"] <= 1_000_000 for r in vocab)
    assert sum(r["n_oov"] for r in vocab) > 0, (
        "VOCAB_SIZE is tuned below the fixture vocabulary; OOV must be non-zero"
    )
    mix = q_lang_mix_report(spark, sf_dir).collect()
    assert mix, "fixture windows disagree on the stopword heuristic somewhere"
    for r in mix:
        assert 0 < r["n_en_segs"] < r["n_segs"]
        assert 0 < r["minority_ppm"] <= 500_000


def test_ngram_novelty_flags_near_dup_docs_low(spark, sf_dir):
    """Documents that near-duplicate an EARLIER doc must score lower
    novelty than the corpus median; the first member of each pair keeps
    its grams novel."""
    from real_time_mobility_heatmap_spark.operators.dedup import minhash_lsh_pairs
    from real_time_mobility_heatmap_spark.operators.textops import (
        q_ngram_novelty_report,
    )
    from real_time_mobility_heatmap_spark.sources.tables import load_table

    nov = {r["doc_id"]: r["novelty_ppm"] for r in q_ngram_novelty_report(spark, sf_dir).collect()}
    assert all(0 <= v <= 1_000_000 for v in nov.values())
    pairs = minhash_lsh_pairs(load_table(spark, sf_dir, "documents")).collect()
    assert pairs
    later = {max(p["doc_a"], p["doc_b"]) for p in pairs}
    dup_scores = [nov[d] for d in later if d in nov]
    rest = [v for k, v in nov.items() if k not in later]
    assert sum(dup_scores) / len(dup_scores) < sum(rest) / len(rest), (
        "later near-dup members should be less novel on average"
    )


def test_cluster_quality_report_is_internally_consistent(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators.similarity import (
        N_CENTROIDS,
        q_cluster_quality_report,
    )

    rows = q_cluster_quality_report(spark, sf_dir).collect()
    assert len(rows) == N_CENTROIDS
    total = sum(r["n_members"] for r in rows)
    n_vectors = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert total == n_vectors, "every vector assigned to exactly one cluster"
    for r in rows:
        assert r["inertia_micro"] >= 0 and r["nn_centroid_dist2_micro"] > 0
        assert r["avg_dist2_micro"] == r["inertia_micro"] // r["n_members"]
        assert r["compact"] == (r["avg_dist2_micro"] < r["nn_centroid_dist2_micro"])


def test_bm25_prefers_rare_terms_and_saturates_tf(spark, sf_dir):
    from real_time_mobility_heatmap_spark.operators.textops import (
        BM25_TOP_K,
        q_bm25_top_terms,
    )

    rows = q_bm25_top_terms(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        assert len(doc_rows) <= BM25_TOP_K
        ranks = sorted(r["rank"] for r in doc_rows)
        assert ranks == list(range(1, len(doc_rows) + 1))
        # scores are non-negative (the +1 idf variant) and rank-ordered
        ordered = sorted(doc_rows, key=lambda r: r["rank"])
        scores = [r["bm25"] for r in ordered]
        assert all(s >= 0 for s in scores)
        assert scores == sorted(scores, reverse=True)


def test_embedding_drift_identical_source_has_cosine_one(spark):
    """A source whose docs all equal the corpus centroid direction scores
    1.0; a source pointing the other way scores -1.0 against a centroid
    dominated by the first source."""
    import pyspark.sql.functions as F
    from real_time_mobility_heatmap_spark.operators.similarity import (
        DIM,
        embedding_drift_report,
    )

    e1 = [1.0] + [0.0] * (DIM - 1)
    e2 = [-1.0] + [0.0] * (DIM - 1)
    docs = spark.createDataFrame(
        [(i, "aligned") for i in range(8)] + [(100, "contrarian")],
        "doc_id long, source string",
    )
    embs = spark.createDataFrame(
        [(i, e1) for i in range(8)] + [(100, e2)],
        "vec_id long, embedding array<float>",
    )
    out = {r["source"]: r for r in embedding_drift_report(docs, embs).collect()}
    assert out["aligned"]["centroid_cosine"] == 1.0
    assert out["contrarian"]["centroid_cosine"] == -1.0
    assert out["aligned"]["n_docs"] == 8


def test_filtered_topk_prefilter_vs_postfilter(spark):
    """Pre-filtering searches among passing candidates (always k results
    when enough exist); post-filtering a global top-k can lose
    everything when the neighborhood fails the predicate."""
    from real_time_mobility_heatmap_spark.operators.similarity import (
        DIM,
        TOP_K,
        filtered_topk_recall_report,
        topk_cosine_filtered,
    )

    def vec(axis):
        v = [0.0] * DIM
        v[axis] = 1.0
        return v

    # query 0 points along axis 0; its true global neighbors (axis 0)
    # are all lang=zh, while lang=en docs point along axis 1
    docs = spark.createDataFrame(
        [(i, "zh" if i < 10 else "en") for i in range(1, 20)],
        "doc_id long, lang string",
    )
    embs = spark.createDataFrame(
        [(0, vec(0), 0)]
        + [(i, vec(0) if i < 10 else vec(1), 0) for i in range(1, 20)],
        "vec_id long, embedding array<float>, label int",
    )
    pre = [r for r in topk_cosine_filtered(docs, embs).collect() if r["query_id"] == 0]
    assert len(pre) == TOP_K  # en candidates found despite cosine 0
    assert all(r["cand_id"] >= 10 for r in pre)
    rep = {r["query_id"]: r for r in filtered_topk_recall_report(docs, embs).collect()}
    assert rep[0]["post_survivors"] == 0  # query 0's global top-k was all zh
    assert rep[0]["overlap_ppm"] == 0
