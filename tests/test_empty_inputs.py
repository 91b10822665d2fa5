"""Empty-input totality (r10 sweep): every registered query must be
TOTAL on a zero-row fixture set — return a well-typed (usually empty)
relation, never crash. This file pins the seven previously-crashing /
diverging paths: ANSI div-by-zero, zero-file schema inference,
unsanitized identifiers from scratch-dir names, footer-stats sentinel,
store-snapshot None, and the per-format roundtrip aggregate. The
cube/rollup grand-total-row divergence vs the SQL standard on empty
input is Spark engine semantics, documented in SCALE.md, and not
asserted here."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry_mod

SRC = "/root/testdata/sf0.001"

# the queries the r10 sweep found crashing on empty input (plus their
# close siblings), each exercising a distinct failure class
PINNED = [
    "dq_expectations",          # ANSI `div` by zero
    "bucketed_join_stats",      # SQL-identifier sanitization ("-" in dir name)
    "partition_pruned_stats",   # zero-file partitioned-read schema inference
    "source_roundtrip",         # per-format aggregate on empty source
    "streaming_tiles",          # store snapshot None -> typed empty frame
    "streaming_positions",
    "streaming_enriched",
    "streaming_sessions",       # flush sentinel with no footer stats
    "streaming_neardup",        # doc_id range split on empty corpus
    "vehicle_trips",
    "lsh_candidate_stats",
    "vband_geometry_report",
    # r13 totality contracts (empty-text / NULL-embedding boundary)
    "quality_score",            # nullif'd punct-ratio denominator
    "media_resize",             # one sentinel row per media row
    "kmeans_update",            # NULL-vector boundary before assignment
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory) -> str:
    # a hyphen in the dir name on purpose: it must not break identifier
    # or path derivation anywhere
    d = tmp_path_factory.mktemp("sf-empty-fixture")
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(SRC, f))
            pq.write_table(t.slice(0, 0), str(d / f))
    return str(d)


@pytest.mark.parametrize("name", PINNED)
def test_query_is_total_on_empty_fixtures(spark, empty_sf_dir, name):
    df = entry_mod.queries()[name](spark, empty_sf_dir)
    rows = df.collect()  # must not raise
    assert df.schema.fieldNames(), "result must keep a typed schema"
    # report-shaped queries may legitimately emit summary rows over an
    # empty corpus; row-shaped ones must be empty
    assert isinstance(rows, list)


@pytest.fixture(scope="module")
def degenerate_sf_dir(tmp_path_factory) -> str:
    """ALL-IDENTICAL corpus: every document the same text, every
    embedding the same vector — maximum cap stress (each LSH bucket holds
    the whole corpus)."""
    import shutil

    import pyarrow as pa

    d = tmp_path_factory.mktemp("sf-degenerate")
    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    n = docs.num_rows
    text = docs.column("text")[0].as_py()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array([text] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array([f"src{i % 3}" for i in range(n)], pa.string()),
                "n_chars": pa.array([len(text)] * n, pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    v = emb.column("embedding")[0].as_py()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(emb.num_rows), pa.int64()),
                "embedding": pa.array([v] * emb.num_rows, pa.list_(pa.float32())),
                "label": pa.array([0] * emb.num_rows, pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f not in ("documents.parquet", "embeddings.parquet"):
            shutil.copy(os.path.join(SRC, f), str(d / f))
    return str(d)


def test_degenerate_corpus_division_of_labor(spark, degenerate_sf_dir):
    """On an all-identical corpus the caps must drop every over-full LSH
    bucket (near-dup pipelines emit ZERO pairs — identical docs are
    exact-dedup's job, and an uncapped design would emit corpus^2 pairs)
    while exact_dedup collapses the corpus to one keeper group. The full
    family was also differentially matched against the DuckDB oracles on
    this corpus shape (r10)."""
    qs = entry_mod.queries()
    stats = qs["lsh_candidate_stats"](spark, degenerate_sf_dir).collect()[0]
    assert stats["n_buckets"] == 0 and stats["n_candidates"] == 0, stats
    assert qs["minhash_lsh_pairs"](spark, degenerate_sf_dir).count() == 0
    assert qs["embedding_neardup"](spark, degenerate_sf_dir).count() == 0
    keepers = qs["exact_dedup"](spark, degenerate_sf_dir).collect()
    assert len(keepers) == 1, "one identical-content group"
    assert keepers[0]["n_copies"] > 1 and keepers[0]["keeper_doc_id"] == 0


@pytest.fixture(scope="module")
def null_text_sf_dir(tmp_path_factory) -> str:
    """Corpus with NULL text / lang values sprinkled in."""
    import shutil

    import pyarrow as pa

    d = tmp_path_factory.mktemp("sf-null-text")
    docs = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pydict()
    for i in range(len(docs["doc_id"])):
        if i % 10 == 0:
            docs["text"][i] = None
        if i % 7 == 0:
            docs["lang"][i] = None
    pq.write_table(pa.table(docs), str(d / "documents.parquet"))
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copy(os.path.join(SRC, f), str(d / f))
    return str(d)


def test_media_family_skips_null_payloads(spark, null_text_sf_dir):
    """NULL document payloads crashed every media mapInPandas pass
    (len(None) inside the Arrow batch — r10 null-input sweep); the media
    table now excludes payload-less rows, mirrored in the oracles. The
    full registry was differentially matched against DuckDB on this
    corpus shape (185/185)."""
    qs = entry_mod.queries()
    n_docs = pq.read_table(os.path.join(SRC, "documents.parquet")).num_rows
    n_null = len(range(0, n_docs, 10))
    for name in ("media_metadata", "media_features", "media_frame_sample",
                 "media_resize", "media_phash"):
        df = qs[name](spark, null_text_sf_dir)
        rows = df.collect()  # must not raise
        if name != "media_frame_sample":  # 1 row per doc elsewhere
            assert len(rows) == n_docs - n_null, (name, len(rows))


def test_degenerate_corpus_curation_family_well_defined(spark, degenerate_sf_dir):
    """r10 curation family on the all-identical corpus: the per-source
    cap still keeps exactly CAP rows per source (a uniform sample of
    identical docs is still a sample), padding collapses to ONE bucket
    with identical waste, and fertility is one row per (lang, source)
    with identical ratios — no crashes, no division surprises."""
    from real_time_mobility_heatmap_spark.operators.curation import CAP_PER_SOURCE

    qs = entry_mod.queries()
    capped = qs["per_source_cap"](spark, degenerate_sf_dir).collect()
    per_src = {}
    for r in capped:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
    assert set(per_src.values()) == {CAP_PER_SOURCE}
    pad = qs["padding_waste_report"](spark, degenerate_sf_dir).collect()
    assert len(pad) == 1  # identical docs -> one length bucket
    fert = qs["tokenizer_fertility_report"](spark, degenerate_sf_dir).collect()
    assert len(fert) == 3  # en x src0/1/2
    assert len({r["fertility_ppm"] for r in fert}) == 1  # identical ratios
