"""Multimodal column plumbing (SURVEY.md §2.11).

Pattern: media (image/audio/video) lives in an opaque ``binary`` column with
typed metadata alongside; decode / feature-extract / resize / frame-sample
run as Arrow-batched pandas functions over ``mapInPandas``, so bytes never
round-trip per-row and the batch shape is columnar end-to-end.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_media`` raises NotImplementedError by default and tests/queries use
``fake_features`` — a deterministic pure-bytes feature extractor with the
exact same Spark-side plumbing (schema, batching, partitioning). Swapping in
a real codec changes only the per-batch pandas function.

The fixture ``documents.text`` (UTF-8 encoded) stands in for media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lineage import cut_lineage
from ..sources.tables import load_table, spread

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)


def media_table(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, content binary, metadata struct).

    Rows with NULL payload are excluded — a media table has no row
    without bytes, and a NULL content blob crashed every downstream
    Arrow ``len(content)`` pass (r10 null-input sweep); the media
    oracles carry the same ``WHERE text IS NOT NULL``."""
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").alias("declared_size"),
            _media_type(F.col("source")).alias("media_type"),
        ).alias("meta"),
    )


def _media_type(source):
    bucket = F.substring(source, 4, 8).cast("int") % 3
    return (
        F.when(bucket == 0, F.lit("image"))
        .when(bucket == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )


def decode_media(content_bytes: bytes, media_type: str):  # pragma: no cover
    """Real decoder hook — requires codec libraries absent from this
    container (PIL/opencv/torchaudio). Plug in per media_type."""
    raise NotImplementedError(
        f"no codec available for {media_type}; install a decoder and "
        "replace fake_features with a real per-batch extractor"
    )


def _segment_sums(blob_all: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Exact per-segment byte sums over a concatenated uint8 buffer via
    prefix sums: sums[i] = csum[start+len] - csum[start]. Correct for
    empty segments ANYWHERE in the batch (an empty segment's slice is
    [s, s) -> 0) — unlike ``np.add.reduceat``, whose equal/clamped
    offsets at empty or trailing-empty segments silently corrupt the
    neighboring segment's sum (the r2 bug this replaced)."""
    csum = np.concatenate(([0], np.cumsum(blob_all, dtype=np.int64)))
    return csum[starts + lens] - csum[starts]


def fake_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in extractor: pure-bytes stats per media blob.

    Truly vectorized per Arrow batch: all blobs are concatenated into one
    uint8 array and per-blob byte sums come from one prefix-sum pass
    (``_segment_sums``) — no per-row Python iteration over the bytes.
    checksum is an adler-like modular sum; fake dimensions derive from it
    so downstream schema plumbing is exercised.
    """
    for pdf in batches:
        content = pdf["content"]
        lens = content.map(len).to_numpy(dtype=np.int64)
        if int(lens.sum()) == 0:
            checks = np.zeros(len(content), dtype=np.int64)
        else:
            blob = np.frombuffer(b"".join(content), dtype=np.uint8)
            starts = np.cumsum(lens) - lens
            checks = _segment_sums(blob, starts, lens) % 65521
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": lens.astype("int32"),
                "checksum": checks.astype("int64"),
                "fake_width": (checks % 640 + 16).astype("int32"),
                "fake_height": (checks % 480 + 16).astype("int32"),
            }
        )


def media_features(docs: DataFrame) -> DataFrame:
    """binary column -> feature columns via mapInPandas (Arrow batches)."""
    media = media_table(spread(docs)).select("doc_id", "content")
    return media.mapInPandas(fake_features, FEATURE_SCHEMA)


# Byte-exact oracle plumbing (r13 unicode sweep): the Arrow extractors
# operate on the UTF-8 BYTES of the blob, and the oracles previously
# spelled that per CHARACTER (unicode(c) sums, substr windows) under a
# "fixture text is ASCII, so octets == characters" caveat — the first
# multibyte corpus split every media query (a CJK char is one unicode(c)
# term of ~0x4E00 but three UTF-8 bytes). The twins now read the byte
# sequence itself from hex(encode(text)): 2 hex chars per byte, byte j
# (1-based) = '0x' || substr(h, 2j-1, 2) — exact for ANY text. (A
# zero-length blob yields an empty generate_series -> COALESCE 0, which
# also retires the old nullif('' -> unicode = -1) sentinel hack.)
_HEX_DOCS = (
    "SELECT doc_id, hex(encode(text)) AS h,"
    " CAST(strlen(text) AS BIGINT) AS n"
    " FROM documents WHERE text IS NOT NULL"
)


def _byte_sum_duck(start: str, length: str) -> str:
    """Sum of blob bytes [start, start+length) (1-based), 0 when empty."""
    return (
        "COALESCE(list_sum(list_transform(generate_series("
        f"CAST({start} AS BIGINT),"
        f" CAST({start} AS BIGINT) + CAST({length} AS BIGINT) - 1),"
        " j -> CAST('0x' || substr(h, CAST(2 * j - 1 AS BIGINT), 2)"
        " AS BIGINT))), 0)"
    )


def media_features_oracle() -> str:
    """SQL twin of the Arrow extractor: the same adler-like modular sum
    over the UTF-8 bytes and the derived fake dimensions — upgrading
    media_features from a rows-only check to a full value-hash check of
    the mapInPandas path."""
    return f"""
        WITH feats AS (
            SELECT doc_id,
                   CAST(n AS INTEGER) AS byte_len,
                   CAST({_byte_sum_duck('1', 'n')} % 65521 AS BIGINT)
                       AS checksum
            FROM ({_HEX_DOCS})
        )
        SELECT doc_id, byte_len, checksum,
               CAST(checksum % 640 + 16 AS INTEGER) AS fake_width,
               CAST(checksum % 480 + 16 AS INTEGER) AS fake_height
        FROM feats
    """


FRAME_BYTES = 64       # stand-in frame size (a real codec yields frames)
FRAME_STRIDE = 4       # keep every 4th frame

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_len", T.IntegerType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame sampler over binary blobs: split each blob into fixed-size
    frames, keep every ``FRAME_STRIDE``-th, emit per-frame stats. A real
    video pipeline swaps the byte-window splitter for a codec's frame
    iterator — the Spark-side contract (1 input row -> N output rows via
    mapInPandas) is identical.

    Fully vectorized: kept-frame offsets for the WHOLE batch come from
    one repeat/arange composition (no per-row Python loop, no per-frame
    byte slicing) and checksums from one prefix-sum pass over the
    concatenated blobs."""
    for pdf in batches:
        content = pdf["content"]
        blob_lens = content.map(len).to_numpy(dtype=np.int64)
        n_frames = (blob_lens + FRAME_BYTES - 1) // FRAME_BYTES
        n_kept = (n_frames + FRAME_STRIDE - 1) // FRAME_STRIDE
        total_kept = int(n_kept.sum())
        row = np.repeat(np.arange(len(content)), n_kept)
        # per-row 0..n_kept-1 counter -> frame index via the stride
        kept_starts = np.cumsum(n_kept) - n_kept
        frame_idx = (np.arange(total_kept) - kept_starts[row]) * FRAME_STRIDE
        off_in_blob = frame_idx * FRAME_BYTES
        frame_len = np.minimum(blob_lens[row] - off_in_blob, FRAME_BYTES)
        if total_kept and int(blob_lens.sum()) > 0:
            blob_all = np.frombuffer(b"".join(content), dtype=np.uint8)
            blob_starts = np.cumsum(blob_lens) - blob_lens
            checks = _segment_sums(blob_all, blob_starts[row] + off_in_blob, frame_len) % 65521
        else:
            checks = np.zeros(total_kept, dtype=np.int64)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy()[row],
                "frame_idx": frame_idx.astype(np.int32),
                "frame_len": frame_len.astype(np.int32),
                "frame_checksum": checks,
            }
        )


def media_frame_sample(docs: DataFrame) -> DataFrame:
    """binary -> sampled frame rows via mapInPandas (1 row -> N rows)."""
    media = media_table(spread(docs)).select("doc_id", "content")
    return media.mapInPandas(sample_frames, FRAME_SCHEMA)


def media_frame_sample_oracle() -> str:
    """SQL twin of the frame sampler — the Arrow path is value-checked,
    not just row-counted: 64-BYTE windows over the UTF-8 byte sequence
    (via the hex spelling — a char-based substr would mis-slice
    multibyte text; r13 unicode sweep) with the same modular sum."""
    return f"""
        WITH idx AS (
            SELECT doc_id, h, n,
                   unnest(generate_series(0,
                       CAST(ceil(n / CAST({FRAME_BYTES} AS DOUBLE)) AS BIGINT) - 1
                   )) AS i
            FROM ({_HEX_DOCS})
        ),
        frames AS (
            SELECT doc_id, CAST(i AS INTEGER) AS frame_idx, h,
                   1 + i * {FRAME_BYTES} AS off1,
                   least(n - i * {FRAME_BYTES}, {FRAME_BYTES}) AS flen
            FROM idx WHERE i % {FRAME_STRIDE} = 0
        )
        SELECT doc_id, frame_idx,
               CAST(flen AS INTEGER) AS frame_len,
               CAST({_byte_sum_duck('off1', 'flen')} % 65521 AS BIGINT)
                   AS frame_checksum
        FROM frames
    """


RESIZE_TARGET = 32  # stand-in "pixel" count after resampling

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("resized_len", T.IntegerType()),
        T.StructField("resized_checksum", T.LongType()),
    ]
)


def resize_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Nearest-neighbor byte resampling to ``RESIZE_TARGET`` samples — the
    resize stage of an image pipeline with the codec swapped for raw
    bytes (a real implementation resamples a decoded pixel grid; the
    Spark-side contract and batch shape are identical). Vectorized: one
    gather per blob via integer index arithmetic, no per-byte Python.
    """
    idx = np.arange(RESIZE_TARGET, dtype=np.int64)
    for pdf in batches:
        content = pdf["content"]
        blob_lens = content.map(len).to_numpy(dtype=np.int64)
        checks = np.zeros(len(pdf), dtype=np.int64)
        lens = np.zeros(len(pdf), dtype=np.int32)
        nz = np.flatnonzero(blob_lens)
        if len(nz):
            # one gather for the whole batch: floor(i * n / target) per
            # (non-empty row, sample) via an outer product — no per-row loop
            blob_all = np.frombuffer(b"".join(content), dtype=np.uint8)
            blob_starts = np.cumsum(blob_lens) - blob_lens
            take = (idx[None, :] * blob_lens[nz, None]) // RESIZE_TARGET
            gathered = blob_all[blob_starts[nz, None] + take].astype(np.int64)
            checks[nz] = gathered.sum(axis=1) % 65521
            lens[nz] = RESIZE_TARGET
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "resized_len": lens,
                "resized_checksum": checks,
            }
        )


def media_resize(docs: DataFrame) -> DataFrame:
    """binary -> fixed-size resampled representation via mapInPandas."""
    media = media_table(spread(docs)).select("doc_id", "content")
    return media.mapInPandas(resize_media, RESIZE_SCHEMA)


def media_resize_oracle() -> str:
    """SQL twin: the same nearest-neighbor index math over the UTF-8
    BYTE sequence (hex spelling — char indexing diverges on multibyte
    text; r13 unicode sweep), so the Arrow resize path is value-checked.
    Totality contract (r13 empty-blob sweep): EVERY media row yields
    exactly one representation row — a zero-length blob resizes to the
    (len 0, checksum 0) sentinel, matching the Arrow extractor, rather
    than disappearing from the output."""
    byte_at = (
        "CAST('0x' || substr(h,"
        f" CAST(2 * (1 + (i * n) // {RESIZE_TARGET}) - 1 AS BIGINT), 2)"
        " AS BIGINT)"
    )
    return f"""
        WITH samples AS (
            SELECT doc_id, {byte_at} AS b
            FROM ({_HEX_DOCS}),
                 unnest(generate_series(0, {RESIZE_TARGET - 1})) AS t(i)
            WHERE n > 0
        ),
        agg AS (
            SELECT doc_id,
                   CAST(count(*) AS INTEGER) AS resized_len,
                   CAST(sum(b) % 65521 AS BIGINT) AS resized_checksum
            FROM samples GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.resized_len, 0) AS resized_len,
               coalesce(a.resized_checksum, 0) AS resized_checksum
        FROM documents d LEFT JOIN agg a USING (doc_id)
        WHERE d.text IS NOT NULL
    """


def media_metadata(docs: DataFrame) -> DataFrame:
    """Typed-metadata projection (SQL-checkable half of the pipeline)."""
    m = media_table(docs)
    return m.select(
        "doc_id",
        F.octet_length(F.col("content")).alias("byte_len"),
        F.col("meta.origin").alias("origin"),
        F.col("meta.declared_size").alias("declared_size"),
        F.col("meta.media_type").alias("media_type"),
    )


MEDIA_METADATA_ORACLE = """
    SELECT doc_id,
           CAST(strlen(text) AS INTEGER) AS byte_len,
           source AS origin,
           n_chars AS declared_size,
           CASE CAST(substr(source, 4, 8) AS BIGINT) % 3
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
           END AS media_type
    FROM documents WHERE text IS NOT NULL
"""


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_metadata(load_table(spark, sf_dir, "documents"))


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_features(load_table(spark, sf_dir, "documents"))


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_frame_sample(load_table(spark, sf_dir, "documents"))


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_resize(load_table(spark, sf_dir, "documents"))


PHASH_REGIONS = 15      # nibbles in the hash (60 bits, signed-int64-safe)
PHASH_BANDS = 5         # 3 nibbles (12 bits) per band
PHASH_BUCKET_CAP = 64   # hot-bucket guard, mirrored in the oracle
PHASH_NEAR_NIBBLES = 3  # verified-near threshold (nibble hamming distance)

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("phash", T.LongType()),
    ]
)


def region_phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Region-sum perceptual-style hash over raw media bytes.

    The blob splits into ``PHASH_REGIONS`` equal byte regions; each
    contributes one nibble (region byte-sum mod 16), so a local edit
    flips ONLY its region's nibble — the locality property a real
    perceptual hash (pHash/aHash DCT variants) provides for images,
    reproduced here on the byte plane so the banding/verify plumbing is
    exercised without codecs. Vectorized like ``fake_features``: one
    concatenated uint8 buffer, one prefix-sum, 15 segment sums per blob
    read off it (no per-row byte loops).
    """
    R = PHASH_REGIONS
    for pdf in batches:
        content = pdf["content"]
        lens = content.map(len).to_numpy(dtype=np.int64)
        n = len(content)
        if n == 0 or int(lens.sum()) == 0:
            ph = np.zeros(n, dtype=np.int64)
        else:
            blob = np.frombuffer(b"".join(content), dtype=np.uint8)
            csum = np.concatenate(([0], np.cumsum(blob, dtype=np.int64)))
            blob_starts = (np.cumsum(lens) - lens)[:, None]
            idx = np.arange(R + 1)[None, :]
            bounds = blob_starts + (idx * lens[:, None]) // R  # (n, R+1)
            seg = csum[bounds[:, 1:]] - csum[bounds[:, :-1]]   # (n, R)
            nibbles = (seg % 16).astype(np.int64)
            ph = (nibbles << (4 * np.arange(R, dtype=np.int64))[None, :]).sum(axis=1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": lens.astype("int32"),
                "phash": ph,
            }
        )


def media_phash(docs: DataFrame) -> DataFrame:
    media = media_table(spread(docs)).select("doc_id", "content")
    return media.mapInPandas(region_phash, PHASH_SCHEMA)


def _phash_duck() -> str:
    """DuckDB twin over the UTF-8 BYTE regions (hex spelling — the
    char-slice form diverged on multibyte text; r13 unicode sweep)."""
    R = PHASH_REGIONS
    terms = []
    for i in range(R):
        start = f"(n * {i}) // {R} + 1"
        length = f"(n * {i + 1}) // {R} - (n * {i}) // {R}"
        seg = f"CAST({_byte_sum_duck(start, length)} % 16 AS BIGINT)"
        terms.append(f"{seg} * {16 ** i}")
    expr = " + ".join(terms)
    return f"""
        SELECT doc_id,
               CAST(n AS INTEGER) AS byte_len,
               CAST({expr} AS BIGINT) AS phash
        FROM ({_HEX_DOCS})
    """


def media_phash_oracle() -> str:
    return _phash_duck()


def media_phash_pairs(docs: DataFrame) -> DataFrame:
    """Hamming-banded near-duplicate candidates over the media phash —
    the multimodal member of the dedup family.

    LSH-style: 5 bands of 12 bits; blobs sharing any band become a
    candidate pair (capped buckets — the repo-wide hot-bucket guard),
    then the EXACT nibble hamming distance verifies each candidate.
    Emits every candidate with its distance and the ``is_near`` verdict
    (distance <= 3 of 15 nibbles), so the report doubles as the
    collision/selectivity audit for sizing bands at corpus scale.
    """
    # the phash relation is lineage-cut: it feeds the banding AND both
    # verify sides, and without the cut the full media hash pass
    # re-plans into each (3 scans in the r12 audit, none filter-pushed).
    # (doc_id, phash) is one int64 per blob — materializing it once is
    # the cheapest relation in the pipeline (r12 frontier-cut rule).
    ph = cut_lineage(media_phash(docs), eager=False)
    banded = ph.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {PHASH_BANDS - 1}),"
                f" b -> struct(b AS band,"
                f" shiftright(phash, 12 * b) & 4095 AS bv))"
            )
        ).alias("e"),
    ).select("doc_id", "e.band", "e.bv")
    # over-cap buckets dropped before their arrays materialize, and pairs
    # streamed via two-level explode rather than one flatten of all
    # C(|ds|, 2) structs (dedup helpers — r10 OOM-at-the-cap audit)
    from .dedup import _capped_sorted_buckets, _explode_pairs_ids

    buckets = _capped_sorted_buckets(banded, ["band", "bv"], "doc_id", PHASH_BUCKET_CAP)
    pairs = _explode_pairs_ids(buckets).distinct()
    pa = ph.select(F.col("doc_id").alias("doc_a"), F.col("phash").alias("ph_a"))
    pb = ph.select(F.col("doc_id").alias("doc_b"), F.col("phash").alias("ph_b"))
    return (
        pairs.join(pa, "doc_a")
        .join(pb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                f"aggregate(sequence(0, {PHASH_REGIONS - 1}), 0,"
                " (acc, i) -> acc + IF((shiftright(ph_a ^ ph_b, 4 * i) & 15) != 0, 1, 0))"
            ).alias("nibble_dist"),
        )
        .withColumn("is_near", F.col("nibble_dist") <= PHASH_NEAR_NIBBLES)
    )


def media_phash_pairs_oracle() -> str:
    return f"""
    WITH ph AS ({_phash_duck()}),
    banded AS (
        SELECT doc_id, b, (phash >> (12 * b)) & 4095 AS bv
        FROM ph, (SELECT unnest(generate_series(0, {PHASH_BANDS - 1})) AS b)
    ),
    sized AS (
        SELECT b, bv FROM banded GROUP BY b, bv
        HAVING count(*) BETWEEN 2 AND {PHASH_BUCKET_CAP}
    ),
    pairs AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM banded x
        JOIN banded y ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id
        JOIN sized s ON s.b = x.b AND s.bv = x.bv
    )
    SELECT p.doc_a, p.doc_b,
           CAST(list_sum(list_transform(generate_series(0, {PHASH_REGIONS - 1}),
                i -> CASE WHEN (xor(pa.phash, pb.phash) >> (4 * i)) & 15 != 0
                     THEN 1 ELSE 0 END)) AS INTEGER) AS nibble_dist,
           CAST(list_sum(list_transform(generate_series(0, {PHASH_REGIONS - 1}),
                i -> CASE WHEN (xor(pa.phash, pb.phash) >> (4 * i)) & 15 != 0
                     THEN 1 ELSE 0 END)) AS INTEGER) <= {PHASH_NEAR_NIBBLES}
               AS is_near
    FROM pairs p
    JOIN ph pa ON pa.doc_id = p.doc_a
    JOIN ph pb ON pb.doc_id = p.doc_b
"""


def q_media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_phash(load_table(spark, sf_dir, "documents"))


def q_media_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_phash_pairs(load_table(spark, sf_dir, "documents"))
