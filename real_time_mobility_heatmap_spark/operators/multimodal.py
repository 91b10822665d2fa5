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
    """documents -> (doc_id, content binary, metadata struct)."""
    return docs.select(
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


def fake_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in extractor: pure-bytes stats per media blob.

    Truly vectorized per Arrow batch: all blobs are concatenated into one
    uint8 array and per-blob byte sums come from a single
    ``np.add.reduceat`` — no per-row Python iteration over the bytes.
    checksum is an adler-like modular sum; fake dimensions derive from it
    so downstream schema plumbing is exercised.
    """
    for pdf in batches:
        content = pdf["content"]
        lens = content.map(len).to_numpy(dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            checks = np.zeros(len(content), dtype=np.int64)
        else:
            blob = np.frombuffer(b"".join(content), dtype=np.uint8).astype(np.int64)
            starts = np.cumsum(lens) - lens
            # reduceat: equal consecutive offsets (empty blobs) yield a
            # bogus single element — masked to 0 below; clamp keeps
            # offsets in-bounds when trailing blobs are empty
            sums = np.add.reduceat(blob, np.minimum(starts, total - 1))
            checks = np.where(lens > 0, sums, 0) % 65521
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
    FROM documents
"""


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_metadata(load_table(spark, sf_dir, "documents"))


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_features(load_table(spark, sf_dir, "documents"))
