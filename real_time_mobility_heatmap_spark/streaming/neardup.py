"""Live streaming MinHash/LSH near-duplicate ingest.

The batch operators (``operators.dedup.minhash_lsh_pairs`` /
``incremental_dedup``) answer "which documents duplicate each other" over a
static corpus; a pretraining ingest pipeline needs the STREAMING form: as
document batches arrive, find near-duplicates of anything already ingested
(or in the same batch), emit them immediately, and fold the batch into the
accumulated index.

This module runs that loop for real with Structured Streaming:

- the corpus parquet is split into doc_id-ordered micro-batch files and
  streamed with ``maxFilesPerTrigger=1`` under an ``availableNow`` trigger;
- ``foreachBatch`` computes the batch's hashed shingle rows and MinHash
  signatures ONCE, band-joins the batch's LSH bands against the persisted
  signature index (plus itself, for within-batch pairs), verifies candidates
  with exact shingle-intersection Jaccard, appends verified pairs to the
  result sink, and appends the batch's rows + signatures to the index —
  the same KeyedParquetStore-style externalized state the tile sink uses
  (streaming/sinks.py): dedup state lives in a queryable store, not in
  opaque checkpoint files;
- a pair is discovered exactly once — in the batch where its LATER member
  arrives — so the union of per-batch outputs equals the batch pair set
  regardless of arrival order, and the driver's DuckDB oracle can check
  the streamed result against the pure-SQL formulation.

Scale: per micro-batch the work is (batch bands) ⋈ (index bands) — a keyed
equi-join whose left side is batch-sized — plus batch-sized appends. The
index grows like the corpus, but it is PARTITIONED BY band hash on disk, so
each batch's band join prunes to matching partitions; nothing is ever
broadcast or collected. Unlike the capped batch operator, the streamed twin
runs uncapped (the fixture's bucket fanout is tiny); a production deployment
reuses the batch operator's df_cap bucket filter on the band join.

Reference parity: the reference's streaming surface is the Kafka tile
pipeline (reference heatmap_stream.py:79-150); this extends the same
micro-batch + externalized-state pattern to the dedup domain.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_half_up
from ..lineage import cut_lineage
from ..operators.dedup import (
    JACCARD_RATIO_DUCK,
    JACCARD_THRESHOLD,
    MERSENNE_P,
    N_BANDS,
    N_HASHES,
    _band_hash_duck,
    _band_hash_spark,
    _EX_DUCK,
    _hashed_rows,
    _mh_duck,
    _MIX,
    _SHINGLED_DUCK,
)

N_MICRO_BATCHES = 3


def _bands(sigs: DataFrame) -> DataFrame:
    """Signatures -> (doc_id, band, bh, n_sh) LSH band rows.

    One explode pass (r17) — the previous N_BANDS-way union scanned the
    signature relation once per band (guide §2.4 duplicated subtrees;
    same shape as ``operators.dedup._lsh_buckets``). The per-doc shingle
    set size rides along each band row (r18): it lives on the same stats
    row the bands derive from, so the verify stage's two sizes joins
    disappear — the same ride-along idiom as the batch side's
    ``_exploded_hashed`` (guide §2.4, two removed joins per batch)."""
    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), F.expr(_band_hash_spark(b)).alias("bh"))
            for b in range(N_BANDS)
        ]
    )
    return sigs.select("doc_id", "n_sh", F.explode(bands).alias("e")).select(
        "doc_id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh"), "n_sh"
    )


def _verified_pairs(candidates: DataFrame, rows_all: DataFrame) -> DataFrame:
    """Exact-Jaccard verify of (doc_a, doc_b, n_a, n_b) candidates against
    the hashed shingle rows; mirrors operators.dedup._jaccard's
    rounding/threshold. Set sizes arrive ON the candidate rows (see
    ``_bands``), so no sizes relation is joined here."""
    # prune the rows relation to candidate members BEFORE the intersection
    # join: the verify stage's shuffle then carries candidate shingles, not
    # the whole accumulated index, every batch
    # one explode pass over the candidate relation (r17) instead of a
    # union of two scans (guide §2.4)
    members = (
        candidates.select(F.explode(F.array("doc_a", "doc_b")).alias("doc_id"))
        .distinct()
    )
    rows_cand = rows_all.join(members, "doc_id", "left_semi")
    ra = rows_cand.select(F.col("doc_id").alias("doc_a"), "s_h")
    rb = rows_cand.select(F.col("doc_id").alias("doc_b"), "s_h")
    # n_a/n_b are functionally dependent on (doc_a, doc_b) — grouping by
    # all four keys yields exactly the old (doc_a, doc_b) groups
    inter = (
        candidates.join(ra, "doc_a")
        .join(rb, ["doc_b", "s_h"])
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    j = round_half_up(
        F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
    )
    return inter.select("doc_a", "doc_b", j.alias("jaccard")).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )


def run_streaming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the fixture corpus in doc_id-ordered micro-batches through the
    LSH ingest loop and return the per-new-document dup report
    (new_doc_id, dup_of, n_matches, best_jaccard) — hash-matched by the
    driver against the pure-SQL batch oracle."""
    tmp = tempfile.mkdtemp(prefix=f"streaming-neardup-{uuid.uuid4().hex[:8]}-")
    in_dir = os.path.join(tmp, "in")
    # ONE index store, hive-partitioned by kind (rows = hashed shingles,
    # stats = signatures + set sizes) — r18: the two per-batch appends to
    # separate stores were two write jobs; one partitioned append commits
    # both kinds in a single job (and closes the old crash window between
    # the two index appends). Readers prune by the kind partition, so
    # each read still scans only its own files.
    idx_store = os.path.join(tmp, "index")
    out_dir = os.path.join(tmp, "pairs")
    os.makedirs(in_dir)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    schema = docs.schema
    # doc_id-ordered range split -> deterministic micro-batches (arrival
    # order does not affect the result set; it only decides WHICH batch
    # discovers a pair)
    splits = docs.select("doc_id").agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).first()
    lo, hi = splits["lo"], splits["hi"]
    if lo is None:
        # EMPTY corpus: no micro-batches to stream; the dup report is the
        # empty relation (r10 empty-input sweep — total, not a crash)
        return spark.createDataFrame(
            [],
            "new_doc_id long, dup_of long, n_matches long, best_jaccard double",
        )
    span = (hi - lo + N_MICRO_BATCHES) // N_MICRO_BATCHES
    stage = os.path.join(tmp, "stage")
    # one partitioned write produces every micro-batch file in a single job
    docs.withColumn(
        "mb",
        F.least(
            F.lit(N_MICRO_BATCHES - 1),
            F.expr(f"(doc_id - {lo}) div {span}"),
        ),
    ).repartition(N_MICRO_BATCHES, "mb").write.partitionBy("mb").mode(
        # hash-repartition on mb (r17): every row of one mb value lands
        # in ONE task, so each partition dir still gets exactly one file
        # (the copy loop's invariant), but the rewrite runs N-way
        # parallel instead of the old single-task coalesce(1)
        "overwrite"
    ).parquet(stage)
    for i in range(N_MICRO_BATCHES):
        part_dir = os.path.join(stage, f"mb={i}")
        for f in os.listdir(part_dir):
            if f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(part_dir, f),
                    os.path.join(in_dir, f"batch-{i:02d}.parquet"),
                )

    def ingest(batch: DataFrame, batch_id: int) -> None:
        # shingle the batch ONCE; signatures, sizes, and verify rows all
        # derive from the materialized (doc_id, s_h) rows (min over the
        # distinct set == min over the multiset, so signatures agree with
        # the batch operator's formulation)
        b_rows = cut_lineage(_hashed_rows(batch), eager=True)
        mixes = [
            F.min(
                F.expr(f"({a} * (s_h % {MERSENNE_P}) + {b}) % {MERSENNE_P}")
            ).alias(f"mh{k}")
            for k, (a, b) in enumerate(_MIX)
        ]
        # ONE aggregate carries both the MinHash signature and the set
        # size (they share the same doc_id shuffle) -> one store, one
        # append, one read instead of two of each
        # materialized eagerly (r17): this relation is read by the batch
        # band build, the all_stats union (itself scanned by the index
        # band build and the sizes lookup), and the index append — each
        # previously re-ran the signature aggregate over the shingle rows
        b_stats = cut_lineage(
            b_rows.groupBy("doc_id").agg(*mixes, F.count(F.lit(1)).alias("n_sh")),
            eager=True,
        )
        stats_dir = os.path.join(idx_store, "kind=stats")
        have_index = os.path.isdir(stats_dir) and any(
            f.endswith(".parquet") for f in os.listdir(stats_dir)
        )
        mh_cols = [f"mh{k}" for k in range(len(_MIX))]
        if have_index:
            ss = batch.sparkSession
            index = ss.read.parquet(idx_store)
            all_stats = (
                index.filter(F.col("kind") == "stats")
                .select("doc_id", *mh_cols, "n_sh")
                .unionByName(b_stats)
            )
            all_rows = (
                index.filter(F.col("kind") == "rows")
                .select("doc_id", "s_h")
                .unionByName(b_rows)
            )
        else:
            all_stats, all_rows = b_stats, b_rows
        # candidates: batch bands against ALL bands (index + batch), pair
        # canonicalized a < b; require at least one side in this batch —
        # guaranteed because the left side is batch-only. Set sizes ride
        # along the band rows (see _bands), oriented with the pair.
        bb = _bands(b_stats).select(
            F.col("doc_id").alias("d1"), "band", "bh", F.col("n_sh").alias("n1")
        )
        ab = _bands(all_stats).select(
            F.col("doc_id").alias("d2"), "band", "bh", F.col("n_sh").alias("n2")
        )
        a_first = F.col("d1") < F.col("d2")
        candidates = (
            bb.join(ab, ["band", "bh"])
            .filter(F.col("d1") != F.col("d2"))
            .select(
                F.least("d1", "d2").alias("doc_a"),
                F.greatest("d1", "d2").alias("doc_b"),
                F.when(a_first, F.col("n1")).otherwise(F.col("n2")).alias("n_a"),
                F.when(a_first, F.col("n2")).otherwise(F.col("n1")).alias("n_b"),
            )
            .distinct()
        )
        # exactly-once emission needs no dedup state: the left side of the
        # band join is batch-only, so a pair is discoverable only in the
        # first batch where BOTH members exist — i.e. when its second
        # member arrives — regardless of arrival order.
        _verified_pairs(candidates, all_rows).write.mode("append").parquet(out_dir)
        # ONE index append for both kinds, strictly AFTER the pairs append
        # (the crash-replay argument orders pairs before index)
        (
            b_rows.withColumn("kind", F.lit("rows"))
            .unionByName(b_stats.withColumn("kind", F.lit("stats")),
                         allowMissingColumns=True)
            .write.mode("append")
            .partitionBy("kind")
            .parquet(idx_store)
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    pairs = spark.read.parquet(out_dir)
    return pairs.groupBy(F.col("doc_b").alias("new_doc_id")).agg(
        F.min("doc_a").alias("dup_of"),
        F.count(F.lit(1)).alias("n_matches"),
        F.round(F.max("jaccard"), 6).alias("best_jaccard"),
    )


def streaming_neardup_oracle() -> str:
    """Pure-SQL twin: uncapped LSH candidates + exact-Jaccard verify +
    per-later-document report. Must stay in lockstep with the streamed
    pipeline above (same band hashes, same rounding, same threshold)."""
    sig_cols = ", ".join(f"{_mh_duck(k)} AS mh{k}" for k in range(N_HASHES))
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, {_band_hash_duck(b)} AS bh FROM sigs"
        for b in range(N_BANDS)
    )
    return f"""
        WITH {_SHINGLED_DUCK},
        sigs AS (SELECT doc_id, {sig_cols} FROM shingled),
        bands AS ({band_rows}),
        candidates AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.bh = b.bh
                        AND a.doc_id < b.doc_id
        ),
        ex AS ({_EX_DUCK}),
        inter AS (
            SELECT doc_a, doc_b, count(*) AS n_inter,
                   any_value(ea.n_sh) AS n_a, any_value(eb.n_sh) AS n_b
            FROM candidates
            JOIN ex ea ON doc_a = ea.doc_id
            JOIN ex eb ON doc_b = eb.doc_id AND ea.s_h = eb.s_h
            GROUP BY doc_a, doc_b
        ),
        pairs AS (
            SELECT doc_a, doc_b,
                   {JACCARD_RATIO_DUCK} AS jaccard
            FROM inter
            WHERE {JACCARD_RATIO_DUCK}
                  >= {JACCARD_THRESHOLD}
        )
        SELECT doc_b AS new_doc_id,
               min(doc_a) AS dup_of,
               count(*) AS n_matches,
               round(max(jaccard), 6) AS best_jaccard
        FROM pairs
        GROUP BY doc_b
    """
