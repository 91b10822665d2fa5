"""Deduplication operators over ``documents`` (SURVEY.md §2.11).

Four tiers, each a standard training-data pipeline primitive and each a
pure-DataFrame plan (no Python UDFs — hashes are md5-derived column math so
the DuckDB oracle can reproduce them bit-for-bit; see functions/textfns.py):

- exact:      group by content -> keeper id + copy count;
- minhash+LSH: shingle -> k seeded min-hashes -> banded bucket join ->
               candidate pairs -> exact-Jaccard verify. The LSH join is the
               100 TB path: candidates come from equi-joins on band hashes,
               never an all-pairs product;
- simhash:    per-token hashes -> signed bit sums -> compact fingerprint;
- ngram-jaccard: ground-truth near-dup pairs via shared-shingle equi-join
               (the verify stage without the LSH prefilter).

Scale notes: every pair-generating join is an equi-join on a hash key
(band hash / shingle), so Spark shuffles on that key; hot shingles (very
common n-grams) are the skew risk — mitigated by dropping top-frequency
shingles (stopword shingles carry no dedup signal anyway) the same way in
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import (
    TOKENS_DUCK,
    hash60_duck_sql,
    hash60_spark_sql,
    shingles,
    shingles_duck,
    tokens,
)
from ..sources.tables import load_table, spread

N_HASHES = 8          # MinHash signature length
N_BANDS = 4           # LSH bands (2 rows per band)
ROWS_PER_BAND = N_HASHES // N_BANDS
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 16


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup by full content: keeper = min doc_id per text group."""
    return docs.groupBy(F.sha2(F.col("text"), 256).alias("content_sha256")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


EXACT_DEDUP_ORACLE = """
    SELECT sha256(text) AS content_sha256,
           min(doc_id) AS keeper_doc_id,
           count(*) AS n_copies
    FROM documents GROUP BY sha256(text)
"""


def _shingled(docs: DataFrame) -> DataFrame:
    """doc_id + distinct 3-gram shingle set (docs with >= 3 tokens)."""
    t = spread(docs).select("doc_id", tokens(F.col("text")).alias("toks"))
    return (
        t.filter(F.size("toks") >= 3)
        .select("doc_id", shingles("toks").alias("sh"))
    )


_SHINGLED_DUCK = f"""
    shingled AS (
        SELECT doc_id, {shingles_duck(TOKENS_DUCK)} AS sh
        FROM documents
        WHERE len({TOKENS_DUCK}) >= 3
    )
"""


# k hash functions derived from ONE md5 per shingle by affine mixing mod a
# Mersenne prime: h_k(x) = (a_k * (h(x) % P) + b_k) % P. One string hash
# instead of k — 8x less md5 work — and (h%P) < 2^31, a_k < 2^31, so the
# product stays under 2^62: exact in signed 64-bit integer arithmetic in
# both engines (no overflow, no float).
MERSENNE_P = 2147483647  # 2^31 - 1
_MIX = [(1103515245, 12345), (1229782938, 2749), (1012345679, 999331),
        (715827883, 453), (999999937, 71993), (824633721, 1299827),
        (537847123, 65537), (190739471, 7919)]
assert len(_MIX) == N_HASHES


def _mh_expr(k: int, hash60_sql) -> str:
    a, b = _MIX[k]
    base = f"({hash60_sql('x')} % {MERSENNE_P})"
    return f"(({a} * {base} + {b}) % {MERSENNE_P})"


def _mh_from_hashed(k: int) -> str:
    """min over pre-hashed shingles of the k-th affine mix (md5 hoisted)."""
    a, b = _MIX[k]
    return f"array_min(transform(shl, h -> ({a} * (h % {MERSENNE_P}) + {b}) % {MERSENNE_P}))"


def _mh_duck(k: int) -> str:
    return f"list_min(list_transform(sh, x -> {_mh_expr(k, hash60_duck_sql)}))"


def _hashed_shingles(docs: DataFrame) -> DataFrame:
    """doc_id + 60-bit-hashed shingle array. The md5 pass happens ONCE in
    this projection; signatures/bands/verify all derive from the integer
    array (Spark won't CSE md5 across 8 separate lambdas otherwise)."""
    return _shingled(docs).select(
        "doc_id", F.expr(f"transform(sh, x -> {hash60_spark_sql('x')})").alias("shl")
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """k min-hashes per document (the MinHash signature)."""
    return _hashed_shingles(docs).select(
        "doc_id", *[F.expr(_mh_from_hashed(k)).alias(f"mh{k}") for k in range(N_HASHES)]
    )


def minhash_signatures_oracle() -> str:
    cols = ", ".join(f"{_mh_duck(k)} AS mh{k}" for k in range(N_HASHES))
    return f"WITH {_SHINGLED_DUCK} SELECT doc_id, {cols} FROM shingled"


def _band_hash_spark(b: int) -> str:
    parts = ", ".join(f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
    return f"md5(concat_ws(':', {parts}))"


def _band_hash_duck(b: int) -> str:
    parts = ", ".join(f"CAST(mh{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND))
    return f"md5(concat_ws(':', {parts}))"


def minhash_lsh_pairs(docs: DataFrame) -> DataFrame:
    """MinHash -> LSH banding -> candidate pairs -> exact-Jaccard verify.

    Emits (doc_a, doc_b, jaccard) for verified near-duplicates. The band
    bucket join only compares documents agreeing on a full band — at scale
    this is a shuffle on band_hash, not an all-pairs product.
    """
    sigs = minhash_signatures(docs)
    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), F.expr(_band_hash_spark(b)).alias("bh"))
            for b in range(N_BANDS)
        ]
    )
    exploded = sigs.select("doc_id", F.explode(bands).alias("e")).select(
        "doc_id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    candidates = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verify_jaccard(docs, candidates)


def _exploded_hashed(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(doc_id, shingle-hash) rows + per-doc set sizes.

    Shingles are hashed to 60-bit ints *before* any join: integer join keys
    shuffle a fraction of the bytes of long n-gram strings. The same hash is
    applied in the oracle, so even the (negligible) collision behavior is
    identical in both engines.
    """
    hashed = _hashed_shingles(docs)
    ex = hashed.select("doc_id", F.explode("shl").alias("s_h"))
    sizes = hashed.select("doc_id", F.size("shl").alias("n_sh"))
    return ex, sizes


def _jaccard_from_inter(inter: DataFrame, sizes: DataFrame) -> DataFrame:
    out = (
        inter.join(F.broadcast(sizes.alias("sa")), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sizes.alias("sb")), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= JACCARD_THRESHOLD)


def _verify_jaccard(docs: DataFrame, candidates: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs, thresholded."""
    ex, sizes = _exploded_hashed(docs)
    inter = (
        candidates.join(ex.alias("ea"), F.col("doc_a") == F.col("ea.doc_id"))
        .join(
            ex.alias("eb"),
            (F.col("doc_b") == F.col("eb.doc_id")) & (F.col("ea.s_h") == F.col("eb.s_h")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return _jaccard_from_inter(inter, sizes)


def minhash_lsh_pairs_oracle() -> str:
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, {_band_hash_duck(b)} AS bh FROM sigs"
        for b in range(N_BANDS)
    )
    sig_cols = ", ".join(f"{_mh_duck(k)} AS mh{k}" for k in range(N_HASHES))
    return f"""
        WITH {_SHINGLED_DUCK},
        sigs AS (SELECT doc_id, {sig_cols} FROM shingled),
        bands AS ({band_rows}),
        candidates AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        ),
        ex AS (SELECT doc_id, unnest(list_transform(sh, x -> {hash60_duck_sql('x')})) AS s_h FROM shingled),
        sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shingled),
        inter AS (
            SELECT doc_a, doc_b, count(*) AS n_inter
            FROM candidates
            JOIN ex ea ON doc_a = ea.doc_id
            JOIN ex eb ON doc_b = eb.doc_id AND ea.s_h = eb.s_h
            GROUP BY doc_a, doc_b
        )
        SELECT doc_a, doc_b,
               round(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE round(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) >= {JACCARD_THRESHOLD}
    """


def ngram_jaccard_pairs(docs: DataFrame) -> DataFrame:
    """Ground-truth near-dup pairs: candidates = any shared shingle.

    The intersection count falls straight out of the shingle self-join
    (shingle sets are distinct, so count(*) per pair == |A ∩ B|) — one
    aggregation, no candidate->re-explode verify pass.
    """
    ex, sizes = _exploded_hashed(docs)
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), (F.col("a.s_h") == F.col("b.s_h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return _jaccard_from_inter(inter, sizes)


NGRAM_JACCARD_ORACLE = f"""
    WITH {_SHINGLED_DUCK},
    ex AS (SELECT doc_id, unnest(list_transform(sh, x -> {hash60_duck_sql('x')})) AS s_h FROM shingled),
    sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shingled),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM ex a JOIN ex b ON a.s_h = b.s_h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE round(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) >= {JACCARD_THRESHOLD}
"""


def simhash(docs: DataFrame) -> DataFrame:
    """SimHash fingerprint: signed per-bit sums of token hashes.

    Token multiplicity is the weight (classic SimHash). 16 bits keeps the
    fingerprint SQL-portable; production would use 64 via the same plan.
    """
    tok = spread(docs).select("doc_id", F.explode(tokens(F.col("text"))).alias("tk"))
    h = F.expr(hash60_spark_sql("tk"))
    tok = tok.select("doc_id", h.alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.expr(f"(h >> {i}) & 1") == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{i}") > 0, F.lit(2**i)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.alias("simhash16"))


def simhash_oracle() -> str:
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {2**i} ELSE 0 END)" for i in range(SIMHASH_BITS)
    )
    return f"""
        WITH tok AS (
            SELECT doc_id, {hash60_duck_sql('tk')} AS h
            FROM (SELECT doc_id, unnest({TOKENS_DUCK}) AS tk FROM documents)
        ),
        agg AS (SELECT doc_id, {bit_sums} FROM tok GROUP BY doc_id)
        SELECT doc_id, {fp} AS simhash16 FROM agg
    """


def streaming_exact_dedup(events: DataFrame) -> DataFrame:
    """Batch twin of streaming dropDuplicates on the natural event key
    (streaming variant: dropDuplicatesWithinWatermark, tested in tests/)."""
    return events.dropDuplicates(["event_id"]).select("event_id", "user_id", "event_type")


STREAMING_EXACT_DEDUP_ORACLE = """
    SELECT DISTINCT ON (event_id) event_id, user_id, event_type FROM events
"""


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"))


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(load_table(spark, sf_dir, "documents"))


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(load_table(spark, sf_dir, "documents"))


def q_streaming_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_exact_dedup(load_table(spark, sf_dir, "events"))
