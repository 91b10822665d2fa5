"""Corpus-curation operators over the ``documents`` table — the
dataset-assembly half of the training-data pipeline (SURVEY.md §2
extension families, same surface as ``textops``): per-domain frequency
caps, deterministic epoch shuffling, padding-efficiency accounting, and
tokenizer-fertility profiling.

Everything is built-in column expressions (whole-stage codegen, no
Python), every ordering is made engine-total (seeded ``hash60`` +
explicit NULLS placement — no libm, no engine-default null-order
divergence), and every query has an exact DuckDB oracle.

Scale notes are per-operator; the common pattern is ONE shuffle on the
group key and rank-limit windows that Spark 3.5+ rewrites to
``WindowGroupLimit`` (partial top-k BEFORE the shuffle), so a hot domain
never funnels its full row set through one task's sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round0
from ..functions.textfns import hash60_duck_sql, hash60_spark_sql
from ..sources.tables import load_table, spread
from .textops import BPE_RE

# C4/Gopher-style per-domain frequency cap: keep at most this many
# documents per source, chosen by seeded hash so the survivors are a
# uniform (and reproducible) sample of the domain, not a prefix of it.
CAP_PER_SOURCE = 10

# deterministic training-order parameters: every (epoch, doc) pair gets
# a shard and an in-shard position from a seeded hash — the distributed
# equivalent of "shuffle the dataset differently each epoch" with no RNG
# state anywhere.
N_EPOCHS = 2
N_SHARDS = 8

# padding-waste accounting: length-bucketed batching with this bucket
# granularity and truncation cap (tokens beyond MAX_LEN are dropped).
# Fixture-scaled (doc token counts span ~10-99) so BOTH the bucket
# spread and the truncation path are exercised; a production run would
# use e.g. 512/64.
MAX_LEN = 64
PAD_BUCKET = 16


def _h60_spark(expr: str) -> F.Column:
    return F.expr(hash60_spark_sql(expr))


# ---------------------------------------------------------------------------
# per_source_cap — C4-style per-domain frequency cap


def per_source_cap(docs: DataFrame) -> DataFrame:
    """Keep at most ``CAP_PER_SOURCE`` documents per source.

    The keep-set is the ``CAP_PER_SOURCE`` smallest seeded-hash values
    within each source (doc_id tie-break), so it is a reproducible
    uniform sample of the domain — the standard web-corpus guard against
    a single crawler-friendly domain dominating the mixture.

    Scale: one shuffle on ``source``. The ``row_number <= cap`` filter
    is rewritten by Spark 3.5+ into ``WindowGroupLimit`` — each map task
    keeps only its local top-``cap`` per source BEFORE the shuffle, so a
    100 TB hot domain ships ``cap × n_partitions`` rows, not its whole
    row set (plan-tested in tests/test_plans.py).
    """
    h = _h60_spark("concat('cap|', coalesce(CAST(doc_id AS STRING), ''))")
    w = Window.partitionBy("source").orderBy(
        F.col("h").asc_nulls_first(), F.col("doc_id").asc_nulls_first()
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("h", h)
        .withColumn("keep_rank", F.row_number().over(w))
        .filter(F.col("keep_rank") <= CAP_PER_SOURCE)
        .select("doc_id", "source", "keep_rank")
    )


PER_SOURCE_CAP_ORACLE = f"""
    WITH hashed AS (
        SELECT doc_id, source,
               {hash60_duck_sql("concat('cap|', coalesce(CAST(doc_id AS VARCHAR), ''))")} AS h
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY h ASC NULLS FIRST, doc_id ASC NULLS FIRST
               ) AS keep_rank
        FROM hashed
    )
    SELECT doc_id, source, keep_rank FROM ranked WHERE keep_rank <= {CAP_PER_SOURCE}
"""


def q_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return per_source_cap(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# training_order — deterministic epoch-salted global shuffle


def training_order(docs: DataFrame) -> DataFrame:
    """Assign every (epoch, doc) a shard and an in-shard position.

    The training-loader contract: epoch ``e`` reads shard ``s`` in
    ``pos`` order and sees a reshuffled corpus each epoch, with zero RNG
    state — position is a pure function of (epoch, doc_id) via the
    seeded hash, so any worker can reproduce any shard independently.

    Scale: one shuffle on (epoch, shard). ``N_SHARDS`` is the knob that
    bounds the per-task window sort — size it so a shard fits a task's
    spill budget (shards are hash-balanced, so skew is the hash's
    binomial deviation, not data-dependent).
    """
    epoch = F.explode(F.array(*[F.lit(e) for e in range(N_EPOCHS)])).alias("epoch")
    h = _h60_spark(
        "concat('ord|', CAST(epoch AS STRING), '|', coalesce(CAST(doc_id AS STRING), ''))"
    )
    w = Window.partitionBy("epoch", "shard").orderBy(
        F.col("h").asc_nulls_first(), F.col("doc_id").asc_nulls_first()
    )
    return (
        docs.select("doc_id", epoch)
        .withColumn("h", h)
        .withColumn("shard", (F.col("h") % N_SHARDS).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .select("epoch", "shard", "pos", "doc_id")
    )


TRAINING_ORDER_ORACLE = f"""
    WITH expanded AS (
        SELECT d.doc_id, CAST(e.epoch AS INTEGER) AS epoch,
               {hash60_duck_sql(
                   "concat('ord|', CAST(e.epoch AS VARCHAR), '|', "
                   "coalesce(CAST(d.doc_id AS VARCHAR), ''))"
               )} AS h
        FROM documents d, (SELECT unnest(range({N_EPOCHS})) AS epoch) e
    )
    SELECT epoch, CAST(h % {N_SHARDS} AS INTEGER) AS shard,
           CAST(row_number() OVER (
               PARTITION BY epoch, h % {N_SHARDS}
               ORDER BY h ASC NULLS FIRST, doc_id ASC NULLS FIRST
           ) AS INTEGER) AS pos,
           doc_id
    FROM expanded
"""


def q_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    return training_order(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# padding_waste_report — length-bucketed batching efficiency


def padding_waste_report(docs: DataFrame) -> DataFrame:
    """Token-length bucketing audit: padded vs actual tokens per bucket.

    Documents are tokenized (BPE-ish regex count), truncated at
    ``MAX_LEN``, and assigned the smallest multiple of ``PAD_BUCKET``
    that fits — the length-bucketed batching a training loader uses.
    The report shows, per bucket, how many tokens the batch actually
    carries vs pays for (``waste_ppm``) and how many were truncated
    away, all in exact integer arithmetic (ppm via bigint ``div``, no
    float division to drift cross-engine).

    Scale: pure two-level aggregate — map-side partial per bucket, one
    shuffle of ≤ ``MAX_LEN / PAD_BUCKET`` rows.
    """
    n_tok = F.coalesce(F.regexp_count(F.col("text"), F.lit(BPE_RE)), F.lit(0))
    capped = F.least(n_tok, F.lit(MAX_LEN))
    per_doc = docs.select(
        capped.alias("capped"),
        F.greatest(n_tok - MAX_LEN, F.lit(0)).alias("truncated"),
    ).withColumn(
        "bucket_len",
        F.expr(f"CAST(greatest(((capped + {PAD_BUCKET - 1}) div {PAD_BUCKET}) "
               f"* {PAD_BUCKET}, {PAD_BUCKET}) AS INT)"),
    )
    return (
        per_doc.groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("capped").cast("bigint").alias("sum_tokens"),
            F.sum("bucket_len").cast("bigint").alias("sum_padded"),
            F.sum("truncated").cast("bigint").alias("sum_truncated"),
        )
        .withColumn(
            "waste_ppm",
            F.expr("(sum_padded - sum_tokens) * 1000000 div sum_padded"),
        )
    )


PADDING_WASTE_REPORT_ORACLE = f"""
    WITH per_doc AS (
        SELECT least(coalesce(len(regexp_extract_all(text, '{BPE_RE}')), 0),
                     {MAX_LEN}) AS capped,
               greatest(coalesce(len(regexp_extract_all(text, '{BPE_RE}')), 0)
                        - {MAX_LEN}, 0) AS truncated
        FROM documents
    ),
    bucketed AS (
        SELECT capped, truncated,
               CAST(greatest(((capped + {PAD_BUCKET - 1}) // {PAD_BUCKET})
                    * {PAD_BUCKET}, {PAD_BUCKET}) AS INTEGER) AS bucket_len
        FROM per_doc
    )
    SELECT bucket_len,
           count(*) AS n_docs,
           CAST(sum(capped) AS BIGINT) AS sum_tokens,
           CAST(sum(bucket_len) AS BIGINT) AS sum_padded,
           CAST(sum(truncated) AS BIGINT) AS sum_truncated,
           (CAST(sum(bucket_len) AS BIGINT) - CAST(sum(capped) AS BIGINT))
               * 1000000 // CAST(sum(bucket_len) AS BIGINT) AS waste_ppm
    FROM bucketed
    GROUP BY bucket_len
"""


def q_padding_waste_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return padding_waste_report(spread(load_table(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# tokenizer_fertility_report — tokens-per-char profile by language/source


def tokenizer_fertility_report(docs: DataFrame) -> DataFrame:
    """Tokenizer fertility (tokens per character, ppm) by (lang, source).

    The standard multilingual-mixture diagnostic: a language whose
    fertility is far above the corpus norm is paying more sequence
    positions per unit of text — input to mixture re-weighting and
    tokenizer retraining decisions. Exact integer ppm arithmetic;
    zero-char groups emit NULL fertility instead of dividing by zero
    (ANSI mode would throw).

    Scale: pure aggregate, one shuffle of |lang × source| rows.
    """
    n_tok = F.coalesce(F.regexp_count(F.col("text"), F.lit(BPE_RE)), F.lit(0))
    n_chr = F.coalesce(F.length("text"), F.lit(0))
    return (
        docs.select("lang", "source", n_tok.alias("n_tok"), n_chr.alias("n_chr"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("sum_tokens"),
            F.sum("n_chr").cast("bigint").alias("sum_chars"),
        )
        .withColumn(
            "fertility_ppm",
            F.expr(
                "CASE WHEN sum_chars > 0 "
                "THEN sum_tokens * 1000000 div sum_chars ELSE NULL END"
            ),
        )
        .withColumn("tokens_per_doc_ppm", F.expr("sum_tokens * 1000000 div n_docs"))
    )


TOKENIZER_FERTILITY_REPORT_ORACLE = f"""
    WITH per_doc AS (
        SELECT lang, source,
               coalesce(len(regexp_extract_all(text, '{BPE_RE}')), 0) AS n_tok,
               coalesce(length(text), 0) AS n_chr
        FROM documents
    )
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
           CAST(sum(n_chr) AS BIGINT) AS sum_chars,
           CASE WHEN CAST(sum(n_chr) AS BIGINT) > 0
                THEN CAST(sum(n_tok) AS BIGINT) * 1000000
                     // CAST(sum(n_chr) AS BIGINT)
                ELSE NULL END AS fertility_ppm,
           CAST(sum(n_tok) AS BIGINT) * 1000000 // count(*) AS tokens_per_doc_ppm
    FROM per_doc
    GROUP BY lang, source
"""


def q_tokenizer_fertility_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokenizer_fertility_report(spread(load_table(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# semantic_decontaminate — embedding-cosine test-set contamination audit
# (lives here with the curation family; reuses the similarity helpers)

TEST_MOD = 17       # vec_id % TEST_MOD == 0 stands in for the held-out set
CONTAM_COS = 0.25   # fixture vectors are near-orthogonal; real corpora ~0.9


def semantic_decontaminate(embeddings: DataFrame) -> DataFrame:
    """Flag training vectors semantically too close to the held-out set.

    The embedding-space complement of the n-gram ``decontaminate``
    family: for every training vector, find its best-cosine held-out
    neighbor WITHIN ITS COARSE CELL (label) and flag it when the rounded
    cosine reaches ``CONTAM_COS``. Training vectors whose cell contains
    no held-out vector emit NULL best columns (never compared ≠ clean at
    threshold), keeping the report total and auditable.

    Scale: equi-join on the coarse cell — the held-out side is a real
    benchmark table in production (tiny, planner will broadcast it); the
    fixture carves it from the corpus (vec_id % {TEST_MOD}), which is
    SF-scaled, so NO broadcast hint here (r8 verdict rule). Cosine is
    rounded to ROUND_COS before the threshold compare so the flag bit is
    engine-identical; ties on best cosine break to the smallest test id.
    """
    # r17: _dot_unrolled measured SLOWER here (0.61 -> 0.77 interleaved
    # A/B) — the per-label train x test volume is small enough that the
    # guard + get() overhead beats the fold's interpretation cost.
    from .similarity import ROUND_COS, _dot, _with_norm

    test = _with_norm(embeddings.filter(F.col("vec_id") % TEST_MOD == 0), "test")
    train = _with_norm(
        spread(embeddings).filter(F.col("vec_id") % TEST_MOD != 0), "train"
    )
    scored = train.join(test, F.col("train_label") == F.col("test_label"), "left").select(
        F.col("train_id"),
        F.col("test_id"),
        round0(
            _dot(F.col("train_emb"), F.col("test_emb"))
            / (F.col("train_norm") * F.col("test_norm")),
            ROUND_COS,
        ).alias("cosine"),
    )
    w = Window.partitionBy("train_id").orderBy(
        F.col("cosine").desc_nulls_last(), F.col("test_id").asc_nulls_last()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("train_id"),
            F.col("test_id").alias("best_test_id"),
            F.col("cosine").alias("best_cosine"),
            F.coalesce(F.col("cosine") >= CONTAM_COS, F.lit(False)).alias(
                "contaminated"
            ),
        )
    )


def semantic_decontaminate_oracle() -> str:
    from .similarity import _EMB, ROUND_COS

    cos = (
        "(round(list_dot_product(t.embedding::DOUBLE[], q.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(t.embedding::DOUBLE[], t.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])))"
        f", {ROUND_COS}) + CAST(0.0 AS DOUBLE))"
    )
    return f"""
    WITH scored AS (
        SELECT t.vec_id AS train_id, q.vec_id AS test_id, {cos} AS cosine
        FROM (SELECT * FROM {_EMB} e
              WHERE vec_id % {TEST_MOD} != 0) t
        LEFT JOIN (SELECT * FROM {_EMB} e
                   WHERE vec_id % {TEST_MOD} = 0) q
          ON t.label = q.label
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY train_id
                   ORDER BY cosine DESC NULLS LAST, test_id ASC NULLS LAST
               ) AS rn
        FROM scored
    )
    SELECT train_id, test_id AS best_test_id, cosine AS best_cosine,
           coalesce(cosine >= {CONTAM_COS}, FALSE) AS contaminated
    FROM ranked WHERE rn = 1
"""


def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import load_embeddings

    return semantic_decontaminate(load_embeddings(spark, sf_dir))
