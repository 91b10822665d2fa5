"""Feature-engineering operators for model training pipelines: the
hashing-trick vectorizer over the document corpus and leakage-safe k-fold
target encoding over the star schema.

These are the two workhorse featurizers a training-data pipeline bolts
onto the curation family (curation.py builds the corpus; this turns it
into model inputs): Weinberger et al., "Feature Hashing for Large Scale
Multitask Learning" (ICML 2009) for the signed hashing trick, and the
out-of-fold mean encoding every tabular-ML stack ships (a fold's rows are
encoded from the OTHER folds' statistics, so the feature never sees its
own label — the leakage-safe construction, same concern as
``leakage_safe_split``).

Scale shapes:
- ``feature_hashing``: token explode -> ONE corpus shuffle on
  (doc_id, slot) with map-side combine (a document's tokens are
  colocated in its input split, so the combine collapses to <= D slots
  per doc before the exchange). No vocabulary build, no dictionary
  broadcast — that is the point of the hashing trick: memory is O(D)
  regardless of vocabulary size.
- ``target_encoding``: one corpus shuffle to (category, fold) aggregates
  — |categories| x K rows; the leave-fold-out subtraction is a window
  over that tiny relation, never a second corpus pass.

Cross-engine float discipline: the hash is the repo's shared 60-bit md5
(functions/textfns.py); prices go through integer cents
(CAST(round(x * 100) AS BIGINT), the rfm_segments pattern); held-out
means are emitted in integer milli-cents via positive-operand integer
division — no float crosses the oracle boundary anywhere in the module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import TOKENS_DUCK, hash60_duck_sql, hash60_spark_sql, tokens
from ..sources.tables import load_table

# hashing-trick dimensionality: slots per vector. Real pipelines use 2^18+;
# 32 keeps the oracle-checked output readable while exercising the same
# plan shape (the operator is D-agnostic).
FH_DIM = 32

# k-fold count for out-of-fold target encoding
TE_FOLDS = 5


def feature_hashing(docs: DataFrame) -> DataFrame:
    """Signed hashing-trick bag-of-words: every token hashes to one of
    ``FH_DIM`` slots with a +/-1 sign from an independent hash bit, and a
    document's vector is the per-slot sum of signs (the sign makes the
    slot sums unbiased estimators of inner products — Weinberger et al.
    2009). Emitted sparse: one row per (doc_id, slot) actually hit.
    """
    h_slot = hash60_spark_sql("concat('fh|', tok)")
    h_sign = hash60_spark_sql("concat('fs|', tok)")
    slot = F.expr(f"{h_slot} % {FH_DIM}")
    sgn = F.expr(f"CASE WHEN {h_sign} % 2 = 0 THEN 1 ELSE -1 END")
    return (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .select("doc_id", slot.alias("slot"), sgn.alias("sgn"))
        .groupBy("doc_id", "slot")
        .agg(
            F.sum("sgn").alias("weight"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def feature_hashing_oracle() -> str:
    q = chr(39)
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest({TOKENS_DUCK}) AS tok
            FROM documents
        ),
        hashed AS (
            SELECT doc_id,
                   {hash60_duck_sql(f"{q}fh|{q} || tok")} % {FH_DIM} AS slot,
                   CASE WHEN {hash60_duck_sql(f"{q}fs|{q} || tok")} % 2 = 0
                        THEN 1 ELSE -1 END AS sgn
            FROM toks
            WHERE tok <> ''
        )
        SELECT doc_id, slot,
               CAST(sum(sgn) AS BIGINT) AS weight,
               count(*) AS n_tokens
        FROM hashed
        GROUP BY doc_id, slot
    """


def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return feature_hashing(load_table(spark, sf_dir, "documents"))


def target_encoding(orders: DataFrame) -> DataFrame:
    """Out-of-fold mean target encoding of ``o_orderpriority`` against
    the order value: rows land in ``TE_FOLDS`` deterministic hash folds,
    and fold f's encoding for a category is the mean price over the
    category's rows in every OTHER fold — the feature a fold's rows see
    never includes their own labels.

    Integer-exact: prices become cents once (round of an identical
    double product), sums stay exact BIGINT/HUGEINT, and the held-out
    mean is an integer milli-cent division with positive operands
    (where DuckDB's floor ``//`` equals Spark's truncating ``div``).
    Folds with no held-out rows (a category living entirely in one
    fold) emit NULL rather than dividing by zero.
    """
    h_fold = hash60_spark_sql("concat('te|', CAST(o_orderkey AS STRING))")
    folds = (
        orders.select(
            F.col("o_orderpriority").alias("priority"),
            F.expr(f"{h_fold} % {TE_FOLDS}").alias("fold"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("priority", "fold")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # DECIMAL sum: a plain BIGINT cents sum overflows past ~5e11
            # max-price orders; DuckDB's HUGEINT sum is the exact twin
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("sum_cents"),
        )
    )
    wp = Window.partitionBy("priority")
    held = folds.select(
        "priority",
        "fold",
        "n_rows",
        (F.sum("n_rows").over(wp) - F.col("n_rows")).alias("held_n"),
        (F.sum("sum_cents").over(wp) - F.col("sum_cents")).alias("held_sum"),
    )
    return held.select(
        "priority",
        "fold",
        "n_rows",
        F.expr(
            "CASE WHEN held_n > 0 THEN held_sum * 1000 div held_n END"
        ).alias("heldout_mean_millicents"),
    )


def target_encoding_oracle() -> str:
    q = chr(39)
    return f"""
        WITH folds AS (
            SELECT o_orderpriority AS priority,
                   {hash60_duck_sql(f"{q}te|{q} || CAST(o_orderkey AS VARCHAR)")}
                       % {TE_FOLDS} AS fold,
                   count(*) AS n_rows,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sum_cents
            FROM orders
            GROUP BY 1, 2
        ),
        held AS (
            -- held_sum stays HUGEINT (no BIGINT cast: only the final
            -- milli-cent quotient is guaranteed to fit 64 bits)
            SELECT priority, fold, n_rows,
                   CAST(sum(n_rows) OVER wp - n_rows AS BIGINT) AS held_n,
                   sum(sum_cents) OVER wp - sum_cents AS held_sum
            FROM folds
            WINDOW wp AS (PARTITION BY priority)
        )
        SELECT priority, fold, n_rows,
               CASE WHEN held_n > 0
                    THEN CAST(held_sum * 1000 // held_n AS BIGINT) END
                   AS heldout_mean_millicents
        FROM held
    """


def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return target_encoding(load_table(spark, sf_dir, "orders"))
