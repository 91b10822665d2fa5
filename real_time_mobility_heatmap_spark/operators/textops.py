"""Text-analysis operators over the ``documents`` table (SURVEY.md §2.11).

Large-scale training-data pipeline primitives: token counting, quality
scoring, language-ID heuristic, document fingerprinting, corpus stats.
Everything is built-in column expressions (whole-stage codegen, no Python),
and every query has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import (
    avg_6dec_exact_sql,
    avg_exact_int_sql,
    round_half_up,
    round_half_up_sql,
)
from ..functions.textfns import (
    STOPWORDS,
    TOKENS_DUCK,
    fold_lower,
    fold_lower_duck,
    fold_lower_spark_sql,
    hash60_duck_sql,
    hash60_spark_sql,
    ln_u60_exact_sql,
    tokens,
)
from ..sources.tables import load_table, spread
from ..lineage import cut_lineage

# BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_RE)).alias("n_bpe_tokens"),
        F.length("text").alias("n_text_chars"),
    )


TOKEN_COUNT_ORACLE = f"""
    SELECT doc_id,
           len({TOKENS_DUCK}) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS INTEGER) AS n_bpe_tokens,
           CAST(length(text) AS INTEGER) AS n_text_chars
    FROM documents
"""


_STOP_IN = ", ".join(f"'{w}'" for w in STOPWORDS)


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + a composite score.

    length / punctuation ratio / stopword ratio / mean word length — the
    standard cheap filters a pretraining pipeline applies before anything
    model-based.
    """
    toks = tokens(F.col("text"))
    n_toks = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    punct = F.regexp_count(F.col("text"), F.lit("[^A-Za-z0-9\\s]"))
    d = docs.select(
        "doc_id",
        F.length("text").alias("n_text_chars"),
        n_toks.alias("n_tokens"),
        # exact-int ratios: shared half-up so an on-boundary rational
        # cannot split the engines' native round (r12 conversion).
        # nullif guards the one zero-capable denominator (r13 empty-text
        # sweep: a zero-length doc is ANSI DIVIDE_BY_ZERO in Spark but
        # NULL in DuckDB double division — NULL is the contract: an
        # empty doc has no punct ratio, its score is NULL, and the
        # quality filter drops it in both engines). n_tokens needs no
        # guard: split('') is [''] — size >= 1 for any non-null text.
        round_half_up(punct / F.nullif(F.length("text"), F.lit(0)), 6).alias(
            "punct_ratio"
        ),
        round_half_up(n_stop / n_toks, 6).alias("stopword_ratio"),
        round_half_up((F.length("text") - n_toks + 1) / n_toks, 6).alias("mean_word_len"),
    )
    return d.withColumn(
        "quality_score",
        round_half_up(
            F.least(F.col("n_tokens") / 50.0, F.lit(1.0)) * 0.5
            + (1 - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * 0.25
            + F.least(F.col("stopword_ratio") * 4, F.lit(1.0)) * 0.25,
            6,
        ),
    )


_PUNCT_RATIO_DUCK = round_half_up_sql(
    "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))"
    " / CAST(nullif(length(text), 0) AS DOUBLE)",
    6,
)
_STOPWORD_RATIO_DUCK = round_half_up_sql(
    f"len(list_filter({TOKENS_DUCK}, t -> t IN ({_STOP_IN})))"
    f" / CAST(len({TOKENS_DUCK}) AS DOUBLE)",
    6,
)
_MEAN_WORD_LEN_DUCK = round_half_up_sql(
    f"(CAST(length(text) AS DOUBLE) - len({TOKENS_DUCK}) + 1)"
    f" / len({TOKENS_DUCK})",
    6,
)
_QSCORE_DUCK = round_half_up_sql(
    "least(n_tokens / CAST(50.0 AS DOUBLE), 1.0) * 0.5"
    " + (1 - least(punct_ratio * 5, CAST(1.0 AS DOUBLE))) * 0.25"
    " + least(stopword_ratio * 4, CAST(1.0 AS DOUBLE)) * 0.25",
    6,
)

QUALITY_SCORE_ORACLE = f"""
    WITH feats AS (
        SELECT doc_id,
               CAST(length(text) AS INTEGER) AS n_text_chars,
               len({TOKENS_DUCK}) AS n_tokens,
               {_PUNCT_RATIO_DUCK} AS punct_ratio,
               {_STOPWORD_RATIO_DUCK} AS stopword_ratio,
               {_MEAN_WORD_LEN_DUCK} AS mean_word_len
        FROM documents
    )
    SELECT *,
           {_QSCORE_DUCK} AS quality_score
    FROM feats
"""


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language-ID heuristic.

    Real language-ID is n-gram profiles over a trained table; the engine
    pattern is the same — a pure-column score + threshold. Compares the
    prediction against the fixture's ``lang`` column.
    """
    toks = tokens(F.col("text"))
    # exact-int ratio, shared half-up (r12); the threshold compares the
    # ROUNDED score in both engines so the decision is a deterministic
    # function of the oracle-identical value
    ratio = round_half_up(
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / F.size(toks), 6
    )
    pred = F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unknown"))
    return docs.select(
        "doc_id",
        "lang",
        ratio.alias("en_stopword_ratio"),
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("pred_matches"),
    )


LANG_ID_ORACLE = f"""
    WITH s AS (
        SELECT doc_id, lang,
               {_STOPWORD_RATIO_DUCK} AS en_stopword_ratio
        FROM documents
    )
    SELECT doc_id, lang, en_stopword_ratio,
           CASE WHEN en_stopword_ratio >= 0.05 THEN 'en' ELSE 'unknown' END AS pred_lang,
           (CASE WHEN en_stopword_ratio >= 0.05 THEN 'en' ELSE 'unknown' END) = lang AS pred_matches
    FROM s
"""


def fingerprint(docs: DataFrame) -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercased, whitespace-
    collapsed text (plus sha256 of the raw text for exact identity)."""
    norm = F.trim(F.regexp_replace(fold_lower(F.col("text")), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_fingerprint"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
    )


FINGERPRINT_ORACLE = f"""
    SELECT doc_id,
           md5(trim(regexp_replace({fold_lower_duck('text')}, '\\s+', ' ', 'g'))) AS norm_fingerprint,
           sha256(text) AS content_sha256
    FROM documents
"""


ROLL_B = 1000003       # polynomial base (< 2^31 so B*acc stays in int64)
ROLL_P = 2147483647    # Mersenne 2^31-1

# token hashes pre-reduced mod P; fold seeds with the FIRST element and
# folds the rest (DuckDB's list_reduce has no explicit init, so both
# engines use identical seed-with-first semantics)
_HS_SPARK = (
    # the fold_lower casefold (textfns) in Spark-SQL dialect — built by
    # the SAME module so the fold set has one definition (a literal
    # copy here would silently diverge from tokens()/TOKENS_DUCK the
    # day the set gains a code point).
    f"transform(split({fold_lower_spark_sql('trim(text)')}, '\\\\s+'),"
    f" t -> CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT) % {ROLL_P})"
)
_ROLL_SPARK = (
    f"aggregate(slice(hs, 2, size(hs) - 1), element_at(hs, 1),"
    f" (acc, x) -> ({ROLL_B} * acc + x) % {ROLL_P})"
)


def rolling_fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive document fingerprint: a polynomial rolling hash of
    the token-hash sequence, ``h = fold((acc * B + h(tok)) mod P)``.

    Unlike the set-style md5/sha fingerprints, token ORDER matters — two
    documents with the same words shuffled get different fingerprints.
    State is one int64 per doc; at scale this is a pure map-side column.
    """
    return spread(docs).selectExpr(
        "doc_id",
        f"{_HS_SPARK} AS hs",
    ).selectExpr(
        "doc_id",
        f"{_ROLL_SPARK} AS rolling_hash",
        "size(hs) AS n_tokens",
    )


ROLLING_FINGERPRINT_ORACLE = f"""
    SELECT doc_id,
           list_reduce(
               list_transform({TOKENS_DUCK},
                   t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % {ROLL_P}),
               (acc, x) -> ({ROLL_B} * acc + x) % {ROLL_P}) AS rolling_hash,
           len({TOKENS_DUCK}) AS n_tokens
    FROM documents
"""


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Corpus composition: per (lang, source) doc counts and length stats."""
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(avg_exact_int_sql("n_chars", 6)).alias("avg_chars"),
        F.max("n_chars").alias("max_chars"),
    )


CORPUS_STATS_ORACLE = f"""
    SELECT lang, source, count(*) AS n_docs,
           {avg_exact_int_sql('n_chars', 6)} AS avg_chars, max(n_chars) AS max_chars
    FROM documents GROUP BY lang, source
"""


def term_frequencies(docs: DataFrame, min_count: int = 100) -> DataFrame:
    """Global term frequency: explode tokens -> count per token (the tf
    half of tf-idf; the shuffle carries one row per token occurrence,
    combined map-side)."""
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("term_count"))
        .filter(F.col("term_count") >= min_count)
    )


def term_frequencies_oracle(min_count: int = 100) -> str:
    return f"""
        SELECT token, count(*) AS term_count
        FROM (SELECT unnest({TOKENS_DUCK}) AS token FROM documents)
        GROUP BY token HAVING count(*) >= {min_count}
    """


TFIDF_TOP_K = 3


def tfidf_top_terms(docs: DataFrame) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf.

    tf = in-doc term count; idf = ln(N / df) with df = number of docs
    containing the term. One explode -> per-doc tf hash aggregate -> df
    via a window count partitioned by term -> per-doc top-k ranking
    window. Ties broken on the term string so ranking is
    engine-independent.
    """
    tok = spread(docs).select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    from pyspark.sql import Window

    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df as a window count over the tf rows: one tokenize/explode pass
    # total (a separate groupBy(term) branch would recompute the whole
    # upstream subplan for the dictionary side)
    with_df = tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = with_df.crossJoin(F.broadcast(n_docs)).select(
        "doc_id",
        "term",
        "tf",
        F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "tfidf", "rank")
    )


TFIDF_TOP_TERMS_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, unnest({TOKENS_DUCK}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               round(tf.tf * ln((SELECT count(*) FROM documents) / CAST(df.df AS DOUBLE)), 6) AS tfidf
        FROM tf JOIN df ON tf.term = df.term
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
        FROM scored
    )
    SELECT doc_id, term, tf, tfidf, rank FROM ranked WHERE rank <= {TFIDF_TOP_K}
"""


BM25_K1, BM25_B = 1.2, 0.75
BM25_TOP_K = 3


def bm25_top_terms(docs: DataFrame) -> DataFrame:
    """Top-k characteristic terms per document by Okapi BM25 — the
    parameterized successor of ``tfidf_top_terms`` (tf saturation via
    k1, doc-length normalization via b) and the scoring half of any
    retrieval-based dedup / contamination probe.

    Same plan skeleton and determinism conventions as tfidf_top_terms:
    ONE tokenize/explode pass feeds tf; dl (doc length) and df are
    window counts over the tf rows; N and avgdl broadcast as a 1-row
    aggregate; scores rounded to 6dp before the ranking window with the
    term string as tie-break.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) — the non-negative variant,
    so rare terms dominate and ubiquitous terms contribute ~0.
    """
    from pyspark.sql import Window

    tok = spread(docs).select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    # materialized once (r17): both the df/dl windows and the avgdl
    # total read the tf relation, and each previously re-ran the corpus
    # tokenize + explode + aggregate (guide §2.4)
    tf = cut_lineage(
        tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")),
        eager=False,
    )
    enriched = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).withColumn("dl", F.sum("tf").over(Window.partitionBy("doc_id")))
    totals = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        tf.agg((F.sum("tf") / F.count_distinct("doc_id")).alias("avgdl"))
    )
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    scored = enriched.crossJoin(F.broadcast(totals)).select(
        "doc_id",
        "term",
        "tf",
        F.round(idf * (F.col("tf") * (BM25_K1 + 1.0)) / denom, 6).alias("bm25"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("bm25"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select("doc_id", "term", "tf", "bm25", "rank")
    )


BM25_TOP_TERMS_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, unnest({TOKENS_DUCK}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    enriched AS (
        SELECT *,
               count(*) OVER (PARTITION BY term) AS df,
               sum(tf) OVER (PARTITION BY doc_id) AS dl
        FROM tf
    ),
    totals AS (
        SELECT (SELECT count(*) FROM documents) AS n_docs,
               (SELECT sum(tf) / CAST(count(DISTINCT doc_id) AS DOUBLE) FROM tf) AS avgdl
    ),
    scored AS (
        SELECT doc_id, term, tf,
               round(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * ({BM25_K1} + 1.0))
                   / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl)),
                   6
               ) AS bm25
        FROM enriched, totals
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY bm25 DESC, term ASC) AS rank
        FROM scored
    )
    SELECT doc_id, term, tf, bm25, rank FROM ranked WHERE rank <= {BM25_TOP_K}
"""


def q_bm25_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_top_terms(load_table(spark, sf_dir, "documents"))


SPLIT_PCTS = (90, 5, 5)  # train / val / test


def _split_case(hash60_sql, key: str = "doc_id") -> str:
    """train/val/test CASE expr from ``key``, in either engine's dialect.

    A pure function of the key column (no split table, no join): any
    operator that needs the assignment — ``dataset_split``,
    ``decontaminate`` — recomputes it as a column expression on whatever
    rows it already has in hand. ``leakage_safe_split`` passes
    key="group_key" so the whole near-dup cluster hashes as one unit
    (a key PARAMETER, not post-hoc string surgery on the generated SQL,
    which silently no-ops if the wording drifts — ADVICE r7)."""
    split_hash = hash60_sql(f"concat('split|', {key})")
    bucket = f"{split_hash} % 100"
    train, val = SPLIT_PCTS[0], SPLIT_PCTS[0] + SPLIT_PCTS[1]
    return (
        f"CASE WHEN {bucket} < {train} THEN 'train' "
        f"WHEN {bucket} < {val} THEN 'val' ELSE 'test' END"
    )


def split_spark_sql() -> str:
    return _split_case(hash60_spark_sql)


def split_duck_sql() -> str:
    return _split_case(hash60_duck_sql)


def dataset_split(docs: DataFrame) -> DataFrame:
    """Deterministic train/val/test assignment + shuffle key.

    Salted-hash bucketing (not ``rand()``): the split is a pure function
    of doc_id, so it is reproducible across runs, engines and cluster
    sizes, and new documents never reshuffle old assignments — the
    properties a training pipeline actually needs. ``shuffle_key`` is a
    second independent hash for deterministic within-split ordering.
    """
    return docs.select(
        "doc_id",
        F.expr(split_spark_sql()).alias("split"),
        F.expr(hash60_spark_sql("concat('shuffle|', doc_id)")).alias("shuffle_key"),
    )


DATASET_SPLIT_ORACLE = f"""
    SELECT doc_id,
           {split_duck_sql()} AS split,
           {hash60_duck_sql("concat('shuffle|', doc_id)")} AS shuffle_key
    FROM documents
"""


# Gopher/C4-style hard bounds: each rule is a cheap column predicate; a
# document is kept only if every rule passes. Thresholds are engine
# constants so the filter is reproducible (and tunable per corpus).
QF_MIN_TOKENS = 5
QF_MAX_TOKENS = 100_000
QF_MAX_PUNCT_RATIO = 0.30
QF_MIN_STOPWORD_RATIO = 0.01
QF_MIN_MEAN_WORD_LEN = 2.0
QF_MAX_MEAN_WORD_LEN = 12.0


def quality_filter(docs: DataFrame) -> DataFrame:
    """Rule-based pretraining quality filter (the Gopher-rules pattern):
    token-count bounds, punctuation-ratio cap, stopword-ratio floor,
    mean-word-length band. Emits one row per document with each rule's
    verdict plus the final keep flag — the auditable form (a pipeline
    filters on ``keep``, analysts aggregate the reason columns). Built on
    ``quality_score``'s feature columns: one scan, pure column
    predicates, no extra shuffle."""
    feats = quality_score(docs)
    rules = {
        "ok_n_tokens": F.col("n_tokens").between(QF_MIN_TOKENS, QF_MAX_TOKENS),
        "ok_punct": F.col("punct_ratio") <= QF_MAX_PUNCT_RATIO,
        "ok_stopwords": F.col("stopword_ratio") >= QF_MIN_STOPWORD_RATIO,
        "ok_word_len": F.col("mean_word_len").between(
            QF_MIN_MEAN_WORD_LEN, QF_MAX_MEAN_WORD_LEN
        ),
    }
    out = feats.select(
        "doc_id",
        "n_tokens",
        *[v.alias(k) for k, v in rules.items()],
    )
    keep = None
    for k in rules:
        keep = F.col(k) if keep is None else (keep & F.col(k))
    return out.withColumn("keep", keep)


QUALITY_FILTER_ORACLE = f"""
    WITH scored AS ({QUALITY_SCORE_ORACLE})
    SELECT doc_id,
           n_tokens,
           n_tokens BETWEEN {QF_MIN_TOKENS} AND {QF_MAX_TOKENS} AS ok_n_tokens,
           punct_ratio <= {QF_MAX_PUNCT_RATIO} AS ok_punct,
           stopword_ratio >= {QF_MIN_STOPWORD_RATIO} AS ok_stopwords,
           mean_word_len BETWEEN {QF_MIN_MEAN_WORD_LEN} AND {QF_MAX_MEAN_WORD_LEN} AS ok_word_len,
           (n_tokens BETWEEN {QF_MIN_TOKENS} AND {QF_MAX_TOKENS})
           AND punct_ratio <= {QF_MAX_PUNCT_RATIO}
           AND stopword_ratio >= {QF_MIN_STOPWORD_RATIO}
           AND (mean_word_len BETWEEN {QF_MIN_MEAN_WORD_LEN} AND {QF_MAX_MEAN_WORD_LEN}) AS keep
    FROM scored
"""


# per-stratum sampling rates in basis points (of 10_000); strata not
# listed keep everything. The fixture corpus is en-dominated, so the
# canonical use is downsampling the majority language.
SAMPLE_RATES_BP = {"en": 5_000}
SAMPLE_DEFAULT_BP = 10_000


def stratified_sample(docs: DataFrame) -> DataFrame:
    """Deterministic per-language (stratified) sampling.

    Salted-hash thresholding, not ``rand()``/``sample()``: membership is
    a pure function of doc_id, so the sample is reproducible across
    runs, engines, and cluster sizes, and it composes with incremental
    data (new docs never change old membership) — what a training-data
    pipeline needs from a downsampling pass. One scan, zero shuffles.
    """
    rate = F.lit(SAMPLE_DEFAULT_BP)
    for lang, bp in SAMPLE_RATES_BP.items():
        rate = F.when(F.col("lang") == lang, F.lit(bp)).otherwise(rate)
    bucket = F.expr(hash60_spark_sql("concat('sample|', doc_id)")) % 10_000
    return (
        docs.select("doc_id", "lang", rate.alias("rate_bp"), bucket.alias("bucket"))
        .filter(F.col("bucket") < F.col("rate_bp"))
        .select("doc_id", "lang", "rate_bp")
    )


def _rate_case_duck() -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {bp}" for lang, bp in SAMPLE_RATES_BP.items()
    )
    return f"CASE {whens} ELSE {SAMPLE_DEFAULT_BP} END"


STRATIFIED_SAMPLE_ORACLE = f"""
    SELECT doc_id, lang, {_rate_case_duck()} AS rate_bp
    FROM documents
    WHERE {hash60_duck_sql("concat('sample|', doc_id)")} % 10000 < {_rate_case_duck()}
"""


RARE_TF = 2  # corpus-wide term frequency at or below which a token is "rare"


def token_commonness(docs: DataFrame) -> DataFrame:
    """Corpus-statistics document scoring: how common are a document's
    tokens in the whole corpus? The integer-exact cousin of unigram
    log-probability scoring (log() is not bit-portable across engines;
    integer term-frequency sums are) — low commonness / high rare-ratio
    flags OCR noise, code dumps, and gibberish the way a unigram LM
    would.

    Plan shape: the token relation feeds both the vocabulary aggregate
    (shuffle on token) and the token->vocabulary equi-join (the
    big-to-big join: at 100 TB the vocabulary itself is too large to
    broadcast, so both sides shuffle on the token key) — then a per-doc
    aggregate. Catalyst plans the tokenize scan into each branch (2
    passes); a ``cut_lineage`` of the token rows was A/B-measured
    SLOWER (0.89 -> 1.10 s fresh-build at sf0.1, r17): materializing
    the corpus-sized token relation costs more than re-tokenizing, the
    same adjudication as ``rp_recall_report``. All sums are int64
    (exact, associative); the two ratios divide exact integers, so
    cross-engine determinism is structural, not probabilistic.
    """
    tok = spread(docs).select("doc_id", F.explode(tokens(F.col("text"))).alias("tk"))
    vocab = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("tf"))
    joined = tok.join(vocab, "tk")
    # the two ratios divide exact int64 sums (identical doubles in both
    # engines); the ROUNDING is the half-up float-domain form so an
    # exactly-on-boundary rational (k/n landing on x.xxxxxx5) cannot split
    # the engines' native round() implementations (r11, the min_cost class)
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("tf").alias("sum_tf"),
        F.expr(
            round_half_up_sql("CAST(sum(tf) AS DOUBLE) / count(1)", 6)
        ).alias("commonness"),
        F.sum((F.col("tf") <= RARE_TF).cast("long")).alias("n_rare"),
        F.expr(
            round_half_up_sql(
                f"CAST(sum(CASE WHEN tf <= {RARE_TF} THEN 1 ELSE 0 END)"
                " AS DOUBLE) / count(1)",
                6,
            )
        ).alias("rare_ratio"),
    )


TOKEN_COMMONNESS_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, unnest({TOKENS_DUCK}) AS tk FROM documents
    ),
    vocab AS (SELECT tk, count(*) AS tf FROM tok GROUP BY tk)
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(sum(tf) AS BIGINT) AS sum_tf,
           {round_half_up_sql('CAST(sum(tf) AS DOUBLE) / count(1)', 6)}
               AS commonness,
           CAST(sum(CASE WHEN tf <= {RARE_TF} THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
           {round_half_up_sql(f'CAST(sum(CASE WHEN tf <= {RARE_TF} THEN 1 ELSE 0 END) AS DOUBLE) / count(1)', 6)}
               AS rare_ratio
    FROM tok JOIN vocab USING (tk)
    GROUP BY doc_id
"""


def q_token_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_commonness(load_table(spark, sf_dir, "documents"))


# PII patterns restricted to syntax with IDENTICAL semantics in Java
# regex (Spark) and RE2 (DuckDB): character classes, bounded repeats,
# \b word boundaries — no lookaround, no backreferences.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def redact_pii(docs: DataFrame) -> DataFrame:
    """PII scrub pass (the compliance stage of a training-data pipeline):
    count and mask emails / IPv4s / phone-shaped numbers, applied in a
    fixed pattern order. Pure column regexes — one codegen'd scan, no
    Python. Output stays flat and hash-safe: per-pattern counts plus the
    sha256 of the redacted text (long text never crosses to the
    comparison harness)."""
    counts = [
        F.regexp_count(F.col("text"), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    redacted = F.col("text")
    for _, pat, mask in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, mask)
    return docs.select(
        "doc_id",
        *counts,
        F.sha2(redacted, 256).alias("redacted_sha256"),
        (F.sha2(redacted, 256) != F.sha2(F.col("text"), 256)).alias("was_redacted"),
    )


def _redact_duck() -> str:
    expr = "text"
    for _, pat, mask in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{mask}', 'g')"
    return expr


REDACT_PII_ORACLE = f"""
    SELECT doc_id,
           {", ".join(f"CAST(len(regexp_extract_all(text, '{pat}')) AS INTEGER) AS n_{name}" for name, pat, _ in PII_PATTERNS)},
           sha256({_redact_duck()}) AS redacted_sha256,
           sha256({_redact_duck()}) != sha256(text) AS was_redacted
    FROM documents
"""


REP_MIN_TOKENS = 2  # need at least one bigram


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document: how much of the text
    is the single most frequent token / bigram (near-1 values flag
    boilerplate and degenerate generations that length/stopword filters
    miss). Emits max occurrence counts plus exact integer parts-per-
    million coverage — ppm via int64 ``div`` instead of a rounded double
    ratio, so there is no cross-engine float-rounding boundary (e.g.
    1/128 sits exactly on the 6-decimal half).

    Shape: one tokenize pass feeding two hash aggregates keyed by
    (doc_id, term) / (doc_id, bigram); map-side partial aggregation
    collapses repeats before the shuffle, so shuffled bytes are bounded
    by per-partition distinct terms, and the final per-doc max is a
    second tiny aggregate on the same doc_id partitioning. Docs with
    < 2 tokens have no bigram and are excluded (mirrored in the oracle).
    """
    tok = (
        spread(docs)
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= REP_MIN_TOKENS)
    )
    # materialized once (r17): both the token-count branch and the bigram
    # branch read this relation, and each previously re-ran the corpus
    # scan + regexp tokenize (guide §2.4 — 4 parquet scans before, 2 after)
    tok = cut_lineage(tok, eager=False)
    t = tok.select(
        "doc_id", F.size("toks").alias("n_tokens"), F.explode("toks").alias("tk")
    )
    ttop = (
        t.groupBy("doc_id", "n_tokens", "tk")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n_tokens")
        .agg(F.max("c").alias("top_token_count"))
    )
    # bigrams with multiplicity (occurrence counts, so no array_distinct)
    # as a shuffle-free array transform (r18, guide §2.4 — same
    # conversion as dedup's _shingle_rows; the old posexplode + lead
    # window form paid a token-row shuffle + sort per pass)
    bg = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat_ws(' ', toks[i-1], toks[i]))"
            )
        ).alias("bg"),
    )
    btop = (
        bg.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"))
    )
    return ttop.join(btop, "doc_id").select(
        "doc_id",
        "n_tokens",
        "top_token_count",
        F.expr("top_token_count * 1000000 div n_tokens").alias("top_token_ppm"),
        "top_bigram_count",
        F.expr("top_bigram_count * 1000000 div (n_tokens - 1)").alias(
            "top_bigram_ppm"
        ),
    )


REPETITION_STATS_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
        WHERE len({TOKENS_DUCK}) >= {REP_MIN_TOKENS}
    ),
    t AS (SELECT doc_id, len(toks) AS n_tokens, unnest(toks) AS tk FROM tok),
    tc AS (SELECT doc_id, n_tokens, tk, count(*) AS c FROM t GROUP BY doc_id, n_tokens, tk),
    ttop AS (SELECT doc_id, n_tokens, max(c) AS top_token_count FROM tc GROUP BY doc_id, n_tokens),
    bgl AS (
        SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
               i -> array_to_string(toks[i:i+1], ' '))) AS bg
        FROM tok
    ),
    bc AS (SELECT doc_id, bg, count(*) AS c FROM bgl GROUP BY doc_id, bg),
    btop AS (SELECT doc_id, max(c) AS top_bigram_count FROM bc GROUP BY doc_id)
    SELECT t.doc_id, t.n_tokens, t.top_token_count,
           (t.top_token_count * 1000000) // t.n_tokens AS top_token_ppm,
           b.top_bigram_count,
           (b.top_bigram_count * 1000000) // (t.n_tokens - 1) AS top_bigram_ppm
    FROM ttop t JOIN btop b ON t.doc_id = b.doc_id
"""


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(load_table(spark, sf_dir, "documents"))


MIX_TARGET_PER_SOURCE = 15  # expected docs kept per source (fixture: 25/source)


def mixture_sample(docs: DataFrame) -> DataFrame:
    """Domain-mixture control: deterministically downsample over-represented
    sources to a target expected count (rate = min(1, target / n_source)).
    Emits every document with its source's rate and a ``kept`` verdict —
    the auditable form (the pipeline filters on ``kept``; analysts check
    realized vs target mixture on the flags).

    Membership is a pure hash of doc_id against an integer ppm threshold
    — reproducible across runs/engines/cluster sizes, stable when new
    documents arrive (old keep decisions never flip; only rates drift as
    counts grow, and production pins rates per snapshot). Rates are exact
    int64 ppm (``div``), so there is no float threshold boundary.

    Shape: one tiny per-source count aggregate broadcast back onto the
    scan — the keep decision itself is map-side. A window-over-source
    alternative would shuffle the full corpus by a low-cardinality,
    skew-prone key; the broadcast join shuffles only the source dim.
    """
    rates = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_source"))
        .select(
            "source",
            "n_source",
            F.expr(
                f"least(CAST(1000000 AS BIGINT),"
                f" {MIX_TARGET_PER_SOURCE} * 1000000 div n_source)"
            ).alias("rate_ppm"),
        )
    )
    mix_hash = hash60_spark_sql("concat('mix|', doc_id)")
    return (
        docs.select("doc_id", "source")
        .join(F.broadcast(rates), "source")
        .select(
            "doc_id",
            "source",
            "n_source",
            "rate_ppm",
            F.expr(f"{mix_hash} % 1000000 < rate_ppm").alias("kept"),
        )
    )


MIXTURE_SAMPLE_ORACLE = f"""
    WITH counted AS (
        SELECT doc_id, source,
               count(*) OVER (PARTITION BY source) AS n_source
        FROM documents
    )
    SELECT doc_id, source, n_source,
           least(1000000, ({MIX_TARGET_PER_SOURCE} * 1000000) // n_source) AS rate_ppm,
           {hash60_duck_sql("concat('mix|', doc_id)")} % 1000000
               < least(1000000, ({MIX_TARGET_PER_SOURCE} * 1000000) // n_source) AS kept
    FROM counted
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_sample(load_table(spark, sf_dir, "documents"))


SEQ_LEN = 512    # tokens per packed training sequence
N_SHARDS = 4     # independent packing streams (a real run uses thousands)


def pack_sequences(docs: DataFrame) -> DataFrame:
    """Sequence packing, concat-and-chunk style: documents are laid out in
    deterministic shuffle order and cut into fixed SEQ_LEN-token training
    sequences; a document's tokens land at [pack_offset) of first_pack
    through last_pack (documents may span a chunk boundary — the standard
    pretraining layout).

    Scale shape: a single GLOBAL running sum would serialize the corpus
    through one partition, so packing is per-shard — shard = shuffle-hash
    % N_SHARDS, and the running token offset is a window sum *within* the
    shard. Shards pack independently and in parallel (each produces its
    own pack_id space), which is exactly how a 1000-executor run writes
    training shards. All arithmetic is int64 (window SUM of counts,
    ``div``/``%`` for pack ids) — bit-identical across engines.
    """
    from pyspark.sql import Window

    shuffle_hash = hash60_spark_sql("concat('shuffle|', doc_id)")
    t = docs.select(
        "doc_id",
        F.expr(f"{shuffle_hash} % {N_SHARDS}").alias("shard"),
        F.expr(shuffle_hash).alias("shuffle_key"),
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("shuffle_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.select(
        "doc_id",
        "shard",
        "n_tokens",
        cum.alias("tok_start"),
    ).select(
        "doc_id",
        "shard",
        "n_tokens",
        "tok_start",
        F.expr(f"tok_start div {SEQ_LEN}").alias("first_pack"),
        F.expr(f"(tok_start + n_tokens - 1) div {SEQ_LEN}").alias("last_pack"),
        F.expr(f"tok_start % {SEQ_LEN}").alias("pack_offset"),
    )


PACK_SEQUENCES_ORACLE = f"""
    WITH t AS (
        SELECT doc_id,
               {hash60_duck_sql("concat('shuffle|', doc_id)")} % {N_SHARDS} AS shard,
               {hash60_duck_sql("concat('shuffle|', doc_id)")} AS shuffle_key,
               CAST(len({TOKENS_DUCK}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    laid AS (
        SELECT doc_id, shard, n_tokens,
               -- CAST: DuckDB window SUM(BIGINT) yields HUGEINT -> pandas
               -- float64, which breaks the driver's dtype-sensitive value hash.
               CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY shuffle_key, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
        FROM t
    )
    SELECT doc_id, shard, n_tokens, tok_start,
           tok_start // {SEQ_LEN} AS first_pack,
           (tok_start + n_tokens - 1) // {SEQ_LEN} AS last_pack,
           tok_start % {SEQ_LEN} AS pack_offset
    FROM laid
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(load_table(spark, sf_dir, "documents"))


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    return redact_pii(spread(load_table(spark, sf_dir, "documents")))


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_filter(spread(load_table(spark, sf_dir, "documents")))


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample(load_table(spark, sf_dir, "documents"))


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dataset_split(load_table(spark, sf_dir, "documents"))


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_count(spread(load_table(spark, sf_dir, "documents")))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(spread(load_table(spark, sf_dir, "documents")))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(spread(load_table(spark, sf_dir, "documents")))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(spread(load_table(spark, sf_dir, "documents")))


def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_fingerprint(load_table(spark, sf_dir, "documents"))


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_stats(load_table(spark, sf_dir, "documents"))


def q_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return term_frequencies(spread(load_table(spark, sf_dir, "documents")))


VOCAB_SIZE = 16  # top-V unigrams; ~50k in production — the FIXTURE corpus
# has a 31-token vocabulary, so 16 keeps the OOV rate non-degenerate


def vocab_coverage_report(docs: DataFrame) -> DataFrame:
    """Tokenizer-vocabulary coverage per source: build the top-V
    corpus-frequency vocabulary (the greedy unigram baseline every BPE /
    WordPiece training starts from), then report each source's
    out-of-vocabulary rate — the go/no-go stat for reusing an existing
    tokenizer on a new data source.

    Shape: one token explode feeds both sides. The vocabulary is
    ``TakeOrderedAndProject`` (top-V by count, token-string tie-break —
    never a global sort) and V is a CONSTANT, so broadcasting it into
    the per-source pass is scale-safe by construction. OOV ppm is exact
    integer arithmetic.
    """
    # one tokenize+explode feeds BOTH the vocab aggregate and the probe
    # side — Spark does no cross-subtree CSE, so cut the lineage or the
    # corpus scan runs twice (same pattern as repeated_span_report)
    tok = cut_lineage(
        docs.select("source", F.explode(tokens(F.col("text"))).alias("token")),
        eager=False,
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("token"))
        .limit(VOCAB_SIZE)
        .select("token")
    )
    tagged = tok.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "token", "left"
    )
    return (
        tagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            # integer DIV: a double division could truncate differently
            # than the oracle's // floor once counts are huge
            F.expr("n_oov * 1000000 DIV n_tokens").alias("oov_ppm"),
        )
    )


def vocab_coverage_report_oracle() -> str:
    return f"""
        WITH tok AS (
            SELECT source, unnest({TOKENS_DUCK}) AS token FROM documents
        ),
        vocab AS (
            SELECT token FROM tok GROUP BY token
            ORDER BY count(*) DESC, token ASC LIMIT {VOCAB_SIZE}
        ),
        tagged AS (
            SELECT t.source, v.token IS NOT NULL AS in_vocab
            FROM tok t LEFT JOIN vocab v USING (token)
        )
        SELECT source,
               count(*) AS n_tokens,
               CAST(sum(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
               CAST(sum(CASE WHEN in_vocab THEN 0 ELSE 1 END) * 1000000
                    // count(*) AS BIGINT) AS oov_ppm
        FROM tagged GROUP BY source
    """


def q_vocab_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_coverage_report(load_table(spark, sf_dir, "documents"))


WEIGHTED_SAMPLE_K = 20


def weighted_sample(docs: DataFrame) -> DataFrame:
    """Deterministic weight-proportional sampling WITHOUT replacement,
    k per source (Efraimidis–Spirakis A-ES, the reservoir scheme a
    mixture builder uses to downsample a source while keeping long
    documents proportionally represented): each doc gets priority
    ln(u)/w with u a doc_id-derived deterministic uniform and w =
    n_chars; the k largest priorities per group are exactly a
    w-proportional draw.

    Determinism across engines is now EXACT, not probabilistic (r9
    verdict #3 closed): u comes from the shared 60-bit md5 hash, and
    ln(u) is computed by ``ln_u60_exact_sql`` — exactly-rounded IEEE
    double ops only, no libm call — so the priority doubles are
    bit-identical in Spark and DuckDB and the ordering can never flip
    between engines (the old float ``F.log`` path carried a documented
    cross-libm ulp coin-flip on near-tied priorities). Priorities are
    used ONLY for ordering, never emitted; doc_id breaks exact ties.
    One shuffle on source; rank is a per-group window over it, no
    global sort.
    """
    pri = F.expr(ln_u60_exact_sql("_h", "spark")) / F.col("n_chars").cast("double")
    w = Window.partitionBy("source").orderBy(F.desc("pri"), F.asc("doc_id"))
    return (
        docs.filter(F.col("n_chars") > 0)
        .select(
            "source",
            "doc_id",
            "n_chars",
            F.expr(hash60_spark_sql("concat('ws|', doc_id)")).alias("_h"),
        )
        .withColumn("pri", pri)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= WEIGHTED_SAMPLE_K)
        .select("source", "doc_id", "n_chars", "rank")
    )


def weighted_sample_oracle() -> str:
    h = hash60_duck_sql(chr(39) + "ws|" + chr(39) + " || doc_id")
    return f"""
        WITH hashed AS (
            SELECT source, doc_id, n_chars, {h} AS _h
            FROM documents WHERE n_chars > 0
        ),
        pri AS (
            SELECT source, doc_id, n_chars,
                   {ln_u60_exact_sql("_h", "duck")} / CAST(n_chars AS DOUBLE) AS pri
            FROM hashed
        ),
        ranked AS (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY source ORDER BY pri DESC, doc_id ASC
                   ) AS rank
            FROM pri
        )
        SELECT source, doc_id, n_chars, rank
        FROM ranked WHERE rank <= {WEIGHTED_SAMPLE_K}
    """


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_sample(load_table(spark, sf_dir, "documents"))


NOVELTY_K = 5  # gram width for novelty attribution


def ngram_novelty_report(docs: DataFrame) -> DataFrame:
    """Per-document n-gram NOVELTY — the memorization-risk curve a
    curation pipeline tracks while ingesting in arrival order: for each
    doc, the ppm share of its distinct 5-gram hashes whose FIRST corpus
    occurrence (min doc_id over containing docs) is this document. Low
    novelty = the doc is mostly re-statement of earlier content; the
    per-doc rows feed a keep/drop threshold the same way quality scores
    do.

    Shape: distinct (doc, gram-hash) rows; first-occurrence via a
    ``min over (partition by hash)`` window — ONE shuffle on the gram
    hash (no join), then the per-doc aggregate reuses the doc_id
    shuffle. Both relations are gram-rows-sized (~tokens per doc), never
    corpus².
    """
    tok = (
        spread(docs)
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= NOVELTY_K)
    )
    grams = tok.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(toks) - {NOVELTY_K - 1}),"
                    f" i -> {hash60_spark_sql(f'concat_ws({chr(39)} {chr(39)}, slice(toks, i, {NOVELTY_K}))')})"
                )
            )
        ).alias("h"),
    )
    first = F.min("doc_id").over(Window.partitionBy("h"))
    tagged = grams.select("doc_id", (F.col("doc_id") == first).cast("int").alias("novel"))
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("novel").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr("n_novel * 1000000 DIV n_grams").alias("novelty_ppm"),
        )
    )


def ngram_novelty_report_oracle() -> str:
    gram = f"array_to_string(toks[i:i+{NOVELTY_K - 1}], ' ')"
    return f"""
        WITH tok AS (
            SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
            WHERE len({TOKENS_DUCK}) >= {NOVELTY_K}
        ),
        grams AS (
            SELECT DISTINCT doc_id, {hash60_duck_sql(gram)} AS h
            FROM tok, unnest(generate_series(1, len(toks) - {NOVELTY_K - 1})) AS t(i)
        ),
        tagged AS (
            SELECT doc_id,
                   CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY h)
                        THEN 1 ELSE 0 END AS novel
            FROM grams
        )
        SELECT doc_id, count(*) AS n_grams,
               CAST(sum(novel) AS BIGINT) AS n_novel,
               CAST(sum(novel) * 1000000 // count(*) AS BIGINT) AS novelty_ppm
        FROM tagged GROUP BY doc_id
    """


def q_ngram_novelty_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_novelty_report(load_table(spark, sf_dir, "documents"))


LANG_MIX_WIN = 15      # tokens per language-scored window
LANG_MIX_MIN_TOKENS = 4  # windows below this are signal-free


def lang_mix_report(docs: DataFrame) -> DataFrame:
    """Within-document language-consistency scan — the code-switching /
    concatenation-artifact detector a cleaning pipeline runs before
    treating a document as monolingual: score fixed LANG_MIX_WIN-token
    windows with the stopword language heuristic (tail windows below
    LANG_MIX_MIN_TOKENS tokens are skipped as signal-free) and report
    every document whose windows DISAGREE, with the majority vote and
    the minority share in ppm.

    Fixed token windows rather than lines/sentences: the segmentation is
    tokenizer-defined, so it works on unpunctuated text and is exactly
    reproducible in the oracle. Shape: explode-by-window (bounded by
    doc length / WIN, never corpus-shaped), pure-column scoring, one
    hash aggregate back to doc grain — no window function, no join.
    """
    W = LANG_MIX_WIN
    segs = docs.select(
        "doc_id",
        "lang",
        tokens(F.col("text")).alias("toks"),
    ).select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(0, CAST(ceil(size(toks) / CAST("
                f"{W} AS DOUBLE)) AS INT) - 1), i -> slice(toks, i * {W} + 1, {W}))"
            )
        ).alias("seg"),
    )
    ratio = F.size(F.filter(F.col("seg"), lambda t: t.isin(*STOPWORDS))) / F.size("seg")
    scored = segs.filter(F.size("seg") >= LANG_MIX_MIN_TOKENS).select(
        "doc_id",
        "lang",
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unknown")).alias("seg_lang"),
    )
    agg = scored.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.when(F.col("seg_lang") == "en", 1).otherwise(0)).alias("n_en_segs"),
    )
    maj = F.when(
        F.col("n_en_segs") * 2 >= F.col("n_segs"), F.lit("en")
    ).otherwise(F.lit("unknown"))
    return (
        agg.filter((F.col("n_en_segs") > 0) & (F.col("n_en_segs") < F.col("n_segs")))
        .select(
            "doc_id",
            "lang",
            "n_segs",
            "n_en_segs",
            maj.alias("majority_lang"),
            F.expr(
                "least(n_en_segs, n_segs - n_en_segs) * 1000000 DIV n_segs"
            ).alias("minority_ppm"),
        )
    )


def lang_mix_report_oracle() -> str:
    W = LANG_MIX_WIN
    return f"""
        WITH tok AS (
            SELECT doc_id, lang, {TOKENS_DUCK} AS toks FROM documents
        ),
        segs AS (
            SELECT doc_id, lang,
                   toks[i * {W} + 1 : i * {W} + {W}] AS seg
            FROM tok,
                 unnest(generate_series(
                     0, CAST(ceil(len(toks) / CAST({W} AS DOUBLE)) AS INT) - 1
                 )) AS t(i)
        ),
        scored AS (
            SELECT doc_id, lang,
                   CASE WHEN len(list_filter(seg, t -> t IN ({_STOP_IN})))
                             / CAST(len(seg) AS DOUBLE) >= 0.05
                        THEN 'en' ELSE 'unknown' END AS seg_lang
            FROM segs
            WHERE len(seg) >= {LANG_MIX_MIN_TOKENS}
        ),
        agg AS (
            SELECT doc_id, lang, count(*) AS n_segs,
                   sum(CASE WHEN seg_lang = 'en' THEN 1 ELSE 0 END) AS n_en_segs
            FROM scored GROUP BY doc_id, lang
        )
        SELECT doc_id, lang, n_segs,
               CAST(n_en_segs AS BIGINT) AS n_en_segs,
               CASE WHEN n_en_segs * 2 >= n_segs THEN 'en' ELSE 'unknown' END
                   AS majority_lang,
               CAST(least(n_en_segs, n_segs - n_en_segs) * 1000000
                    // n_segs AS BIGINT) AS minority_ppm
        FROM agg
        WHERE n_en_segs > 0 AND n_en_segs < n_segs
    """


def q_lang_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_mix_report(load_table(spark, sf_dir, "documents"))


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(load_table(spark, sf_dir, "documents"))


TRI_MICRO = 1_000_000  # per-trigram ln(p) fixed-point scale (micro-nats)


def lm_score(docs: DataFrame) -> DataFrame:
    """Char-trigram language-model quality score — the CCNet-style "LM
    perplexity filter" reduced to corpus self-statistics: each document
    is scored by the average log-probability of its character trigrams
    under the corpus's own trigram distribution. Gibberish, binary
    spill, and OCR noise sit in the low tail; fluent running text sits
    high. Complements ``token_commonness`` (word level) by catching
    damage INSIDE words.

    Plan shape: one trigram-explode pass feeds both the model aggregate
    (shuffle on trigram) and the scoring join (big-to-big on trigram —
    at 100 TB the trigram model is small, but the join is written
    shuffle-shaped so the same plan serves byte-pair or word n-gram
    models that aren't); the corpus total is a broadcast 1-row scalar.
    Float discipline: ln() is computed per DISTINCT model row, scaled to
    integer micro-nats and rounded BEFORE the per-doc sum, so the
    accumulation is exact int64 and cross-engine accumulation order
    cannot move the score (the salted-join micro-units pattern).
    """
    tri = (
        spread(docs)
        .filter(F.length("text") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(text) - 2),"
                    " i -> substring(text, i, 3))"
                )
            ).alias("tri"),
        )
    )
    # materialized once (r17): the trigram relation is read three times
    # (model aggregate, corpus total, scoring join) and Catalyst re-plans
    # the scan + explode per reader (guide §2.4 duplicated subtrees —
    # 6 parquet scans in the before plan)
    tri = cut_lineage(tri, eager=False)
    model = tri.groupBy("tri").agg(F.count(F.lit(1)).alias("cnt"))
    total = tri.agg(F.count(F.lit(1)).alias("total"))
    micro = (
        model.crossJoin(F.broadcast(total))
        .select(
            "tri",
            F.round(F.log(F.col("cnt") / F.col("total")) * TRI_MICRO)
            .cast("long")
            .alias("micro_nats"),
        )
    )
    return (
        tri.join(micro, "tri")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            # exact int64-micro ratio: shared half-up (r12 conversion)
            round_half_up(
                (F.sum("micro_nats") / F.count(F.lit(1))) / F.lit(TRI_MICRO).cast("double"),
                6,
            ).alias("avg_logp"),
        )
    )


LM_SCORE_ORACLE = f"""
    WITH trows AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(text) - 2),
                                     i -> substr(text, i, 3))) AS tri
        FROM documents WHERE len(text) >= 3
    ),
    model AS (SELECT tri, count(*) AS cnt FROM trows GROUP BY tri),
    tot AS (SELECT count(*) AS total FROM trows),
    micro AS (
        SELECT tri,
               CAST(round(ln(cnt / CAST(total AS DOUBLE)) * {TRI_MICRO}) AS BIGINT)
                   AS micro_nats
        FROM model CROSS JOIN tot
    )
    SELECT doc_id,
           count(*) AS n_trigrams,
           {round_half_up_sql(f"(CAST(sum(micro_nats) AS DOUBLE) / count(*)) / CAST({TRI_MICRO} AS DOUBLE)", 6)} AS avg_logp
    FROM trows JOIN micro USING (tri)
    GROUP BY doc_id
"""


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm_score(load_table(spark, sf_dir, "documents"))


CHUNK_TOKENS = 128   # tokens per chunk (the downstream model's window)
CHUNK_OVERLAP = 32   # tokens shared between consecutive chunks
CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP


def chunk_documents(docs: DataFrame) -> DataFrame:
    """Overlapping token-window chunking — the prep step that turns long
    documents into model-window-sized pieces for embedding or
    pretraining: chunk c covers tokens [c*stride, c*stride + CHUNK_TOKENS)
    with ``CHUNK_OVERLAP`` tokens shared between neighbors so no span is
    split across a boundary without context.

    Chunk count is exact integer math — ceil(max(n - overlap, 1) /
    stride) via ``(x + stride - 1) div stride`` — identical in both
    engines, covering every token (the final chunk may be short). The
    chunk content crosses the compare boundary as a sha256 of the
    re-joined tokens (the ``redact_pii`` convention: hash long text out
    of the value-compare path). Map-side only: sequence + slice per row,
    one explode, no shuffle — at 100 TB chunking is a pure scan stage
    that pipelines into whatever writes the chunk shards.
    """
    n_chunks_sql = (
        f"(greatest(size(toks) - {CHUNK_OVERLAP}, 1) + {CHUNK_STRIDE} - 1)"
        f" div {CHUNK_STRIDE}"
    )
    tok = spread(docs).select("doc_id", tokens(F.col("text")).alias("toks"))
    return (
        tok.filter(F.size("toks") >= 1)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, ({n_chunks_sql}) - 1),"
                    f" c -> struct(c AS chunk_no, c * {CHUNK_STRIDE} AS chunk_start,"
                    f" slice(toks, c * {CHUNK_STRIDE} + 1, {CHUNK_TOKENS}) AS chunk))"
                )
            ).alias("e"),
        )
        .select(
            "doc_id",
            F.col("e.chunk_no").alias("chunk_no"),
            F.col("e.chunk_start").alias("chunk_start"),
            F.size("e.chunk").alias("n_chunk_tokens"),
            F.sha2(F.concat_ws(" ", "e.chunk"), 256).alias("chunk_sha256"),
        )
    )


CHUNK_DOCUMENTS_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
        WHERE len({TOKENS_DUCK}) >= 1
    ),
    chunks AS (
        SELECT doc_id, toks,
               unnest(generate_series(0,
                   CAST((greatest(len(toks) - {CHUNK_OVERLAP}, 1) + {CHUNK_STRIDE} - 1)
                        // {CHUNK_STRIDE} AS BIGINT) - 1)) AS chunk_no
        FROM tok
    )
    SELECT doc_id,
           chunk_no,
           chunk_no * {CHUNK_STRIDE} AS chunk_start,
           len(list_slice(toks, chunk_no * {CHUNK_STRIDE} + 1,
                          chunk_no * {CHUNK_STRIDE} + {CHUNK_TOKENS}))
               AS n_chunk_tokens,
           sha256(array_to_string(list_slice(toks, chunk_no * {CHUNK_STRIDE} + 1,
                                             chunk_no * {CHUNK_STRIDE} + {CHUNK_TOKENS}), ' '))
               AS chunk_sha256
    FROM chunks
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(load_table(spark, sf_dir, "documents"))


def source_mixture_report(docs: DataFrame) -> DataFrame:
    """Per-source corpus composition — the measurement taken BEFORE
    ``mixture_sample`` decides the target rates: document count, token
    volume, both as exact int-ppm shares of the corpus, plus an
    integrity count of rows whose stored ``n_chars`` disagrees with the
    text (upstream truncation shows up here first).

    One tokenize-free pass (token counts reuse the whitespace-count
    identity: tokens = separators + 1 on trimmed text), one small
    aggregate on source, corpus totals broadcast back as a single row.
    All sums and shares are int64-exact, so the report hash-matches
    structurally.
    """
    n_tokens = F.size(tokens(F.col("text"))).cast("long")
    per = (
        spread(docs)
        .select(
            "source",
            n_tokens.alias("n_toks"),
            # coalesce matches the oracle's CASE ... ELSE 0: a NULL text or
            # n_chars must count as 0, not propagate NULL into the SUM
            F.coalesce(
                (F.length("text") != F.col("n_chars")).cast("long"), F.lit(0)
            ).alias("bad_chars"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.sum("bad_chars").alias("n_chars_mismatch"),
        )
    )
    # |source|-row relation read by the totals branch AND the final
    # join; without the cut each branch re-plans the corpus scan + token
    # count (2 full passes — r17 scan audit)
    per = cut_lineage(per, eager=False)
    totals = per.agg(
        F.sum("n_docs").alias("tot_docs"), F.sum("n_tokens").alias("tot_tokens")
    )
    return per.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("n_docs * 1000000 div tot_docs").alias("doc_share_ppm"),
        F.expr("n_tokens * 1000000 div tot_tokens").alias("token_share_ppm"),
        "n_chars_mismatch",
    )


SOURCE_MIXTURE_REPORT_ORACLE = f"""
    WITH per AS (
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(len({TOKENS_DUCK})) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN length(text) != n_chars THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_chars_mismatch
        FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n_docs) AS tot_docs, sum(n_tokens) AS tot_tokens FROM per)
    SELECT source, n_docs, n_tokens,
           CAST((n_docs * 1000000) // tot_docs AS BIGINT) AS doc_share_ppm,
           CAST((n_tokens * 1000000) // tot_tokens AS BIGINT) AS token_share_ppm,
           n_chars_mismatch
    FROM per CROSS JOIN tot
"""


def q_source_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return source_mixture_report(load_table(spark, sf_dir, "documents"))


BOILER_SEG_TOKENS = 8   # non-overlapping segment width (tokens)
BOILER_MIN_DF = 3       # segment is boilerplate if seen in >= this many docs


def boilerplate_scrub(docs: DataFrame) -> DataFrame:
    """CCNet-style boilerplate removal at segment granularity.

    Documents are cut into non-overlapping ``BOILER_SEG_TOKENS``-token
    segments (the stand-in for lines/paragraphs — the fixture text has no
    newlines); a segment whose hash occurs in >= ``BOILER_MIN_DF``
    DISTINCT documents is boilerplate (nav bars, license headers, shared
    templates) and is dropped; the cleaned document is re-joined from the
    surviving segments in order.

    Plan: segment explode (map-side), segment-hash document-frequency
    aggregate, keyed join back on seg_hash (no broadcast — the
    boilerplate set is corpus-scale in the worst case), then one per-doc
    aggregate that rebuilds the text via a sorted struct collect. Three
    keyed shuffles total; cleaned content crosses the compare boundary as
    sha256 (the ``redact_pii`` convention).
    """
    w = BOILER_SEG_TOKENS
    base = spread(docs).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).withColumn("n", F.size("toks"))
    segs = base.select(
        "doc_id",
        "toks",
        "n",
        F.explode(F.expr(f"sequence(0, (n - 1) div {w})")).alias("seg_i"),
    ).select(
        "doc_id",
        "seg_i",
        F.expr(f"concat_ws(' ', slice(toks, seg_i * {w} + 1, {w}))").alias("seg_text"),
        F.expr(f"least({w}, n - seg_i * {w})").cast("long").alias("seg_len"),
    ).withColumn("seg_hash", F.expr(hash60_spark_sql("seg_text")))
    # one segmentation/md5 pass feeds BOTH the frequency aggregate and the
    # join probe (the dedup.py shared-materialization pattern; local-mode
    # lineage cut — see SCALE.md known tradeoffs for the cluster variant)
    segs = cut_lineage(segs, eager=False)
    freq = segs.groupBy("seg_hash").agg(
        F.countDistinct("doc_id").alias("seg_df")
    )
    marked = segs.join(freq, "seg_hash").withColumn(
        "is_boiler", F.col("seg_df") >= BOILER_MIN_DF
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.col("is_boiler").cast("long")).alias("n_boiler_segments"),
        F.sum(F.when(~F.col("is_boiler"), F.col("seg_len")).otherwise(F.lit(0))).alias("clean_n_tokens"),
        F.sha2(
            F.concat_ws(
                " ",
                F.filter(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("seg_i"),
                                    F.when(~F.col("is_boiler"), F.col("seg_text")).alias("seg"),
                                )
                            )
                        ),
                        lambda s: s.seg,
                    ),
                    lambda x: x.isNotNull(),
                ),
            ),
            256,
        ).alias("clean_sha256"),
    )


_SEG_HASH_DUCK = hash60_duck_sql("seg_text")

BOILERPLATE_SCRUB_ORACLE = f"""
    WITH base AS (
        SELECT doc_id, {TOKENS_DUCK} AS toks, len({TOKENS_DUCK}) AS n
        FROM documents
    ),
    segs AS (
        SELECT doc_id,
               unnest(generate_series(0, (n - 1) // {BOILER_SEG_TOKENS})) AS seg_i,
               toks, n
        FROM base
    ),
    st AS (
        SELECT doc_id, seg_i,
               array_to_string(
                   toks[seg_i * {BOILER_SEG_TOKENS} + 1 :
                        seg_i * {BOILER_SEG_TOKENS} + {BOILER_SEG_TOKENS}], ' ')
                   AS seg_text,
               CAST(least({BOILER_SEG_TOKENS}, n - seg_i * {BOILER_SEG_TOKENS}) AS BIGINT)
                   AS seg_len
        FROM segs
    ),
    hashed AS (SELECT *, {_SEG_HASH_DUCK} AS seg_hash FROM st),
    freq AS (
        SELECT seg_hash, count(DISTINCT doc_id) >= {BOILER_MIN_DF} AS is_boiler
        FROM hashed GROUP BY seg_hash
    ),
    marked AS (SELECT h.*, f.is_boiler FROM hashed h JOIN freq f USING (seg_hash))
    SELECT doc_id,
           count(*) AS n_segments,
           CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boiler_segments,
           CAST(sum(CASE WHEN is_boiler THEN 0 ELSE seg_len END) AS BIGINT)
               AS clean_n_tokens,
           sha256(coalesce(
               string_agg(CASE WHEN NOT is_boiler THEN seg_text END, ' '
                          ORDER BY seg_i), ''))
               AS clean_sha256
    FROM marked
    GROUP BY doc_id
"""


def q_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return boilerplate_scrub(load_table(spark, sf_dir, "documents"))


def quality_decile_report(docs: DataFrame) -> DataFrame:
    """Per-decile corpus report over the composite quality score — the
    measurement behind "keep the top X% by model score" pruning.

    Deciles are EXACT but never globally sort the corpus: thresholds come
    from the score VALUE HISTOGRAM (cardinality-bounded, the
    ``value_histogram`` pattern) — t_k = min{score : cum_count*10 >= k*N}
    is a pure integer comparison, so the cut points are engine-identical
    with no percentile-interpolation float drift. The 9-threshold array
    is a 1-row broadcast; decile assignment is map-side.
    """
    # materialized once (r17): the histogram, the total and the decile
    # assignment all read the scored relation, and each previously
    # re-ran the corpus scan + tokenize/regexp feature pass (guide §2.4
    # duplicated subtrees — 6 parquet scans in the before plan)
    s = cut_lineage(
        quality_score(docs).select(
            "doc_id", F.col("quality_score").alias("qs"), "n_tokens"
        ),
        eager=False,
    )
    vc = s.groupBy("qs").agg(F.count(F.lit(1)).alias("cnt"))
    cum = vc.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("qs").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    total = s.agg(F.count(F.lit(1)).alias("n_total"))
    th = (
        cum.crossJoin(F.broadcast(total))
        .select("qs", "cum", "n_total", F.explode(F.expr("sequence(1, 9)")).alias("k"))
        .filter(F.expr("cum * 10 >= k * n_total"))
        .groupBy("k")
        .agg(F.min("qs").alias("t"))
    )
    th_arr = th.groupBy().agg(
        F.array_sort(F.collect_list("t")).alias("th")
    )
    assigned = s.crossJoin(F.broadcast(th_arr)).select(
        "doc_id",
        "qs",
        "n_tokens",
        (1 + F.size(F.filter("th", lambda t: F.col("qs") > t))).alias("decile"),
    )
    return assigned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.min("qs"), 6).alias("min_score"),
        F.round(F.max("qs"), 6).alias("max_score"),
        # qs is 6-decimal by construction: exact int64 micro sum; tokens
        # are ints — both avgs engine-exact + shared half-up (r12)
        F.expr(avg_6dec_exact_sql("qs", 6)).alias("avg_score"),
        F.expr(avg_exact_int_sql("n_tokens", 6)).alias("avg_tokens"),
    )


QUALITY_DECILE_REPORT_ORACLE = f"""
    WITH feats AS (
        SELECT doc_id,
               len({TOKENS_DUCK}) AS n_tokens,
               {_PUNCT_RATIO_DUCK} AS punct_ratio,
               {_STOPWORD_RATIO_DUCK} AS stopword_ratio
        FROM documents
    ),
    s AS (
        SELECT doc_id, n_tokens,
               {_QSCORE_DUCK} AS qs
        FROM feats
    ),
    vc AS (SELECT qs, count(*) AS cnt FROM s GROUP BY qs),
    cum AS (SELECT qs, sum(cnt) OVER (ORDER BY qs
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM vc),
    tot AS (SELECT count(*) AS n_total FROM s),
    th AS (
        SELECT k, min(qs) AS t
        FROM cum CROSS JOIN tot
             CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS k)
        WHERE cum * 10 >= k * n_total
        GROUP BY k
    ),
    assigned AS (
        SELECT s.doc_id, s.qs, s.n_tokens,
               1 + (SELECT count(*) FROM th WHERE s.qs > th.t) AS decile
        FROM s
    )
    SELECT CAST(decile AS INTEGER) AS decile,
           count(*) AS n_docs,
           round(min(qs), 6) AS min_score,
           round(max(qs), 6) AS max_score,
           {avg_6dec_exact_sql('qs', 6)} AS avg_score,
           {avg_exact_int_sql('n_tokens', 6)} AS avg_tokens
    FROM assigned
    GROUP BY 1
"""


def q_quality_decile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_decile_report(load_table(spark, sf_dir, "documents"))


BPE_TOP = 20  # merge candidates reported per round


def bpe_merge_round(docs: DataFrame) -> DataFrame:
    """One round of BPE vocabulary induction: the corpus-wide adjacent
    character-pair statistics whose argmax becomes the next merge rule —
    tokenizer TRAINING, the complement of the token-counting ops.

    The real BPE trick is in the plan: pair counts come from the
    DISTINCT-WORD table weighted by word frequency — the corpus crosses
    the wire once to build word counts (vocabulary-sized), and the
    character explosion runs over the vocabulary, not the corpus. Ranks
    tie-break lexicographically so the report is engine-deterministic.
    """
    words = spread(docs).select(F.explode(tokens(F.col("text"))).alias("word"))
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("n_w"))
    pairs = (
        wc.filter(F.length("word") >= 2)
        .select(
            "n_w",
            F.explode(F.expr("sequence(1, length(word) - 1)")).alias("i"),
            F.col("word"),
        )
        .select(F.expr("substring(word, i, 2)").alias("pair"), "n_w")
        .groupBy("pair")
        .agg(F.sum("n_w").alias("pair_count"))
    )
    top = pairs.orderBy(F.desc("pair_count"), F.asc("pair")).limit(BPE_TOP)
    w = Window.orderBy(F.desc("pair_count"), F.asc("pair"))
    return top.select(
        "pair", "pair_count", F.row_number().over(w).alias("rank")
    )


BPE_MERGE_ROUND_ORACLE = f"""
    WITH w AS (SELECT unnest({TOKENS_DUCK}) AS word FROM documents),
    wc AS (SELECT word, count(*) AS n_w FROM w GROUP BY word),
    ex AS (
        SELECT word, n_w,
               unnest(generate_series(1, length(word) - 1)) AS i
        FROM wc WHERE length(word) >= 2
    ),
    pc AS (
        SELECT substr(word, CAST(i AS INTEGER), 2) AS pair,
               CAST(sum(n_w) AS BIGINT) AS pair_count
        FROM ex GROUP BY 1
    ),
    top AS (SELECT * FROM pc ORDER BY pair_count DESC, pair LIMIT {BPE_TOP})
    SELECT pair, pair_count,
           CAST(row_number() OVER (ORDER BY pair_count DESC, pair) AS INTEGER)
               AS rank
    FROM top
"""


def q_bpe_merge_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_merge_round(load_table(spark, sf_dir, "documents"))


CMS_W = 1024  # count-min sketch buckets per row
CMS_K = 3     # hash rows
CMS_PROBE_TOP = 50  # exact heavy hitters audited against the sketch


def cms_token_counts(docs: DataFrame) -> DataFrame:
    """Count-min sketch accuracy audit for corpus token frequencies: the
    constant-memory mergeable counter a streaming wordcount deploys at
    100 TB, with its estimates checked against exact counts for the
    top heavy hitters.

    The K hash rows are deterministic affine mixes over the 60-bit token
    hash (the Bloom/ MinHash family), so the sketch — including its
    collision OVERestimates — is engine-exact and this report is
    hash-oracle-checked like the Bloom decontaminator. CMS guarantees
    estimate >= exact (test-pinned); the ppm column prices the sketch's
    collision error at this (W, K).
    """
    from ..operators.dedup import _MIX, MERSENNE_P

    toks = spread(docs).select(F.explode(tokens(F.col("text"))).alias("token"))
    # materialized once (r17): the sketch-cell aggregate and the exact
    # heavy-hitter count both read the hashed token relation, and each
    # previously re-ran the corpus tokenize + explode + md5 (guide §2.4)
    hashed = cut_lineage(
        toks.withColumn("t_h", F.expr(hash60_spark_sql("token"))), eager=False
    )
    mixes = _MIX[:CMS_K]
    pos = [
        f"(({a} * (t_h % {MERSENNE_P}) + {b}) % {MERSENNE_P}) % {CMS_W}"
        for a, b in mixes
    ]
    # sketch rows: (j, bucket) -> count; K*W cells total, mergeable
    cells = (
        hashed.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("row_j"), F.expr(p).alias("bucket")
                        )
                        for j, p in enumerate(pos)
                    ]
                )
            ).alias("c")
        )
        .groupBy("c.row_j", "c.bucket")
        .agg(F.count(F.lit(1)).alias("cell_n"))
    )
    exact = (
        hashed.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"), F.first("t_h").alias("t_h"))
        .orderBy(F.desc("exact_n"), F.asc("token"))
        .limit(CMS_PROBE_TOP)
    )
    probes = exact.select(
        "token",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("row_j"), F.expr(p).alias("bucket"))
                    for j, p in enumerate(pos)
                ]
            )
        ).alias("c"),
    ).select("token", "exact_n", "c.row_j", "c.bucket")
    est = (
        probes.join(cells, ["row_j", "bucket"])
        .groupBy("token", "exact_n")
        .agg(F.min("cell_n").alias("cms_n"))
    )
    return est.select(
        "token",
        "exact_n",
        "cms_n",
        F.expr("(cms_n - exact_n) * 1000000 div exact_n").alias("overestimate_ppm"),
    )


def cms_token_counts_oracle() -> str:
    from .dedup import _MIX, MERSENNE_P

    mixes = _MIX[:CMS_K]
    pos = [
        f"(({a} * (t_h % {MERSENNE_P}) + {b}) % {MERSENNE_P}) % {CMS_W}"
        for a, b in mixes
    ]
    pos_structs = ", ".join(
        f"{{'row_j': {j}, 'bucket': {p}}}" for j, p in enumerate(pos)
    )
    th = hash60_duck_sql("token")
    return f"""
    WITH toks AS (
        SELECT unnest({TOKENS_DUCK}) AS token FROM documents
    ),
    hashed AS (SELECT token, {th} AS t_h FROM toks),
    cells AS (
        SELECT c.row_j, c.bucket, count(*) AS cell_n FROM (
            SELECT unnest([{pos_structs}]) AS c FROM hashed
        ) GROUP BY 1, 2
    ),
    exact AS (
        SELECT token, count(*) AS exact_n, any_value(t_h) AS t_h
        FROM hashed GROUP BY token
        ORDER BY exact_n DESC, token LIMIT {CMS_PROBE_TOP}
    ),
    probes AS (
        SELECT token, exact_n, c.row_j AS row_j, c.bucket AS bucket FROM (
            SELECT token, exact_n, unnest([{pos_structs}]) AS c FROM exact
        )
    ),
    est AS (
        SELECT p.token, p.exact_n, CAST(min(cells.cell_n) AS BIGINT) AS cms_n
        FROM probes p JOIN cells USING (row_j, bucket)
        GROUP BY 1, 2
    )
    SELECT token, exact_n, cms_n,
           ((cms_n - exact_n) * 1000000) // exact_n AS overestimate_ppm
    FROM est
"""


def q_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cms_token_counts(load_table(spark, sf_dir, "documents"))
