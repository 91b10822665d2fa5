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
               (the verify stage without the LSH prefilter);
- winnowing:  position-aware fingerprint sets with guaranteed density
              (``winnow_fingerprints``);
- clusters:   connected components over the verified pair graph
              (``dedup_clusters`` — iterative min-label propagation vs a
              recursive-CTE oracle).

Scale notes: pair generation never self-joins the exploded shingle table
(a self-join computes the whole shingling subplan once per side and its
fanout is quadratic in the hottest shingle's document frequency). Instead
both pair generators group by the hash key (shingle / band hash) into a
doc-list bucket, drop buckets larger than ``df_cap`` — a shingle present
in more than ``HOT_SHINGLE_DF_FRAC`` of the corpus (bounded by
``HOT_SHINGLE_DF_MAX``) is boilerplate with no dedup signal — and explode
the i<j pairs inside each surviving bucket. One shingling pass, two
shuffles, and per-bucket fanout bounded by C(df_cap, 2). The identical
cap is applied in the DuckDB oracles (HAVING on shingle df), so the
results match bit-for-bit; at fixture scale no shingle crosses the cap,
which also proves the cap is output-invariant on clean corpora.
Set sizes (Jaccard denominators) remain the full shingle-set sizes;
only intersection counting skips hot shingles — documented convention,
mirrored in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import (
    TOKENS_DUCK,
    hash60_duck_sql,
    hash60_spark_sql,
    shingles_duck,
    tokens,
)
from ..sources.tables import load_table, spread
from ..functions.rounding import round_half_up, round_half_up_sql
from ..lineage import cut_lineage
from .textops import (
    QUALITY_SCORE_ORACLE,
    quality_score,
    split_duck_sql,
    split_spark_sql,
)

N_HASHES = 8          # MinHash signature length
N_BANDS = 4           # LSH bands (2 rows per band)
ROWS_PER_BAND = N_HASHES // N_BANDS
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 16
HOT_SHINGLE_DF_FRAC = 0.10   # shingle in > this corpus fraction = boilerplate
HOT_SHINGLE_DF_MIN = 16      # never treat a df <= this as hot (tiny corpora)
HOT_SHINGLE_DF_MAX = 10_000  # absolute bound: C(cap, 2) limits bucket fanout


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


def source_overlap_matrix(docs: DataFrame) -> DataFrame:
    """Cross-source contamination matrix: for every source pair
    (source_a <= source_b, unordered), how many VERIFIED near-duplicate
    document pairs connect the two sources, plus the distinct documents
    involved on each side — the report that tells a corpus curator which
    feeds re-scrape each other (and how much duplicated mass a mixture
    weight would double-count). Diagonal rows (same source) are kept:
    within-source duplication is the other half of the story.

    Shape: the pair graph comes from the capped banded-LSH pipeline
    (pair-graph-sized, never corpus²); the two source lookups are
    doc_id-keyed joins against the (doc_id, source) projection; the
    matrix aggregate is bounded by |sources|² (a bounded domain).
    """
    pairs = minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    src = docs.select("doc_id", "source")
    tagged = (
        pairs.join(src.select(F.col("doc_id").alias("doc_a"),
                              F.col("source").alias("src_a")), "doc_a")
        .join(src.select(F.col("doc_id").alias("doc_b"),
                         F.col("source").alias("src_b")), "doc_b")
    )
    sa = F.least("src_a", "src_b").alias("source_a")
    sb = F.greatest("src_a", "src_b").alias("source_b")
    return (
        tagged.select(sa, sb, "doc_a", "doc_b")
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            # distinct docs on the lower/higher DOC-ID side of each pair
            # (pair orientation is id-order, not source-order)
            F.count_distinct("doc_a").alias("n_docs_lo"),
            F.count_distinct("doc_b").alias("n_docs_hi"),
        )
    )


def source_overlap_matrix_oracle() -> str:
    return f"""
        WITH pairs AS ({minhash_lsh_pairs_oracle()})
        SELECT least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b,
               count(*) AS n_pairs,
               count(DISTINCT p.doc_a) AS n_docs_lo,
               count(DISTINCT p.doc_b) AS n_docs_hi
        FROM pairs p
        JOIN documents da ON p.doc_a = da.doc_id
        JOIN documents db ON p.doc_b = db.doc_id
        GROUP BY 1, 2
    """


def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return source_overlap_matrix(load_table(spark, sf_dir, "documents"))


def _shingle_rows(docs: DataFrame, distinct: bool = True) -> DataFrame:
    """(doc_id, 3-gram shingle) rows for docs with >= 3 tokens.

    ``distinct=False`` skips the set-dedup shuffle for consumers whose
    result is invariant under duplicate shingles (MinHash: the min over a
    multiset equals the min over its set). Jaccard consumers need the set.

    Built as a SHUFFLE-FREE higher-order transform over the token array —
    ``transform(sequence, i -> concat_ws(toks[i-1], toks[i], toks[i+1]))``
    with direct 0-based subscripts — then one explode (guide §2.4
    "remove shuffles outright"). Two earlier forms, both measured:

    - ``transform`` with ``slice(...)`` inside the lambda (r<=9):
      allocates a sub-array per shingle, measured ~4x slower than the
      window form at sf0.1 — the adjudication that originally picked the
      window form. Direct indexing has no per-shingle allocation and is
      NOT that shape.
    - posexplode + two window ``lead``s + concat (r10-r17): codegen'd,
      but the window costs a full corpus token-row shuffle + sort in
      every non-pre-partitioned caller. The indexed transform is
      value-identical (r18: multiset diff 0 on the sf0.1 corpus) and
      measured ~2x faster at sf0.1 (0.88 -> 0.58 s distinct,
      0.75 -> 0.25 s multiset), and at 100 TB it removes the one
      corpus-wide exchange every shingle consumer paid.

    Output strings are identical, so the DuckDB oracles keep their
    list-comprehension form.
    """
    tok = (
        spread(docs)
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= 3)
    )
    sh = F.expr(
        "transform(sequence(1, size(toks) - 2),"
        " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
    )
    rows = tok.select("doc_id", F.explode(sh).alias("s"))
    return rows.distinct() if distinct else rows


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


def _mh_duck(k: int) -> str:
    return f"list_min(list_transform(sh, x -> {_mh_expr(k, hash60_duck_sql)}))"


def _hashed_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, 60-bit shingle hash) rows. The md5 pass happens ONCE here;
    signatures/bands/verify all derive from this integer column."""
    return _shingle_rows(docs).select(
        "doc_id", F.expr(hash60_spark_sql("s")).alias("s_h")
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """k min-hashes per document (the MinHash signature).

    Plain codegen'd min() aggregates over the hashed shingle rows — one
    shuffle on doc_id, map-side partial mins, no per-array lambda work.

    Profiled (r2 flagged a 1.65x bench regression vs the r1 distinct-rows
    variant): the optimized plan keeps the md5 in ONE Project below the
    aggregate (verified — 1 md5 occurrence; the 8 affine mixes run on the
    materialized s_h attribute), and min-of-3 timing at sf0.1 puts this
    multiset form and the r1 distinct form within run noise of each other
    (0.75 s vs 0.73 s) — the flagged regression was host variance, and
    this form still saves the distinct's extra shuffle at scale.
    """
    mixes = [
        F.min(F.expr(f"({a} * (s_h % {MERSENNE_P}) + {b}) % {MERSENNE_P}")).alias(f"mh{k}")
        for k, (a, b) in enumerate(_MIX)
    ]
    rows = _shingle_rows(docs, distinct=False).select(
        "doc_id", F.expr(hash60_spark_sql("s")).alias("s_h")
    )
    return rows.groupBy("doc_id").agg(*mixes)


def minhash_signatures_oracle() -> str:
    cols = ", ".join(f"{_mh_duck(k)} AS mh{k}" for k in range(N_HASHES))
    return f"WITH {_SHINGLED_DUCK} SELECT doc_id, {cols} FROM shingled"


def _band_hash_spark(b: int) -> str:
    parts = ", ".join(f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
    return f"md5(concat_ws(':', {parts}))"


def _band_hash_duck(b: int) -> str:
    parts = ", ".join(f"CAST(mh{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND))
    return f"md5(concat_ws(':', {parts}))"


def _doc_cap(docs: DataFrame) -> DataFrame:
    """1-row frame with the effective hot-key document-frequency cap:
    least(frac * corpus size, absolute max). Broadcast into bucket filters
    so the threshold scales with the corpus without a driver-side action."""
    return docs.agg(
        F.greatest(
            F.least(
                F.floor(F.count(F.lit(1)) * F.lit(HOT_SHINGLE_DF_FRAC)).cast("bigint"),
                F.lit(HOT_SHINGLE_DF_MAX).cast("bigint"),
            ),
            F.lit(HOT_SHINGLE_DF_MIN).cast("bigint"),
        ).alias("df_cap")
    )


# sorted bucket array -> all i<j pairs via TWO-LEVEL explode: anchor
# index i first, then the tail slice. A single
# flatten(transform(...)) of all pairs would materialize C(|ds|, 2)
# structs inside ONE row before its explode — at the df-cap ceiling
# (HOT_SHINGLE_DF_MAX = 10,000 docs) that is a ~50M-element array
# (gigabytes) in one row, an executor OOM the cap was supposed to
# prevent (r10 audit). Two generators emit the same pair set with every
# intermediate row O(|ds|). Callers filter size>=2 first
# (sequence(1, 0) would produce a DESCENDING sequence, not an empty
# one).


def _capped_sorted_buckets(
    exploded: DataFrame, keys: list[str], item_col, cap, lo: int = 2
) -> DataFrame:
    """``groupBy(keys)`` -> sorted item-array buckets (``ds``), with
    over-cap groups dropped BEFORE their arrays ever materialize.

    ``collect_list`` assembles each group's FULL array in the reduce-side
    aggregation buffer before any size filter can run — a boilerplate
    key at corpus scale (one shingle across 1B docs) is a multi-GB array
    in one buffer, the same OOM-at-the-cap class as the flatten-pair
    explosion fixed alongside (r10 audit). Here the over-cap keys are
    found first with a count aggregate — map-side combined, so its
    shuffle carries one row per key per mapper — and anti-joined away;
    the collect then only sees groups at or under the cap. Hot-key
    cardinality is bounded by total_rows / cap, so the anti join's build
    side is small by construction (no broadcast HINT — the planner/AQE
    broadcasts it when its runtime size allows, per the repo's
    no-SF-scaled-hints policy).

    ``cap``: an int, or a 1-row single-column DataFrame (broadcast).
    """
    kcols = list(keys)
    counted = exploded.groupBy(*kcols).agg(F.count(F.lit(1)).alias("_n"))
    if isinstance(cap, DataFrame):
        hot = (
            counted.crossJoin(F.broadcast(cap.toDF("_cap")))
            .filter(F.col("_n") > F.col("_cap"))
            .select(*kcols)
        )
    else:
        hot = counted.filter(F.col("_n") > cap).select(*kcols)
    return (
        exploded.join(hot, kcols, "left_anti")
        .groupBy(*kcols)
        .agg(F.sort_array(F.collect_list(item_col)).alias("ds"))
        .filter(F.size("ds") >= lo)
    )


def _explode_pairs_ids(buckets: DataFrame) -> DataFrame:
    """(…, ds: array<id>) bucket rows -> (doc_a, doc_b) i<j pairs."""
    return (
        buckets.select("ds", F.explode(F.expr("sequence(1, size(ds) - 1)")).alias("i"))
        .select(
            F.expr("element_at(ds, i)").alias("doc_a"),
            F.explode(F.expr("slice(ds, i + 1, size(ds) - i)")).alias("doc_b"),
        )
    )


def _explode_pairs_with_sizes(buckets: DataFrame) -> DataFrame:
    """(…, ds: array<struct<doc_id, n_sh>>) -> (doc_a, n_a, doc_b, n_b)."""
    return (
        buckets.select("ds", F.explode(F.expr("sequence(1, size(ds) - 1)")).alias("i"))
        .select(
            F.expr("element_at(ds, i).doc_id").alias("doc_a"),
            F.expr("element_at(ds, i).n_sh").alias("n_a"),
            F.explode(F.expr("slice(ds, i + 1, size(ds) - i)")).alias("y"),
        )
        .select(
            "doc_a",
            "n_a",
            F.col("y.doc_id").alias("doc_b"),
            F.col("y.n_sh").alias("n_b"),
        )
    )


def _exploded_hashed(docs: DataFrame) -> DataFrame:
    """(doc_id, full-set size, shingle-hash) rows.

    Shingles are hashed to 60-bit ints *before* any shuffle: integer keys
    move a fraction of the bytes of long n-gram strings. The per-doc set
    size rides along each row (one tiny int, via a partition window) so
    Jaccard denominators never need a separate sizes join. The same hash
    is applied in the oracle, so even the (negligible) collision behavior
    is identical in both engines.
    """
    return _hashed_rows(docs).select(
        "doc_id",
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("n_sh"),
        "s_h",
    )


def _jaccard(inter: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_inter, n_a, n_b) -> thresholded rounded Jaccard."""
    # exact-int ratio: shared half-up so an on-boundary rational cannot
    # split the engines' native round (r12 conversion)
    j = round_half_up(
        F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
    )
    return (
        inter.select("doc_a", "doc_b", j.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def minhash_lsh_pairs(docs: DataFrame) -> DataFrame:
    """MinHash -> LSH banding -> candidate pairs -> exact-Jaccard verify.

    Emits (doc_a, doc_b, jaccard) for verified near-duplicates. Candidates
    come from grouping (band, band-hash) into doc-list buckets and exploding
    i<j pairs inside each bucket — one pass over the signatures (a self-join
    would compute them once per side) and, with the df_cap bucket filter,
    per-bucket fanout bounded by C(df_cap, 2) even on degenerate corpora.
    At 100 TB this is a shuffle on band_hash, never an all-pairs product.
    """
    # Materialize the distinct hashed shingle rows ONCE: the signature
    # aggregate, the hot-shingle df pass, and both verify joins all read
    # this relation, and Catalyst's ReuseExchange can't share it (each
    # branch shuffles after a different map side). Recomputing means
    # tokenize+shingle+md5 over the corpus per branch — at 100 TB that's
    # three full scans; one executor-local materialization is the
    # canonical iterative/reused-branch pattern. MinHash over the
    # DISTINCT rows equals MinHash over the multiset (min is
    # set-invariant), so one relation serves both consumers exactly.
    hashed = cut_lineage(_hashed_rows(docs), eager=False)
    buckets = _lsh_buckets(docs, hashed)
    candidates = _explode_pairs_ids(buckets).distinct()
    return _verify_jaccard(docs, candidates, hashed=hashed)


def _lsh_buckets(docs: DataFrame, hashed: DataFrame) -> DataFrame:
    """Capped MinHash-LSH bucket relation (band, bh, ds, df_cap): the
    candidate source shared by ``minhash_lsh_pairs`` and the scale-curve
    observability hook ``lsh_candidate_stats``."""
    mixes = [
        F.min(F.expr(f"({a} * (s_h % {MERSENNE_P}) + {b}) % {MERSENNE_P}")).alias(f"mh{k}")
        for k, (a, b) in enumerate(_MIX)
    ]
    sigs = hashed.groupBy("doc_id").agg(*mixes)
    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), F.expr(_band_hash_spark(b)).alias("bh"))
            for b in range(N_BANDS)
        ]
    )
    exploded = sigs.select("doc_id", F.explode(bands).alias("e")).select(
        "doc_id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh")
    )
    # materialize once: the capped-bucket builder reads this relation
    # twice (hot-key count + collect), and recomputing it means rerunning
    # the k-hash minhash aggregation per pass (measured +60% on the
    # pipeline); docs x bands rows, same executor-local pattern as
    # ``hashed`` above
    exploded = cut_lineage(exploded, eager=False)
    return _capped_sorted_buckets(exploded, ["band", "bh"], "doc_id", _doc_cap(docs))


def lsh_candidate_stats(docs: DataFrame) -> DataFrame:
    """1-row observability frame over the capped LSH bucket relation:
    (n_buckets, n_candidates, max_bucket, df_cap). ``n_candidates`` is
    the pre-dedup per-bucket pair volume sum(C(|ds|, 2)) — the quantity
    the df-cap design bounds by ``n_buckets * C(df_cap, 2)`` and the
    scale-curve test pins to ≈linear growth on an N-times corpus of
    independent copies (tests/test_scale_curve.py; SCALE.md table)."""
    hashed = cut_lineage(_hashed_rows(docs), eager=False)
    buckets = _lsh_buckets(docs, hashed)
    stats = buckets.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.coalesce(
            F.sum(F.expr("size(ds) * (size(ds) - 1) / 2")).cast("long"), F.lit(0)
        ).alias("n_candidates"),
        F.coalesce(F.max(F.size("ds")), F.lit(0)).alias("max_bucket"),
    )
    # df_cap from the 1-row cap frame, not max over buckets: survives an
    # empty bucket relation with the true cap instead of null
    return stats.crossJoin(F.broadcast(_doc_cap(docs))).select(
        "n_buckets", "n_candidates", "max_bucket", "df_cap"
    )


def lsh_candidate_stats_oracle() -> str:
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, {_band_hash_duck(b)} AS bh FROM sigs"
        for b in range(N_BANDS)
    )
    sig_cols = ", ".join(f"{_mh_duck(k)} AS mh{k}" for k in range(N_HASHES))
    return f"""
        WITH {_SHINGLED_DUCK},
        sigs AS (SELECT doc_id, {sig_cols} FROM shingled),
        bands AS ({band_rows}),
        okb AS (
            SELECT band, bh, count(*) AS n FROM bands GROUP BY band, bh
            HAVING count(*) >= 2 AND count(*) <= {_DF_CAP_DUCK}
        )
        SELECT count(*) AS n_buckets,
               CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT) AS n_candidates,
               CAST(coalesce(max(n), 0) AS INT) AS max_bucket,
               {_DF_CAP_DUCK} AS df_cap
        FROM okb
    """


def q_lsh_candidate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_candidate_stats(load_table(spark, sf_dir, "documents"))


def _verify_jaccard(docs: DataFrame, candidates: DataFrame, hashed: DataFrame | None = None) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs, thresholded.

    Hot shingles (document frequency above df_cap) are excluded from
    intersection counting — same convention as ``ngram_jaccard_pairs`` —
    while denominators stay the full set sizes. Candidates are tiny
    relative to the corpus, so both intersection joins are candidate-driven
    (broadcast); the only full-corpus work is the one df aggregation.

    ``hashed``: optional pre-materialized distinct (doc_id, s_h) rows —
    callers that already computed them (minhash_lsh_pairs) pass them in
    so verify doesn't re-shingle the corpus.

    Set sizes come from a map-side-combinable groupBy(doc_id) aggregate
    joined onto the (small) intersection result, NOT a corpus-wide
    window (r17; guide §2.3 "aggregate before you shuffle"): the window
    form shuffled and sorted every (doc_id, s_h) row just to attach one
    int per doc — the aggregate shuffles one row per doc per mapper and
    the attach joins are candidate-pair-sized. Denominators are the FULL
    distinct set sizes (pre-hot-exclusion), exactly as before; same
    shape the streaming twin (streaming/neardup.py) already uses.
    """
    rows = _hashed_rows(docs) if hashed is None else hashed
    sizes = rows.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    hot = (
        rows.groupBy("s_h")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(_doc_cap(docs)))
        .filter(F.col("df") > F.col("df_cap"))
        .select("s_h")
    )
    exc = rows.join(F.broadcast(hot), "s_h", "left_anti")
    inter = (
        candidates.join(exc.alias("ea"), F.col("doc_a") == F.col("ea.doc_id"))
        .join(
            exc.alias("eb"),
            (F.col("doc_b") == F.col("eb.doc_id")) & (F.col("ea.s_h") == F.col("eb.s_h")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return _jaccard(inter.join(sa, "doc_a").join(sb, "doc_b"))


_DF_CAP_DUCK = (
    f"greatest(least(CAST(floor((SELECT count(*) FROM documents) * {HOT_SHINGLE_DF_FRAC})"
    f" AS BIGINT), {HOT_SHINGLE_DF_MAX}), {HOT_SHINGLE_DF_MIN})"
)

_EX_DUCK = (
    f"SELECT doc_id, len(sh) AS n_sh,"
    f" unnest(list_transform(sh, x -> {hash60_duck_sql('x')})) AS s_h FROM shingled"
)

JACCARD_RATIO_DUCK = round_half_up_sql(
    "n_inter / CAST(n_a + n_b - n_inter AS DOUBLE)", 6
)

_JACCARD_TAIL_DUCK = f"""
    SELECT doc_a, doc_b,
           {JACCARD_RATIO_DUCK} AS jaccard
    FROM inter
    WHERE {JACCARD_RATIO_DUCK} >= {JACCARD_THRESHOLD}
"""


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
        okb AS (
            SELECT band, bh FROM bands GROUP BY band, bh
            HAVING count(*) >= 2 AND count(*) <= {_DF_CAP_DUCK}
        ),
        candidates AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN okb ON a.band = okb.band AND a.bh = okb.bh
            JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        ),
        ex AS ({_EX_DUCK}),
        hot AS (SELECT s_h FROM ex GROUP BY s_h HAVING count(*) > {_DF_CAP_DUCK}),
        exc AS (SELECT ex.* FROM ex ANTI JOIN hot USING (s_h)),
        inter AS (
            SELECT doc_a, doc_b, count(*) AS n_inter,
                   any_value(ea.n_sh) AS n_a, any_value(eb.n_sh) AS n_b
            FROM candidates
            JOIN exc ea ON doc_a = ea.doc_id
            JOIN exc eb ON doc_b = eb.doc_id AND ea.s_h = eb.s_h
            GROUP BY doc_a, doc_b
        )
        {_JACCARD_TAIL_DUCK}
    """


def ngram_jaccard_pairs(docs: DataFrame) -> DataFrame:
    """Ground-truth near-dup pairs: candidates = any shared shingle.

    Shape: one shingling pass -> groupBy(shingle-hash) doc-list buckets ->
    df_cap filter (hot/boilerplate shingles carry no dedup signal and are
    the quadratic-fanout risk) -> explode i<j pairs per bucket -> count
    per pair (shingle sets are distinct, so the pair count == |A ∩ B|).
    Per-doc set sizes ride inside the bucket structs, so no sizes join.

    The shingle relation is materialized ONCE (r17): the capped-bucket
    builder reads it twice (hot-key count + anti-join collect), and
    recomputing it re-runs tokenize+shingle+md5 over the corpus per pass
    — the same lineage cut ``minhash_lsh_pairs`` carries (guide §2.4/§5:
    remove the duplicated full-corpus subtree instead of paying it).
    """
    ex = cut_lineage(_exploded_hashed(docs), eager=False)
    buckets = _capped_sorted_buckets(
        ex, ["s_h"], F.struct("doc_id", "n_sh"), _doc_cap(docs)
    )
    pairs = _explode_pairs_with_sizes(buckets)
    inter = pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_inter"),
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
    )
    return _jaccard(inter)


def ngram_jaccard_oracle() -> str:
    return f"""
        WITH {_SHINGLED_DUCK},
        ex AS ({_EX_DUCK}),
        ok AS (
            SELECT s_h FROM ex GROUP BY s_h
            HAVING count(*) >= 2 AND count(*) <= {_DF_CAP_DUCK}
        ),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter,
                   any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
            FROM ex a
            JOIN ok ON a.s_h = ok.s_h
            JOIN ex b ON a.s_h = b.s_h AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        {_JACCARD_TAIL_DUCK}
    """


def minhash_error_report(docs: DataFrame) -> DataFrame:
    """Sketch-accuracy report: MinHash-estimated vs exact Jaccard, bucketed
    by exact-similarity decile — the "measure, don't guess" dial for sizing
    the signature (N_HASHES) before trusting LSH at corpus scale.

    For every co-shingle candidate pair (the same capped-bucket pair
    pipeline as ``ngram_jaccard_pairs``, unthresholded), the estimate is
    (matching signature components) / N_HASHES and the truth is the exact
    shingle Jaccard; the report aggregates |error| per truth-decile.

    Plan: one shingling pass feeds both the pair pipeline and the signature
    aggregate; the pair table (post-cap, ≪ corpus²) joins the doc-keyed
    signature table twice — both joins keyed, nothing corpus-scale
    broadcast. Everything after the hash is exact int64 (ppm via integer
    div; per-decile mean as sum div count), so the report is bit-identical
    across engines — no float boundary anywhere.

    The hashed shingle relation is materialized ONCE (r17) and feeds the
    bucket builder's two passes AND the signature aggregate (previously
    ``minhash_signatures(docs)`` re-shingled the corpus a third time):
    min over the distinct shingle set equals min over the multiset, so
    the signatures are value-identical to the registered operator's.
    """
    ex = cut_lineage(_exploded_hashed(docs), eager=False)
    buckets = _capped_sorted_buckets(
        ex, ["s_h"], F.struct("doc_id", "n_sh"), _doc_cap(docs)
    )
    pairs = _explode_pairs_with_sizes(buckets)
    inter = pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_inter"),
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
    )
    mixes = [
        F.min(F.expr(f"({a} * (s_h % {MERSENNE_P}) + {b}) % {MERSENNE_P}")).alias(f"mh{k}")
        for k, (a, b) in enumerate(_MIX)
    ]
    sigs = ex.groupBy("doc_id").agg(*mixes)
    a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{k}").alias(f"a{k}") for k in range(N_HASHES)],
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{k}").alias(f"b{k}") for k in range(N_HASHES)],
    )
    matches = sum(
        F.when(F.col(f"a{k}") == F.col(f"b{k}"), 1).otherwise(0)
        for k in range(N_HASHES)
    )
    scored = (
        inter.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            F.expr("n_inter * 1000000 div (n_a + n_b - n_inter)").alias("exact_ppm"),
            (matches * F.lit(1000000)).cast("long").alias("est_num"),
        )
        .withColumn("est_ppm", F.expr(f"est_num div {N_HASHES}"))
        .withColumn("abs_err", F.abs(F.col("est_ppm") - F.col("exact_ppm")))
    )
    return scored.groupBy(
        F.expr("exact_ppm div 100000").alias("jaccard_decile")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("sum(abs_err) div count(*)").alias("mean_abs_err_ppm"),
        F.max("abs_err").alias("max_abs_err_ppm"),
    )


def minhash_error_report_oracle() -> str:
    sig_cols = ", ".join(f"{_mh_duck(k)} AS mh{k}" for k in range(N_HASHES))
    matches = " + ".join(
        f"(CASE WHEN a.mh{k} = b.mh{k} THEN 1 ELSE 0 END)" for k in range(N_HASHES)
    )
    return f"""
        WITH {_SHINGLED_DUCK},
        ex AS ({_EX_DUCK}),
        ok AS (
            SELECT s_h FROM ex GROUP BY s_h
            HAVING count(*) >= 2 AND count(*) <= {_DF_CAP_DUCK}
        ),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter,
                   any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
            FROM ex a
            JOIN ok ON a.s_h = ok.s_h
            JOIN ex b ON a.s_h = b.s_h AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        sigs AS (SELECT doc_id, {sig_cols} FROM shingled),
        scored AS (
            SELECT (n_inter * 1000000) // (n_a + n_b - n_inter) AS exact_ppm,
                   (({matches}) * 1000000) // {N_HASHES} AS est_ppm
            FROM inter
            JOIN sigs a ON doc_a = a.doc_id
            JOIN sigs b ON doc_b = b.doc_id
        )
        SELECT exact_ppm // 100000 AS jaccard_decile,
               count(*) AS n_pairs,
               CAST(CAST(sum(abs(est_ppm - exact_ppm)) AS BIGINT) // count(*)
                    AS BIGINT) AS mean_abs_err_ppm,
               max(abs(est_ppm - exact_ppm)) AS max_abs_err_ppm
        FROM scored
        GROUP BY jaccard_decile
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


def collapse_doc_identity(docs: DataFrame) -> DataFrame:
    """PK-identity pre-collapse for the REMEDIATION-family operators: one
    row per ``doc_id``, payload = ``min(text)`` (NULLs ignored by min in
    both engines; replayed verbatim copies collapse to themselves, and
    conflicting payloads get a deterministic lexicographic winner).

    The r14 dupkeys contract (sources/tables.py) keeps doc_id uniqueness
    an ingestion PRECONDITION for the general registry, but the operators
    whose JOB is cleaning foreign/dirty corpora — incremental_dedup, the
    winnow family, the decontaminate family — must be deterministic on
    exactly the input that violates it (r15 verdict #3: seed-1506 pinned
    incremental_dedup as a seed-dependent PK-identity-class member).
    On in-contract corpora the collapse is value-identity (unique keys
    make the groupBy a pass-through).

    Shape (r18, guide §2.3 "shuffle keys and metadata instead of
    payloads"): collapse ONLY the doc_ids that are actually duplicated.
    A doc_id-projected count aggregate finds the violating keys (a
    narrow, map-side-combined shuffle of ints — never text); rows with
    unique keys pass through a null-safe ANTI join against that
    (usually empty) set, and only the violating rows reach the
    ``min(text)`` aggregate. The previous single
    ``groupBy(doc_id).agg(min(text))`` shuffled the ENTIRE corpus text
    to collapse what is, in contract, nothing — the r16 correctness
    work's +1.0-1.4 s/query cost on the quiet pin. NULL-safe joins keep
    the one-group-per-NULL-doc_id semantics of the groupBy (two NULL
    doc_ids collapse to one row, exactly as before). Values are
    bit-identical on every corpus: unique keys pass through (min over a
    1-row group IS the row), duplicated keys aggregate exactly as the
    old formulation did; proven by the unchanged pk1 oracles on the
    --dupkeys sweep.

    Scale: the clean-corpus fast path is one corpus scan + a broadcast
    anti join on an empty set — the text payload never crosses the
    network. On a heavily violating corpus AQE falls back to keyed
    joins and the cost approaches the old full-shuffle form.
    """
    d = spread(docs).select("doc_id", "text")
    dup = (
        d.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .select(F.col("doc_id").alias("_dup_id"))
    )
    clean = d.join(dup, d["doc_id"].eqNullSafe(dup["_dup_id"]), "left_anti")
    collapsed = (
        d.join(dup, d["doc_id"].eqNullSafe(dup["_dup_id"]), "left_semi")
        .groupBy("doc_id")
        .agg(F.min("text").alias("text"))
    )
    return clean.unionByName(collapsed)


def pk1_oracle(sql: str) -> str:
    """Mirror of ``collapse_doc_identity`` for a composed DuckDB oracle:
    prepend a ``documents_pk1`` CTE (one row per doc_id, min(text)) and
    rewrite every ``FROM documents`` in the composed text to read it —
    including inside embedded sub-oracles and the ``_DF_CAP_DUCK`` corpus
    count, so the hot-shingle cap sees the same collapsed cardinality the
    Spark side's ``_doc_cap`` does. (DuckDB forbids a CTE from shadowing
    the table it reads, hence the distinct name.)

    Both the ``FROM documents`` and ``JOIN documents`` reference forms are
    rewritten, and a build-time assert rejects any OTHER surviving bare
    ``documents`` token (comma-join lists, quoted names) — r16 advice: a
    future wrapped oracle using a form this function missed would
    silently read the uncollapsed table and diverge from the Spark side's
    ``collapse_doc_identity``."""
    import re as _re

    assert "documents_pk1" not in sql
    body = _re.sub(r"\b(FROM|JOIN) documents\b", r"\1 documents_pk1", sql)
    leftover = _re.search(r"\bdocuments\b", body)
    if leftover is not None:
        ctx = body[max(0, leftover.start() - 40) : leftover.start() + 40]
        raise AssertionError(
            "pk1_oracle: unrewritten `documents` reference (use the "
            f"FROM/JOIN form): ...{ctx}..."
        )
    cte = (
        "documents_pk1 AS (SELECT doc_id, min(text) AS text"
        " FROM documents GROUP BY doc_id)"
    )
    idx = body.upper().find("WITH")
    if idx >= 0:
        if body[idx:].upper().startswith("WITH RECURSIVE"):
            # RECURSIVE must follow WITH immediately; a non-recursive CTE
            # is legal inside a WITH RECURSIVE list in DuckDB
            ins = idx + len("WITH RECURSIVE")
            return f"{body[:idx]}WITH RECURSIVE {cte},{body[ins:]}"
        return f"{body[:idx]}WITH {cte},{body[idx + 4:]}"
    return f"WITH {cte} {body}"


WINNOW_W = 4  # winnowing window: one fingerprint guaranteed per W shingles


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """Remediation-family entry: identity-collapsed ``doc_id`` (see
    ``collapse_doc_identity``), then the winnowing body."""
    return _winnow_fingerprints_body(collapse_doc_identity(docs))


def _winnow_fingerprints_body(docs: DataFrame) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003):
    hash every 3-gram shingle, slide a window of ``WINNOW_W`` consecutive
    hashes, and keep each window's minimum — a position-aware fingerprint
    set with guaranteed density, the standard local-similarity sketch.

    Selection: ``wmin`` = min hash per full backward window of W; a
    position is selected iff some window containing it attains its hash
    — equivalently ``max(wmin) over the following W frame == h`` (all
    wmin <= h, so the max reaches h exactly when one equals it). This
    "all minima" variant is deterministic with no tie-break rule; 60-bit
    hashes make in-window ties vanishingly rare anyway.

    Both passes run as SHUFFLE-FREE array transforms over the per-doc
    token array (r18, guide §2.4 — same conversion as
    ``_shingle_rows``): the hash sequence, the backward-window minima,
    and the forward-window selection all live inside one row, so the
    whole fingerprint build is a narrow map over the corpus scan. The
    previous posexplode + window form paid a corpus token-row
    shuffle + sort whenever the input wasn't already doc_id-partitioned.
    ``array_min``/``array_max`` skip NULL entries exactly as the window
    MIN/MAX did; positions with no full backward window carry a NULL
    wmin, and a NULL forward max selects nothing (``= h`` is NULL →
    filtered), matching the window form on short documents.
    """
    tok = (
        spread(docs)
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= 3)
    )
    h_of = hash60_spark_sql("concat_ws(' ', toks[i-1], toks[i], toks[i+1])")
    hs = tok.select(
        "doc_id",
        F.expr(f"transform(sequence(1, size(toks) - 2), i -> {h_of})").alias("hs"),
    )
    wm = hs.select(
        "doc_id",
        "hs",
        F.expr(
            f"transform(sequence(1, size(hs)), p -> CASE WHEN p >= {WINNOW_W} "
            f"THEN array_min(slice(hs, p - {WINNOW_W - 1}, {WINNOW_W})) END)"
        ).alias("wm"),
    )
    sel = F.expr(
        "filter(transform(sequence(1, size(hs)), p -> "
        "struct(p - 1 AS pos, element_at(hs, p) AS fp_hash, "
        f"array_max(slice(wm, p, {WINNOW_W})) = element_at(hs, p) AS sel)), "
        "x -> x.sel)"
    )
    return wm.select("doc_id", F.explode(sel).alias("f")).select(
        "doc_id", F.col("f.pos").alias("pos"), F.col("f.fp_hash").alias("fp_hash")
    )


def winnow_fingerprints_oracle() -> str:
    return pk1_oracle(_winnow_fingerprints_oracle_raw())


def _winnow_fingerprints_oracle_raw() -> str:
    return f"""
        WITH tok AS (
            SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
            WHERE len({TOKENS_DUCK}) >= 3
        ),
        pos AS (
            SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
                   toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
            FROM tok, unnest(generate_series(1, len(toks) - 2)) AS t(i)
        ),
        hashed AS (SELECT doc_id, pos, {hash60_duck_sql('s')} AS h FROM pos),
        wm AS (
            SELECT doc_id, pos, h,
                   CASE WHEN count(*) OVER back = {WINNOW_W}
                        THEN min(h) OVER back END AS wmin
            FROM hashed
            WINDOW back AS (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW)
        )
        SELECT doc_id, pos, h AS fp_hash
        FROM (
            SELECT doc_id, pos, h,
                   max(wmin) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS fmax
            FROM wm
        )
        WHERE fmax = h
    """


WINNOW_MIN_SHARED = 3  # pairs must share at least this many fingerprints


def winnow_match_pairs(docs: DataFrame, fps: DataFrame | None = None) -> DataFrame:
    """Local-similarity pairs from shared winnowing fingerprints — the
    match stage of the plagiarism-detection pipeline the fingerprints
    exist for. Same capped bucket-explosion shape as the other pair
    generators, but over the winnowed set (a ~2/W fraction of all
    shingles), so candidate volume is structurally smaller than
    ``ngram_jaccard_pairs`` for the same corpus.

    ``fps``: optional pre-computed ``winnow_fingerprints`` relation, so a
    caller that also needs the fingerprints (match spans) shares one
    materialization instead of re-tokenizing the corpus (such a caller
    must pass fingerprints built over the identity-collapsed corpus).

    Remediation-family entry: the corpus is identity-collapsed (see
    ``collapse_doc_identity``) before the cap aggregate and fingerprint
    build, so results are deterministic on PK-violating input."""
    # collapsed corpus materialized once (r17): it feeds the
    # fingerprint build AND the pair stage's cap aggregate, and the
    # fingerprint checkpoint boundary breaks exchange reuse between them
    docs = cut_lineage(collapse_doc_identity(docs), eager=False)
    if fps is None:
        # materialize once: the capped-bucket builder reads the
        # fingerprint relation TWICE (hot-key count + anti-join collect),
        # and the fingerprint pipeline now carries the identity collapse —
        # recomputing it per pass doubled the operator's cost (the one
        # hard flag on the r16 quiet bench). Same pattern as
        # _lsh_buckets' exploded-bands cut.
        fps = cut_lineage(_winnow_fingerprints_body(docs), eager=False)
    return _winnow_match_pairs_body(docs, fps)


def _winnow_match_pairs_body(docs: DataFrame, fps: DataFrame) -> DataFrame:
    fps = fps.select("doc_id", "fp_hash").distinct()
    buckets = _capped_sorted_buckets(fps, ["fp_hash"], "doc_id", _doc_cap(docs))
    pairs = _explode_pairs_ids(buckets)
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= WINNOW_MIN_SHARED)
    )


def winnow_match_pairs_oracle() -> str:
    return pk1_oracle(_winnow_match_pairs_oracle_raw())


def _winnow_match_pairs_oracle_raw() -> str:
    return f"""
        WITH fp_rows AS ({_winnow_fingerprints_oracle_raw()}),
        fps AS (SELECT DISTINCT doc_id, fp_hash FROM fp_rows),
        ok AS (
            SELECT fp_hash FROM fps GROUP BY fp_hash
            HAVING count(*) >= 2 AND count(*) <= {_DF_CAP_DUCK}
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_fps
        FROM fps a
        JOIN ok ON a.fp_hash = ok.fp_hash
        JOIN fps b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= {WINNOW_MIN_SHARED}
    """


def dedup_clusters(
    docs: DataFrame, max_iters: int = 20, edges: DataFrame | None = None
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the verified
    LSH pair graph, labeled by the component's minimum doc_id (the keeper
    a dedup pipeline would retain).

    Iterative label propagation WITH pointer jumping: every node starts
    as its own label; each round takes the min over itself and its
    neighbors' labels, then shortcuts label -> label(label) (labels are
    themselves node ids, so the current label table doubles as the
    lookup). The shortcut doubles the propagation horizon per round, so
    the fixpoint arrives in O(log diameter) rounds — a 20-round budget
    covers ~2^20-hop chains, where plain propagation covers 20. This is
    the documented iterative-algorithm pattern — a driver loop over
    DataFrame steps with a convergence check per round (the only
    driver-side values are the changed-row COUNT, never data). The edge
    set is the post-LSH dup graph, typically orders of magnitude smaller
    than the corpus; at 100 TB each round is three shuffle joins over
    edges/labels. Raises if the budget is exhausted before convergence
    (silent divergence from the closure was round 2 advice). Oracle:
    DuckDB recursive CTE computing the same min-label closure.

    ``edges`` lets a caller that ALREADY materialized the verified pair
    table (``dedup_pipeline_report``) reuse it instead of re-running the
    LSH pipeline — such a caller chooses its own identity posture.

    Remediation-family entry (r16): on the edges=None path the corpus is
    identity-collapsed first (``collapse_doc_identity``) — the contract
    names the cluster/keep tier as the remediation path for PK-violating
    corpora, so it must be deterministic on exactly that input.
    """
    if edges is None:
        # collapsed corpus materialized once (r18): minhash_lsh_pairs
        # reads its input twice (hashed-shingle pipeline + _doc_cap), and
        # the duplicate-only collapse split would otherwise re-plan its
        # three scans into each reader — the same cut dedup_keep_best /
        # winnow_match_pairs already carry for the same reason
        edges = minhash_lsh_pairs(
            cut_lineage(collapse_doc_identity(docs), eager=False)
        ).select("doc_a", "doc_b")
    # undirected adjacency, deduplicated once up front. Built by exploding
    # each edge into both directions in ONE pass (r17) — the previous
    # union-of-two-selects scanned the edge relation twice, and on the
    # edges=None path that relation is the whole LSH pipeline (guide §2.4:
    # duplicated subtrees). (A repartition-before-checkpoint to pre-key
    # the loop joins was tried and reverted: LogicalRDD from
    # localCheckpoint reports UnknownPartitioning under AQE, so the
    # downstream exchanges reappear regardless — measured, not assumed.)
    both_dirs = F.array(
        F.struct(F.col("doc_a"), F.col("doc_b")),
        F.struct(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")),
    )
    adj = (
        edges.select(F.explode(both_dirs).alias("e"))
        .select("e.doc_a", "e.doc_b")
        .distinct()
    )
    adj = cut_lineage(adj, eager=True)  # cut lineage: edges are reused every round
    # seed = least(self, min neighbor): the first propagation half-round
    # folded into the node-list aggregation (adj is symmetric, so every
    # node appears as doc_a) — one fewer loop round than identity seeding
    labels = cut_lineage(
        adj.groupBy(F.col("doc_a").alias("doc_id"))
        .agg(F.min("doc_b").alias("mn"))
        .select("doc_id", F.least("doc_id", "mn").alias("label")),
        eager=True,
    )
    converged = False
    for _ in range(max_iters):
        neighbor_min = (
            adj.join(labels, adj.doc_b == labels.doc_id)
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = cut_lineage(
            # materialized once per round (r17): stepped feeds BOTH sides
            # of the pointer-jump join below, and uncut its subtree (the
            # adj ⋈ labels aggregate) re-computed per side — measured
            # 8.9 -> 6.7 s on the full clusters query at sf0.1
            labels.join(neighbor_min, "doc_id", "left").select(
                "doc_id",
                F.col("label").alias("old_label"),
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            ),
            eager=False,
        )
        # pointer jump: label <- label(label); every label IS a node id,
        # so `stepped` itself is the label map (left join: a label always
        # resolves, coalesce is belt-and-braces)
        lmap = stepped.select(
            F.col("doc_id").alias("label"), F.col("label").alias("jump")
        )
        new_labels = (
            # fixpoint loop: keep plans constant-size
            cut_lineage(
                stepped.join(lmap, "label", "left").select(
                    "doc_id",
                    "old_label",
                    F.least("label", F.coalesce("jump", "label")).alias("label"),
                ),
                eager=True,
            )
        )
        # the old label rides through the checkpoint, so the convergence
        # count scans the just-materialized partitions — no extra join
        changed = new_labels.filter(F.col("label") != F.col("old_label")).count()
        labels = new_labels.select("doc_id", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dedup_clusters did not converge within {max_iters} rounds; "
            "raise max_iters (pointer jumping needs O(log diameter) rounds)"
        )
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    # No broadcast hint: cluster count is corpus-scale in the worst case
    # (all-singleton corpus => one label per doc), so the sizes aggregate
    # is unbounded. The join is already keyed on `label`; let the planner
    # pick (AQE will still broadcast when sizes turns out tiny).
    return (
        labels.join(sizes, "label")
        .select(F.col("label").alias("cluster_id"), "doc_id", "cluster_size")
    )


def dedup_clusters_oracle() -> str:
    return pk1_oracle(_dedup_clusters_oracle_raw())


def _dedup_clusters_oracle_raw() -> str:
    return f"""
        WITH RECURSIVE pairs AS ({minhash_lsh_pairs_oracle()}),
        edges AS (
            SELECT doc_a, doc_b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT doc_a AS doc_id FROM edges),
        walk (doc_id, r) AS (
            SELECT doc_id, doc_id FROM nodes
            UNION
            SELECT w.doc_id, e.doc_b FROM walk w JOIN edges e ON w.r = e.doc_a
        ),
        labeled AS (SELECT doc_id, min(r) AS cluster_id FROM walk GROUP BY doc_id)
        SELECT cluster_id, doc_id,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        FROM labeled
    """


def winnow_match_spans(docs: DataFrame) -> DataFrame:
    """Position-level alignment for winnowing matches — the final stage
    of the plagiarism pipeline: for every matched pair (shared-
    fingerprint count >= threshold), emit the aligned positions of each
    shared fingerprint hash, i.e. WHERE the overlap is, not just that it
    exists. Candidate pairs come from ``winnow_match_pairs`` (already
    capped/bucketed); the fingerprint relation is then left-semi-pruned
    to the matched docs BEFORE the alignment joins, so the span shuffle
    carries only matched docs' fingerprints (bounded by the pair cap),
    never the corpus-scale fingerprint table. No broadcast hints: the
    full fp relation is ~k rows per document (corpus-sized at 100 TB ⇒
    hinting it is a driver OOM), and the pruned side's size is runtime-
    dependent — AQE picks the build side from actual stats. Fanout is
    bounded by shared fps per pair (ties on a hash inside one doc
    explode, which is the correct alignment semantics and vanishingly
    rare with 60-bit hashes).

    The fingerprint relation is consumed three times (pair generation +
    both alignment sides) and its pre-shuffle map work differs per
    branch, so it's materialized once (same reasoning as
    minhash_lsh_pairs' hashed-shingle checkpoint).

    Remediation-family entry: the corpus is identity-collapsed ONCE here
    (see ``collapse_doc_identity``) and the collapsed frame feeds both
    the fingerprint build and the pair stage's cap aggregate."""
    # collapsed corpus materialized once (r17) — same reasoning as
    # winnow_match_pairs: two consumers across a checkpoint boundary
    docs = cut_lineage(collapse_doc_identity(docs), eager=False)
    fps = cut_lineage(_winnow_fingerprints_body(docs), eager=False)
    # The pair relation is read three times below (both member-prune
    # sides + the alignment join anchor); materialize it once (r17) —
    # previously each read re-ran the whole pair stage over fps
    # (guide §2.4 duplicated subtrees). Members come from ONE explode
    # pass instead of a union of two scans for the same reason.
    pairs = cut_lineage(
        _winnow_match_pairs_body(docs, fps).select("doc_a", "doc_b"), eager=False
    )
    # same member-prune pattern as streaming/neardup.py's verify stage
    members = (
        pairs.select(F.explode(F.array("doc_a", "doc_b")).alias("doc_id"))
        .distinct()
    )
    fps_matched = fps.join(members, "doc_id", "left_semi")
    return (
        pairs.join(
            fps_matched.select(F.col("doc_id").alias("doc_a"),
                               F.col("pos").alias("pos_a"), "fp_hash"),
            "doc_a",
        )
        .join(
            fps_matched.select(F.col("doc_id").alias("doc_b"),
                               F.col("pos").alias("pos_b"), "fp_hash"),
            ["doc_b", "fp_hash"],
        )
        .select("doc_a", "doc_b", "fp_hash", "pos_a", "pos_b")
    )


def winnow_match_spans_oracle() -> str:
    return pk1_oracle(f"""
        WITH fp_rows AS ({_winnow_fingerprints_oracle_raw()}),
        match_pairs AS ({_winnow_match_pairs_oracle_raw()})
        SELECT p.doc_a, p.doc_b, a.fp_hash, a.pos AS pos_a, b.pos AS pos_b
        FROM match_pairs p
        JOIN fp_rows a ON a.doc_id = p.doc_a
        JOIN fp_rows b ON b.doc_id = p.doc_b AND b.fp_hash = a.fp_hash
    """)


def q_winnow_match_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_match_spans(load_table(spark, sf_dir, "documents"))


# exact-span detection knobs: 5-token grams target verbatim repeats (vs
# the 3-gram similarity shingles); grams shared by more than SPAN_DF_CAP
# docs are boilerplate (headers, licenses) — the scrub operator's domain,
# not span alignment's — and excluding them bounds the self-join fanout;
# spans shorter than MIN_SPAN_TOKENS are noise at 60-bit hash collision
# rates.
K_SPAN = 5
SPAN_DF_CAP = 16
MIN_SPAN_TOKENS = 8


def repeated_span_report(docs: DataFrame) -> DataFrame:
    """EXACT verbatim-span detection across documents (the exact-substring
    complement of ``winnow_match_spans``' sampled fingerprints — the
    Lee et al. 2022 'Deduplicating Training Data' failure mode where
    near-dup sketches miss long copied passages inside otherwise
    different documents): every maximal run of consecutive shared
    5-token grams between a doc pair, as (doc_a, doc_b, start_a,
    start_b, span_tokens) rows with span_tokens >= MIN_SPAN_TOKENS.

    Shape: hash every 5-gram with its position; keep grams whose
    document frequency is in [2, SPAN_DF_CAP] (cap excludes boilerplate
    AND bounds the self-join fanout per gram); self-join on the gram
    hash to get position-aligned matches; merge consecutive matches with
    the gaps-and-islands idiom — matches of one contiguous copied
    passage share a diagonal (pos_a - pos_b), so
    ``pos_a - row_number() over (pair, diagonal order by pos_a)`` is
    constant exactly along a run.

    Scale: the positioned-gram relation is materialized ONCE (it feeds
    the DF aggregate and both self-join sides; without the cut the
    tokenize+window pipeline runs three times — the same reasoning as
    minhash_lsh_pairs' hashed-shingle checkpoint); the DF filter prunes
    BEFORE the self-join (one aggregate on the gram hash — the same key
    the join shuffles on, so AQE reuses the partitioning); per-gram
    fanout is <= C(SPAN_DF_CAP, 2); the island window partitions by
    (pair, diagonal) — pair-graph-sized, never corpus-wide.
    """
    tok = (
        spread(docs)
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= K_SPAN)
    )
    # positioned grams as a shuffle-free array transform (r18, guide
    # §2.4 — same conversion as _shingle_rows; the old posexplode +
    # K_SPAN-1 lead() windows paid a corpus token-row shuffle + sort)
    gram_str = "concat_ws(' ', " + ", ".join(
        f"toks[i+{j}-1]" for j in range(K_SPAN)
    ) + ")"
    g_expr = (
        f"transform(sequence(1, size(toks) - {K_SPAN - 1}), "
        f"i -> struct(i - 1 AS pos, {gram_str} AS s))"
    )
    grams = tok.select("doc_id", F.explode(F.expr(g_expr)).alias("g")).select(
        "doc_id",
        F.col("g.pos").alias("pos"),
        F.expr(hash60_spark_sql("g.s")).alias("h"),
    )
    grams = cut_lineage(grams, eager=False)
    shared = (
        grams.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= SPAN_DF_CAP))
        .select("h")
    )
    g = grams.join(shared, "h")
    matches = (
        g.alias("a")
        .join(g.alias("b"), "h")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.pos").alias("pos_a"),
            F.col("b.pos").alias("pos_b"),
        )
        .distinct()
    )
    diag = (F.col("pos_a") - F.col("pos_b")).alias("diag")
    iw = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    islands = matches.select("doc_a", "doc_b", "pos_a", "pos_b", diag).withColumn(
        "g", F.col("pos_a") - F.row_number().over(iw)
    )
    return (
        islands.groupBy("doc_a", "doc_b", "diag", "g")
        .agg(
            F.min("pos_a").alias("start_a"),
            F.min("pos_b").alias("start_b"),
            (F.count(F.lit(1)) + F.lit(K_SPAN - 1)).alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= MIN_SPAN_TOKENS)
        .select("doc_a", "doc_b", "start_a", "start_b", "span_tokens")
    )


def repeated_span_report_oracle() -> str:
    gram = f"array_to_string(toks[i:i+{K_SPAN - 1}], ' ')"
    return f"""
        WITH tok AS (
            SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
            WHERE len({TOKENS_DUCK}) >= {K_SPAN}
        ),
        grams AS (
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                   {hash60_duck_sql(gram)} AS h
            FROM tok, unnest(generate_series(1, len(toks) - {K_SPAN - 1})) AS t(i)
        ),
        shared AS (
            SELECT h FROM grams GROUP BY h
            HAVING count(DISTINCT doc_id) BETWEEN 2 AND {SPAN_DF_CAP}
        ),
        matches AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                            a.pos AS pos_a, b.pos AS pos_b
            FROM grams a JOIN shared USING (h)
            JOIN grams b ON a.h = b.h AND a.doc_id < b.doc_id
        ),
        islands AS (
            SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
                   pos_a - row_number() OVER (
                       PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a
                   ) AS g
            FROM matches
        )
        SELECT doc_a, doc_b, min(pos_a) AS start_a, min(pos_b) AS start_b,
               count(*) + {K_SPAN - 1} AS span_tokens
        FROM islands
        GROUP BY doc_a, doc_b, diag, g
        HAVING count(*) + {K_SPAN - 1} >= {MIN_SPAN_TOKENS}
    """


def q_repeated_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repeated_span_report(load_table(spark, sf_dir, "documents"))


INCOMING_MOD = 10  # doc_id % 10 == 0 plays the "incoming batch" role


def incremental_dedup(docs: DataFrame) -> DataFrame:
    """Incremental near-dup detection: which INCOMING documents duplicate
    something that already arrived? With doc_id as arrival order, the
    incoming batch is ``doc_id % INCOMING_MOD == 0`` and a new doc is a
    dup if any LSH-verified partner has a smaller doc_id (corpus doc OR
    earlier incoming doc — the order-sensitive semantics a streaming
    ingest pipeline needs). Output: one row per duplicated incoming doc
    with its earliest match (the keeper) and the match count.

    Reuses the capped banded-LSH pair pipeline; pairs are already
    emitted as (doc_a < doc_b), so the keeper is min(doc_a) per new doc.
    In production the incoming batch's signatures join against the
    STORED corpus signature table (KeyedParquetStore / Delta) instead of
    recomputing them — the join and verify stages are identical.

    Remediation-family entry: the corpus is identity-collapsed first
    (``collapse_doc_identity``) — an incremental ingest dedup runs on
    exactly the replayed/conflicting-doc_id input the r14 PK contract
    names, so it must not itself read doc_id as row identity (r15
    verdict #3; seed-1506 isolation pinned the divergence).
    """
    # collapsed frame materialized once (r18, superseding the r16
    # no-cut adjudication): that adjudication relied on _doc_cap
    # column-pruning straight through the old single-aggregate collapse;
    # the r18 duplicate-only split re-plans THREE scans per reader (r18
    # scan audit read 12 document scans here, 3 -> 12), so one lazy cut
    # is now strictly cheaper — the same cut every other
    # minhash_lsh_pairs caller carries
    pairs = minhash_lsh_pairs(cut_lineage(collapse_doc_identity(docs), eager=False))
    return (
        pairs.filter(F.pmod(F.col("doc_b"), F.lit(INCOMING_MOD)) == 0)
        .groupBy(F.col("doc_b").alias("new_doc_id"))
        .agg(
            F.min("doc_a").alias("dup_of"),
            F.count(F.lit(1)).alias("n_matches"),
            F.round(F.max("jaccard"), 6).alias("best_jaccard"),
        )
    )


def incremental_dedup_oracle() -> str:
    return pk1_oracle(f"""
        WITH pairs AS ({minhash_lsh_pairs_oracle()})
        SELECT doc_b AS new_doc_id,
               min(doc_a) AS dup_of,
               count(*) AS n_matches,
               round(max(jaccard), 6) AS best_jaccard
        FROM pairs
        WHERE doc_b % {INCOMING_MOD} = 0
        GROUP BY doc_b
    """)


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return incremental_dedup(load_table(spark, sf_dir, "documents"))


def decontaminate(docs: DataFrame) -> DataFrame:
    """Train/test contamination audit (the benchmark-decontamination pass
    of a pretraining pipeline): for every *test*-split document, how many
    of its distinct 3-gram shingles also occur in ANY *train*-split
    document. Emits (doc_id, n_shingles, n_contaminated,
    contamination_ppm); a pipeline drops or flags test docs above a ppm
    threshold before eval-set construction.

    The split is the same pure doc_id hash as ``textops.dataset_split``,
    recomputed as a column expression on the shingle rows — no join
    against a split table. Single-pass shape: shingle + hash ONCE (the
    md5/shingling scan is the dominant cost at corpus scale), then one
    shuffle on the 60-bit s_h where a partition window computes "seen in
    train" per shingle — instead of a train-dictionary self-join, which
    would re-scan and re-shingle the corpus for the build side. Val rows
    are dropped before the shuffle (neither probed nor probed-against).
    Cost is linear in corpus shingles, never pairwise in documents; at
    100 TB the alternative is a Bloom filter built over train shingles
    and broadcast to the probe side (ppm becomes a tight upper bound).
    Contamination is exact integer ppm (int64 ``div``) — no
    float-rounding boundary between engines.

    Remediation-family entry: identity-collapsed input
    (``collapse_doc_identity``) — decontamination runs on foreign/dirty
    corpora by definition, so it must be deterministic under the
    PK-violation shapes it helps clean (r15 verdict #3).
    """
    rows = (
        _hashed_rows(collapse_doc_identity(docs))
        .withColumn("split", F.expr(split_spark_sql()))
        .filter(F.col("split") != "val")
    )
    in_train = F.max((F.col("split") == "train").cast("int")).over(
        Window.partitionBy("s_h")
    )
    return (
        rows.withColumn("in_train", in_train)
        .filter(F.col("split") == "test")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("in_train").alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            F.expr("n_contaminated * 1000000 div n_shingles").alias(
                "contamination_ppm"
            ),
        )
    )


def decontaminate_oracle() -> str:
    return pk1_oracle(_decontaminate_oracle_raw())


def _decontaminate_oracle_raw() -> str:
    return f"""
        WITH {_SHINGLED_DUCK},
        ex AS (
            SELECT doc_id, unnest(list_transform(sh, x -> {hash60_duck_sql('x')})) AS s_h
            FROM shingled
        ),
        tagged AS (SELECT doc_id, s_h, {split_duck_sql()} AS split FROM ex),
        train_sh AS (SELECT DISTINCT s_h FROM tagged WHERE split = 'train'),
        agg AS (
            SELECT t.doc_id,
                   count(*) AS n_shingles,
                   count(tr.s_h) AS n_contaminated
            FROM (SELECT doc_id, s_h FROM tagged WHERE split = 'test') t
            LEFT JOIN train_sh tr ON t.s_h = tr.s_h
            GROUP BY t.doc_id
        )
        SELECT doc_id, n_shingles, n_contaminated,
               (n_contaminated * 1000000) // n_shingles AS contamination_ppm
        FROM agg
    """


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontaminate(load_table(spark, sf_dir, "documents"))


BLOOM_M = 1 << 22  # filter bits; ~0.1% FP at fixture scale, dial per corpus
BLOOM_K = 3        # hash functions, drawn from the shared _MIX constants


def _bloom_pos_sql(j: int) -> str:
    """Bit position j for a 60-bit shingle hash ``s_h`` — the same affine
    mix family as the MinHash signatures, reduced mod the filter size.
    Integer-exact in both engines (same bound argument as _mh_expr)."""
    a, b = _MIX[j]
    return f"(({a} * (s_h % {MERSENNE_P}) + {b}) % {MERSENNE_P}) % {BLOOM_M}"


def decontaminate_bloom(docs: DataFrame) -> DataFrame:
    """The 100 TB decontamination path ``decontaminate`` documents: probe
    test-split shingles against a BLOOM FILTER of train-split shingles
    instead of shuffling the whole corpus on the shingle hash. A shingle
    counts as contaminated iff ALL ``BLOOM_K`` of its bit positions are
    set by some train shingle — real Bloom semantics, so the ppm is an
    upper bound on the exact pass (no false negatives; FP rate set by
    M/K; a test pins the bound against ``decontaminate``).

    The filter's K hash functions are deterministic integer mixes, so
    even the false-positive behavior is engine-exact and this query is
    HASH-oracle-checked — the approximate operator is verified as
    tightly as the exact one. Plan shape: the set-bit relation (distinct
    positions, <= M rows of ints) is what a deployment broadcasts as the
    literal bitmap with an Arrow-vectorized probe; here the probe is the
    equivalent equi-join on position, keeping one engine-portable
    formulation for both sides of the comparison. Train bits are built
    in one aggregation over train shingles; the corpus-wide s_h shuffle
    of the exact pass is gone.
    """
    # one shingling pass feeds build + probe; identity-collapsed input
    # (remediation family — see collapse_doc_identity)
    rows = cut_lineage(
        _hashed_rows(collapse_doc_identity(docs))
        .withColumn("split", F.expr(split_spark_sql()))
        .filter(F.col("split") != "val"),
        eager=False,
    )
    train_bits = (
        rows.filter(F.col("split") == "train")
        .select(
            F.explode(
                F.array(*[F.expr(_bloom_pos_sql(j)) for j in range(BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
    )
    test = rows.filter(F.col("split") == "test")
    probes = test.select(
        "doc_id",
        "s_h",
        F.explode(
            F.array(*[F.expr(_bloom_pos_sql(j)) for j in range(BLOOM_K)])
        ).alias("pos"),
    )
    hits = (
        probes.join(train_bits, "pos")
        .groupBy("doc_id", "s_h")
        .agg(F.count(F.lit(1)).alias("k_hits"))
        .filter(F.col("k_hits") == BLOOM_K)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    per_doc = test.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        per_doc.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.expr(
                "coalesce(n_contaminated, 0) * 1000000 div n_shingles"
            ).alias("contamination_ppm"),
        )
    )


def decontaminate_bloom_oracle() -> str:
    pos_list = ", ".join(_bloom_pos_sql(j) for j in range(BLOOM_K))
    return pk1_oracle(f"""
        WITH {_SHINGLED_DUCK},
        ex AS (
            SELECT doc_id, unnest(list_transform(sh, x -> {hash60_duck_sql('x')})) AS s_h
            FROM shingled
        ),
        tagged AS (SELECT doc_id, s_h, {split_duck_sql()} AS split FROM ex),
        train_bits AS (
            SELECT DISTINCT unnest([{pos_list}]) AS pos
            FROM tagged WHERE split = 'train'
        ),
        probes AS (
            SELECT doc_id, s_h, unnest([{pos_list}]) AS pos
            FROM tagged WHERE split = 'test'
        ),
        hits AS (
            SELECT doc_id, count(*) AS n_contaminated FROM (
                SELECT p.doc_id, p.s_h
                FROM probes p JOIN train_bits USING (pos)
                GROUP BY p.doc_id, p.s_h
                HAVING count(*) = {BLOOM_K}
            ) GROUP BY doc_id
        ),
        per_doc AS (
            SELECT doc_id, count(*) AS n_shingles FROM tagged
            WHERE split = 'test' GROUP BY doc_id
        )
        SELECT d.doc_id, d.n_shingles,
               coalesce(h.n_contaminated, 0) AS n_contaminated,
               (coalesce(h.n_contaminated, 0) * 1000000) // d.n_shingles
                   AS contamination_ppm
        FROM per_doc d LEFT JOIN hits h USING (doc_id)
    """)


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontaminate_bloom(load_table(spark, sf_dir, "documents"))


def decontaminate_bloom_bitmap(docs: DataFrame) -> DataFrame:
    """``decontaminate_bloom`` with the PRODUCTION broadcast mechanics:
    the filter is a literal ``BLOOM_M``-bit numpy bitmap (512 KiB at the
    default M), built by an Arrow per-partition reduction and broadcast
    to an Arrow-vectorized probe — no position join at probe time.

    Build: ``mapInPandas`` ORs each partition's set bits into one local
    bitmap and emits it as a single binary row; the driver ORs the
    per-partition bitmaps (bounded by partition count x M/8 bytes — the
    standard mergeable-sketch collect, same class as HLL/quantile
    sketches) and broadcasts the result. Probe: a pandas UDF computes
    the K positions per shingle hash in vectorized int64 numpy and tests
    the bits. Bit-for-bit the same filter as ``decontaminate_bloom``
    (same mixes, same M), so it registers under the SAME DuckDB oracle —
    the UDF path is hash-verified, not just smoke-tested. A test also
    pins equality against the join formulation row-for-row.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = docs.sparkSession
    # identity-collapsed input (remediation family — see
    # collapse_doc_identity); bit-for-bit twin of decontaminate_bloom
    rows = cut_lineage(
        _hashed_rows(collapse_doc_identity(docs))
        .withColumn("split", F.expr(split_spark_sql()))
        .filter(F.col("split") != "val"),
        eager=False,
    )
    train_pos = rows.filter(F.col("split") == "train").select(
        F.explode(
            F.array(*[F.expr(_bloom_pos_sql(j)) for j in range(BLOOM_K)])
        ).alias("pos")
    )

    def build(batches):
        bm = np.zeros(BLOOM_M // 8, dtype=np.uint8)
        for pdf in batches:
            pos = pdf["pos"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = train_pos.mapInPandas(build, "bm binary").collect()
    bitmap = np.zeros(BLOOM_M // 8, dtype=np.uint8)
    for r in parts:
        bitmap |= np.frombuffer(r["bm"], dtype=np.uint8)
    bc = spark.sparkContext.broadcast(bitmap.tobytes())
    mixes = [(a, b) for a, b in _MIX[:BLOOM_K]]

    def _bloom_hit(s_h):
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        s = s_h.to_numpy(dtype=np.int64) % MERSENNE_P
        hit = np.ones(len(s), dtype=bool)
        for a, b in mixes:
            pos = ((a * s + b) % MERSENNE_P) % BLOOM_M
            hit &= (bm[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return pd.Series(hit.astype(np.int32))

    # module uses `from __future__ import annotations` (string hints),
    # which pandas_udf can't introspect — attach real ones
    _bloom_hit.__annotations__ = {"s_h": pd.Series, "return": pd.Series}
    bloom_hit = pandas_udf(_bloom_hit, "int")

    test = rows.filter(F.col("split") == "test")
    return (
        test.withColumn("hit", bloom_hit(F.col("s_h")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("hit").alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            F.expr("n_contaminated * 1000000 div n_shingles").alias(
                "contamination_ppm"
            ),
        )
    )


def q_decontaminate_bloom_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontaminate_bloom_bitmap(load_table(spark, sf_dir, "documents"))


def streaming_exact_dedup(events: DataFrame) -> DataFrame:
    """Batch twin of streaming dedup on the natural event key (streaming
    variant: dropDuplicatesWithinWatermark, tested in tests/).

    The kept row is DETERMINISTIC: min by (ts, user_id, event_type), not
    Spark's arbitrary dropDuplicates survivor — an arbitrary survivor only
    hash-matches an (equally arbitrary) DISTINCT ON oracle while duplicate
    rows happen to carry identical payloads.

    NULL tiebreak fields order NULLS-LAST EXPLICITLY (the boolean
    is-null flag ahead of the value in the key): this operator is the
    PK contract's own remediation path, so it must stay deterministic
    precisely on violating input — and the r14 five-axis composed sweep
    caught the bare struct key splitting the engines there (a conflict
    pair equal on (ts, user_id) with one NULL event_type: Spark struct
    ordering is NULLS FIRST, DuckDB ORDER BY is NULLS LAST). ts and
    event_id are non-null by the ingestion contract; event_type is the
    one nullable key field.
    """
    tiebreak = F.struct(
        "ts",
        "user_id",
        F.col("event_type").isNull().alias("et_null"),  # false < true
        "event_type",
    )
    keep = F.min_by(F.struct("user_id", "event_type"), tiebreak)
    return (
        events.groupBy("event_id")
        .agg(keep.alias("k"))
        .select("event_id", F.col("k.user_id").alias("user_id"), F.col("k.event_type").alias("event_type"))
    )


STREAMING_EXACT_DEDUP_ORACLE = """
    SELECT DISTINCT ON (event_id) event_id, user_id, event_type
    FROM events
    ORDER BY event_id, ts, user_id,
             (event_type IS NULL) ASC, event_type ASC NULLS LAST
"""


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"))


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(load_table(spark, sf_dir, "documents"))


CONTAIN_PPM = 600_000  # report pairs where either containment >= 0.6


def containment_pairs(docs: DataFrame) -> DataFrame:
    """ASYMMETRIC near-dup detection: shingle containment in both
    directions — |A∩B|/|A| catches a small document embedded inside a
    larger one, which symmetric Jaccard misses (the doc-in-doc /
    quote-expansion case a dedup pipeline must treat differently from
    mutual near-dups).

    Same single-shingling-pass + capped-bucket pair generation as
    ``ngram_jaccard_pairs`` (set sizes ride inside the bucket structs, no
    sizes join); containments are exact integer ppm so the relation
    hash-matches structurally. Emitted when EITHER direction crosses the
    threshold; both directions are reported for triage.

    Shingle relation materialized once (r17) — same double-read cut as
    ``ngram_jaccard_pairs``."""
    ex = cut_lineage(_exploded_hashed(docs), eager=False)
    buckets = _capped_sorted_buckets(
        ex, ["s_h"], F.struct("doc_id", "n_sh"), _doc_cap(docs)
    )
    pairs = _explode_pairs_with_sizes(buckets)
    inter = pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_inter"),
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
    )
    return (
        inter.select(
            "doc_a",
            "doc_b",
            F.expr("n_inter * 1000000 div n_a").alias("cont_a_ppm"),
            F.expr("n_inter * 1000000 div n_b").alias("cont_b_ppm"),
        )
        .filter(
            (F.col("cont_a_ppm") >= CONTAIN_PPM) | (F.col("cont_b_ppm") >= CONTAIN_PPM)
        )
    )


def containment_pairs_oracle() -> str:
    return f"""
        WITH {_SHINGLED_DUCK},
        ex AS ({_EX_DUCK}),
        ok AS (
            SELECT s_h FROM ex GROUP BY s_h
            HAVING count(*) >= 2 AND count(*) <= {_DF_CAP_DUCK}
        ),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter,
                   any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
            FROM ex a
            JOIN ok ON a.s_h = ok.s_h
            JOIN ex b ON a.s_h = b.s_h AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               CAST(n_inter * 1000000 // n_a AS BIGINT) AS cont_a_ppm,
               CAST(n_inter * 1000000 // n_b AS BIGINT) AS cont_b_ppm
        FROM inter
        WHERE n_inter * 1000000 // n_a >= {CONTAIN_PPM}
           OR n_inter * 1000000 // n_b >= {CONTAIN_PPM}
    """


def dedup_keep_best(docs: DataFrame) -> DataFrame:
    """The dedup pipeline's END PRODUCT: one KEEPER per near-dup cluster,
    chosen by QUALITY (argmax quality_score, doc_id tie-break) instead of
    min-id — what a training-data pipeline actually retains when dropping
    duplicates.

    Composition: connected components (``dedup_clusters``) keyed-joined
    to the map-side quality features, then one row_number window per
    cluster. The join and window both key on cluster-graph-sized
    relations (components ≪ corpus); quality is computed only for docs
    that are IN a cluster — at 100 TB the non-clustered majority never
    enters the shuffle."""
    # remediation-family entry (r16); materialized once (r17): the
    # collapsed corpus feeds the LSH pipeline AND the quality semi-join
    # branch, and the LSH side's shingle checkpoint breaks exchange
    # reuse between them — interleaved A/B 11.2 -> 8.0 s, values 0-diff
    docs = cut_lineage(collapse_doc_identity(docs), eager=False)
    clusters = dedup_clusters(
        docs, edges=minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    )
    # Quality only for docs that are IN a cluster (what the docstring
    # promises): semi-join against the materialized cluster membership
    # BEFORE the tokenize/regexp feature pass instead of computing
    # features corpus-wide and letting the final inner join discard them
    # (r17; guide §2.3 project/filter before the expensive work).
    # quality_score is strictly per-row, so pruning rows cannot change
    # any surviving value.
    clustered = docs.join(clusters.select("doc_id"), "doc_id", "semi")
    q = quality_score(clustered).select("doc_id", "quality_score")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        clusters.join(q, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keeper_doc_id"),
            F.col("quality_score").alias("keeper_quality"),
            "cluster_size",
        )
    )


def dedup_keep_best_oracle() -> str:
    return pk1_oracle(f"""
        WITH clusters AS ({_dedup_clusters_oracle_raw()}),
        q AS ({QUALITY_SCORE_ORACLE}),
        ranked AS (
            SELECT c.cluster_id, c.doc_id, c.cluster_size, q.quality_score,
                   row_number() OVER (PARTITION BY c.cluster_id
                                      ORDER BY q.quality_score DESC, c.doc_id ASC) AS rn
            FROM clusters c JOIN q ON q.doc_id = c.doc_id
        )
        SELECT cluster_id, doc_id AS keeper_doc_id,
               quality_score AS keeper_quality, cluster_size
        FROM ranked WHERE rn = 1
    """)


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return containment_pairs(load_table(spark, sf_dir, "documents"))


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_keep_best(load_table(spark, sf_dir, "documents"))


PR_ITERS = 3            # fixed power-iteration budget (deterministic oracle)
PR_SCALE = 1_000_000_000  # ranks as integer parts-per-billion
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio


def pagerank_pairs(docs: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Damped PageRank over the near-duplicate pair graph — centrality of
    each document inside its dup neighborhood (the "canonical pick"
    signal a dedup pipeline can use instead of min-id).

    ALL arithmetic is 64-bit integer (ranks in parts-per-billion,
    damping as the exact 85/100 ratio, integer division throughout), so
    the result is bit-identical across engines — float power iteration
    would diverge in the last ulp on summation order alone. Fixed
    ``iters`` rounds, each: one keyed join of the (checkpointed) edge
    list with the rank table + one sum by target — the same
    per-round shape as dedup_clusters, O(edges) per round with only
    metadata on the driver. Isolated nodes cannot occur (the node set
    is defined by the edge list)."""
    edges = minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    # one-pass undirected expansion (r17): explode each edge into both
    # directions instead of unioning two scans of the LSH pipeline
    # (guide §2.4 duplicated subtrees) — same change as dedup_clusters
    both_dirs = F.array(
        F.struct(F.col("doc_a"), F.col("doc_b")),
        F.struct(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")),
    )
    adj = (
        edges.select(F.explode(both_dirs).alias("e"))
        .select("e.doc_a", "e.doc_b")
        .distinct()
    )
    adj = cut_lineage(adj, eager=True)  # reused every round
    deg = adj.groupBy(F.col("doc_a").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    ranks = (
        deg.crossJoin(F.broadcast(nn))
        .select("doc_id", "deg", "n", F.expr(f"{PR_SCALE} div n").alias("r"))
    )
    teleport = F.expr(f"({PR_DAMP_DEN - PR_DAMP_NUM} * ({PR_SCALE} div n)) div {PR_DAMP_DEN}")
    for _ in range(iters):
        inbound = (
            adj.join(
                ranks.select(
                    F.col("doc_id").alias("src"), F.expr("r div deg").alias("share")
                ),
                adj.doc_b == F.col("src"),
            )
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.sum("share").alias("inbound"))
        )
        ranks = cut_lineage(
            # cut per round (r17): round k's ranks reference round k-1's
            # TWICE (inbound aggregate + the carry join), so the uncut
            # plan re-computed the previous round per reference —
            # exponential in iters. Interleaved A/B: 6.5 -> 5.0 s warm,
            # 20 -> 9.5 s cold, values 0-diff.
            ranks.join(inbound, "doc_id", "left").select(
                "doc_id",
                "deg",
                "n",
                (
                    teleport
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(inbound, 0L)) div {PR_DAMP_DEN}"
                    )
                ).alias("r"),
            ),
            eager=False,
        )
    return ranks.select("doc_id", "deg", F.col("r").alias("rank_ppb"))


def pagerank_pairs_oracle(iters: int = PR_ITERS) -> str:
    lo, hi = PR_DAMP_DEN - PR_DAMP_NUM, PR_DAMP_NUM
    steps = []
    for i in range(iters):
        prev = f"r{i}"
        steps.append(f"""
        r{i + 1} AS (
            SELECT d.doc_id, d.deg, nn.n,
                   CAST(({lo} * ({PR_SCALE} // nn.n)) // {PR_DAMP_DEN}
                        + ({hi} * coalesce(s.sm, 0)) // {PR_DAMP_DEN} AS BIGINT) AS r
            FROM deg d
            LEFT JOIN (
                SELECT a.doc_a AS doc_id, sum(p.r // p.deg) AS sm
                FROM adj a JOIN {prev} p ON p.doc_id = a.doc_b
                GROUP BY a.doc_a
            ) s ON s.doc_id = d.doc_id, nn
        )""")
    return f"""
        WITH pairs AS ({minhash_lsh_pairs_oracle()}),
        adj AS (
            SELECT doc_a, doc_b FROM pairs
            UNION SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
        ),
        deg AS (SELECT doc_a AS doc_id, count(*) AS deg FROM adj GROUP BY doc_a),
        nn AS (SELECT count(*) AS n FROM deg),
        r0 AS (
            SELECT doc_id, deg, nn.n, CAST({PR_SCALE} // nn.n AS BIGINT) AS r
            FROM deg, nn
        ),{",".join(steps)}
        SELECT doc_id, deg, r AS rank_ppb FROM r{iters}
    """


def q_pagerank_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pagerank_pairs(load_table(spark, sf_dir, "documents"))


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


def q_minhash_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_error_report(load_table(spark, sf_dir, "documents"))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(load_table(spark, sf_dir, "documents"))


def q_streaming_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_exact_dedup(load_table(spark, sf_dir, "events"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_clusters(load_table(spark, sf_dir, "documents"))


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_fingerprints(load_table(spark, sf_dir, "documents"))


def q_winnow_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_match_pairs(load_table(spark, sf_dir, "documents"))


def triangle_count(docs: DataFrame) -> DataFrame:
    """Per-node triangle counts over the verified near-dup graph — the
    clustering-coefficient signal that separates tight duplicate CLIQUES
    (templated content families) from accidental chains before
    ``dedup_clusters`` merges them.

    Standard ordered-edge triangle enumeration: edges carry doc_a <
    doc_b, so each triangle (a<b<c) is found exactly once by joining
    e(a,b)⋈e(b,c)⋈e(a,c). Join fanout is bounded by per-node degree in
    the post-cap pair graph (≪ corpus²); one shared pair materialization
    feeds all three join legs.
    """
    edges = cut_lineage(
        ngram_jaccard_pairs(docs).select("doc_a", "doc_b"), eager=False
    )
    e1 = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = edges.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    # one explode pass over the triangle relation (r17): the previous
    # 3-way unionAll evaluated the full triangle join once per corner
    # (guide §2.4 duplicated subtrees)
    member = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    nodes = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .unionAll(edges.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    return nodes.join(member, "doc_id", "left").select(
        "doc_id", F.coalesce("n", F.lit(0)).cast("long").alias("n_triangles")
    )


def triangle_count_oracle() -> str:
    return f"""
        WITH pairs AS ({ngram_jaccard_oracle()}),
        e AS (SELECT doc_a, doc_b FROM pairs),
        tri AS (
            SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
            FROM e e1
            JOIN e e2 ON e2.doc_a = e1.doc_b
            JOIN e e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
        ),
        nodes AS (
            SELECT DISTINCT doc_id FROM (
                SELECT doc_a AS doc_id FROM e
                UNION ALL SELECT doc_b FROM e
            )
        ),
        pern AS (
            SELECT doc_id, count(*) AS n FROM (
                SELECT a AS doc_id FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri
            ) GROUP BY doc_id
        )
        SELECT n.doc_id, CAST(coalesce(p.n, 0) AS BIGINT) AS n_triangles
        FROM nodes n LEFT JOIN pern p USING (doc_id)
    """


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_count(load_table(spark, sf_dir, "documents"))


def dedup_pipeline_report(docs: DataFrame) -> DataFrame:
    """End-to-end dedup pipeline summary — the one-row ops dashboard a
    data team reads after a corpus sweep: exact-duplicate volume,
    verified near-dup pair count, cluster structure, and the final
    survivor count if every cluster keeps one doc.

    Composition audit of the registered stages (``exact_dedup``,
    ``minhash_lsh_pairs``, ``dedup_clusters``): each stage reduces to a
    1-row aggregate and the report is a chain of 1-row cross joins —
    nothing wider than one row ever moves after the stage aggregates.
    The verified pair table is materialized ONCE and feeds both the pair
    count and the cluster pass (``dedup_clusters(edges=...)``) — the LSH
    pipeline never runs twice.
    """
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    exact = exact_dedup(docs).agg(
        F.sum(F.when(F.col("n_copies") > 1, F.col("n_copies")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_exact_dup_docs"),
    )
    edge_tbl = (
        cut_lineage(minhash_lsh_pairs(docs).select("doc_a", "doc_b"), eager=False)
    )
    pairs = edge_tbl.agg(F.count(F.lit(1)).alias("n_neardup_pairs"))
    cl = dedup_clusters(docs, edges=edge_tbl).agg(
        F.count(F.lit(1)).alias("n_clustered_docs"),
        F.countDistinct("cluster_id").alias("n_clusters"),
    )
    return (
        n_docs.crossJoin(exact)
        .crossJoin(pairs)
        .crossJoin(cl)
        .select(
            "n_docs",
            "n_exact_dup_docs",
            "n_neardup_pairs",
            "n_clusters",
            "n_clustered_docs",
            (F.col("n_clustered_docs") - F.col("n_clusters")).alias("n_dropped_docs"),
            (F.col("n_docs") - (F.col("n_clustered_docs") - F.col("n_clusters"))).alias(
                "n_surviving_docs"
            ),
        )
    )


def dedup_pipeline_report_oracle() -> str:
    return f"""
        WITH exact AS ({EXACT_DEDUP_ORACLE}),
        pairs AS ({minhash_lsh_pairs_oracle()}),
        clusters AS ({_dedup_clusters_oracle_raw()}),
        a AS (SELECT count(*) AS n_docs FROM documents),
        b AS (SELECT CAST(sum(CASE WHEN n_copies > 1 THEN n_copies ELSE 0 END)
                     AS BIGINT) AS n_exact_dup_docs FROM exact),
        c AS (SELECT count(*) AS n_neardup_pairs FROM pairs),
        d AS (SELECT count(*) AS n_clustered_docs,
                     count(DISTINCT cluster_id) AS n_clusters FROM clusters)
        SELECT a.n_docs, b.n_exact_dup_docs, c.n_neardup_pairs,
               d.n_clusters, d.n_clustered_docs,
               d.n_clustered_docs - d.n_clusters AS n_dropped_docs,
               a.n_docs - (d.n_clustered_docs - d.n_clusters) AS n_surviving_docs
        FROM a, b, c, d
    """


def q_dedup_pipeline_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_pipeline_report(load_table(spark, sf_dir, "documents"))


def leakage_safe_split(docs: DataFrame) -> DataFrame:
    """Near-dup-aware train/val/test assignment: the split is hashed from
    the document's NEAR-DUP CLUSTER label (its own id when unclustered),
    so two near-duplicates can never land in different splits — closing
    the train->test leakage channel that a per-document split
    (``dataset_split``) leaves open whenever near-dups exist.

    Same salted-hash bucketing as ``dataset_split`` (reproducible,
    engine-exact, append-stable); the only addition is the cluster join,
    keyed on doc_id — the cluster relation is dup-graph-sized, so the
    unclustered majority of a 100 TB corpus anti-joins cheaply.
    """
    from ..functions.textfns import hash60_spark_sql
    from .textops import _split_case

    # remediation-family entry (r16); materialized once (r17) — same
    # two-consumer-across-a-checkpoint shape as dedup_keep_best
    docs = cut_lineage(collapse_doc_identity(docs), eager=False)
    clusters = dedup_clusters(
        docs, edges=minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    ).select("doc_id", "cluster_id")
    base = docs.select("doc_id").join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("group_key"),
        F.col("cluster_id").isNotNull().alias("is_clustered"),
    )
    split_case = _split_case(hash60_spark_sql, key="group_key")
    return base.withColumn("split", F.expr(split_case))


def leakage_safe_split_oracle() -> str:
    from ..functions.textfns import hash60_duck_sql
    from .textops import _split_case

    split_case = _split_case(hash60_duck_sql, key="group_key")
    return pk1_oracle(f"""
        WITH clusters AS ({_dedup_clusters_oracle_raw()}),
        base AS (
            SELECT d.doc_id,
                   coalesce(c.cluster_id, d.doc_id) AS group_key,
                   c.cluster_id IS NOT NULL AS is_clustered
            FROM documents d LEFT JOIN clusters c USING (doc_id)
        )
        SELECT doc_id, group_key, is_clustered, {split_case} AS split
        FROM base
    """)


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return leakage_safe_split(load_table(spark, sf_dir, "documents"))
