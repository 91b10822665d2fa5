"""Similarity search over the ``embeddings`` table (SURVEY.md §2.11).

- ``topk_cosine``        — brute-force top-k: exact baseline. The query set
                           is broadcast; candidate scan is embarrassingly
                           parallel; per-query top-k via ranking window.
- ``topk_cosine_blocked``— IVF-style: candidates restricted to the query's
                           coarse cell (the fixture ``label`` stands in for
                           a centroid assignment). The probe-subset pattern
                           is the actual scale path: score 1/nlist of the
                           corpus instead of all of it.
- ``lsh_buckets``        — sign-random-projection (SimHash-for-vectors):
                           16 deterministic ±1 hyperplanes shared as
                           literals with the oracle; bucket = bit pattern
                           of projection signs. Bucket equi-join replaces
                           the all-pairs product for near-dup mining.
- ``embedding_neardup``  — embedding-cosine near-duplicate pairs: the
                           16-bit code split into 4 bands of 4 bits;
                           vectors agreeing on any band are candidates
                           (grouped per band bucket, capped, pair-exploded
                           — same scale shape as MinHash LSH), then
                           verified with exact cosine >= threshold. Band
                           width trades recall against candidate volume;
                           a production corpus would widen the code and
                           multi-probe rather than shrink bands.

All cosine math is double-precision column arithmetic (zip_with +
aggregate fold — sequential, matching DuckDB's list_dot_product order),
rounded before ranking so cross-engine float noise cannot flip an order.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round0, round0_sql
from ..lineage import cut_lineage
from ..sources.tables import load_table, spread

N_QUERIES = 5      # vec_id < 5 are the query vectors
TOP_K = 3
N_PLANES = 16
DIM = 64
ROUND_COS = 6


# The embedding-family validity boundary (r13, found by the first
# NULL-embedding perturbed sweep): a row with a NULL embedding carries no
# signal for assignment, search, quantization, or banding, and the two
# engines' incidental NULL behaviors diverge immediately (DuckDB
# list_inner_product ERRORS on NULL lists; Spark's NULL dot ranks by
# engine-specific NULL placement; kmeans member counts split). NULL
# vectors are therefore EXCLUDED at the table boundary — the decision
# embedding_drift_report took in r12, now uniform: every Spark entry
# loads through ``load_embeddings`` and every oracle reads ``{_EMB}``.
#
# NON-FINITE components (NaN/Inf) are excluded by the same boundary
# (r13 NaN-embedding probe corpus): a non-finite component poisons every
# distance, and the quantization paths CRASH under Spark ANSI
# (CAST_OVERFLOW casting NaN to INT) while DuckDB rounds it — a trained
# artifact with NaN/Inf components is invalid input, like a NULL ping
# timestamp. (-0.0 components are VALID and verified engine-consistent.)
#
# NULL COMPONENTS (r14, per the r13 advisor): a non-NULL vector with a
# NULL element is invalid by the same argument, and it sat exactly on a
# 3-valued-logic fault line — Spark's exists() returned NULL on such a
# row (predicate NULL on the NULL element, no TRUE), so ~NULL dropped
# it, while DuckDB's bool_or SKIPPED the NULL lambda result and kept
# it. Both predicates now test the element explicitly
# (``x IS NULL OR NOT isfinite(x)``), so NULL-element vectors are
# excluded by decision, not by whichever engine's NULL propagation
# happens to fire.
_EMB = (
    "(SELECT * FROM embeddings WHERE embedding IS NOT NULL AND NOT"
    " coalesce(list_aggregate(list_transform(embedding,"
    " x -> x IS NULL OR NOT isfinite(x)), 'bool_or'), FALSE))"
)


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table past the NULL-vector / NULL-component /
    non-finite validity boundary (the embedding twin of
    ``validate_pings`` — see ``_EMB`` note above)."""
    return load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
        & ~F.exists(
            "embedding",
            lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
        )
    )


def _as_double(col: str):
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a, b, n: int = DIM):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _dot_unrolled(a, b, n: int = DIM):
    """``_dot`` with the fixed-width fast path unrolled into a plain
    left-to-right sum — bit-identical to the fold (same accumulation
    order from 0.0; any other array length falls back to the fold, so
    out-of-contract behavior is unchanged) but codegen-able instead of
    an interpreted higher-order function (guide §4.1). ONLY for sites
    with one dot per row (the pair-verify joins): stacking several
    unrolled dots in one projection (banding's 16, dist2's 3 x nlist)
    blows the expression past codegen limits and measured 2-3x SLOWER,
    so the general ``_dot`` stays the default everywhere else.
    """
    s = F.lit(0.0)
    for i in range(n):
        s = s + F.get(a, i) * F.get(b, i)
    return F.when((F.size(a) == n) & (F.size(b) == n), s).otherwise(_dot(a, b))


def _with_norm(df: DataFrame, prefix: str) -> DataFrame:
    emb = _as_double("embedding")
    return df.select(
        F.col("vec_id").alias(f"{prefix}_id"),
        F.col("label").alias(f"{prefix}_label"),
        emb.alias(f"{prefix}_emb"),
        F.sqrt(_dot(emb, emb)).alias(f"{prefix}_norm"),
    )


def _norm_base(embeddings: DataFrame) -> DataFrame:
    """Unprefixed normalized corpus frontier ``(vec_id, label, emb,
    nrm)`` — the relation every cosine branch re-derives from the raw
    table. Report/dial queries that fan several branches off one corpus
    ``cut_lineage`` THIS relation once (lazily) and pass it down via the
    operators' ``base=`` parameter, so Catalyst's per-branch re-plan
    cannot recompute the scan + norm fold per branch (the r11
    duplicate-corpus-scan audit's fix pattern, generalized from
    ``topk_cosine_ivf``'s assign cut). Single-branch callers keep the
    default ``base=None`` path — there, re-deriving from the columnar
    scan IS the right call at scale."""
    emb = _as_double("embedding")
    return spread(embeddings).select(
        "vec_id",
        "label",
        emb.alias("emb"),
        F.sqrt(_dot(emb, emb)).alias("nrm"),
    )


def _prefixed(base: DataFrame, prefix: str) -> DataFrame:
    """``_with_norm``-shaped view over a ``_norm_base`` relation."""
    return base.select(
        F.col("vec_id").alias(f"{prefix}_id"),
        F.col("label").alias(f"{prefix}_label"),
        F.col("emb").alias(f"{prefix}_emb"),
        F.col("nrm").alias(f"{prefix}_norm"),
    )


def _prefixed_cell(with_cell: DataFrame, prefix: str) -> DataFrame:
    """``_prefixed`` with the IVF cell as the label — the view the IVF
    read path blocks on (``with_cell`` = ``_norm_base`` ⋈ assignment)."""
    return with_cell.select(
        F.col("vec_id").alias(f"{prefix}_id"),
        F.col("centroid_id").alias(f"{prefix}_label"),
        F.col("emb").alias(f"{prefix}_emb"),
        F.col("nrm").alias(f"{prefix}_norm"),
    )


def _rank_topk(scored: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def topk_cosine(embeddings: DataFrame, base: DataFrame | None = None) -> DataFrame:
    """Exact brute-force top-k cosine per query vector. ``base``: a
    (usually lineage-cut) ``_norm_base`` relation to derive both sides
    from instead of re-planning the scan per branch."""
    if base is not None:
        q = _prefixed(base.filter(F.col("vec_id") < N_QUERIES), "query")
        c = _prefixed(base, "cand")
    else:
        q = _with_norm(embeddings.filter(F.col("vec_id") < N_QUERIES), "query")
        c = _with_norm(spread(embeddings), "cand")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            round0(
                _dot(F.col("query_emb"), F.col("cand_emb"))
                / (F.col("query_norm") * F.col("cand_norm")),
                ROUND_COS,
            ).alias("cosine"),
        )
    )
    return _rank_topk(scored)


_COS_DUCK = round0_sql(
    "list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])"
    " / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])))",
    ROUND_COS,
)

TOPK_COSINE_ORACLE = f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_COS_DUCK} AS cosine
        FROM {_EMB} q
        JOIN {_EMB} c ON c.vec_id != q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
"""


def topk_cosine_blocked(embeddings: DataFrame) -> DataFrame:
    """IVF-style top-k: only candidates in the query's coarse cell (label)."""
    q = _with_norm(embeddings.filter(F.col("vec_id") < N_QUERIES), "query")
    c = _with_norm(spread(embeddings), "cand")
    scored = (
        c.join(F.broadcast(q), F.col("cand_label") == F.col("query_label"))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            round0(
                _dot(F.col("query_emb"), F.col("cand_emb"))
                / (F.col("query_norm") * F.col("cand_norm")),
                ROUND_COS,
            ).alias("cosine"),
        )
    )
    return _rank_topk(scored)


TOPK_COSINE_BLOCKED_ORACLE = f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_COS_DUCK} AS cosine
        FROM {_EMB} q
        JOIN {_EMB} c ON c.label = q.label AND c.vec_id != q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
"""


def _planes() -> list[list[float]]:
    """Deterministic ±1 hyperplanes, identical literals in Spark and SQL."""
    rng = random.Random(7)
    return [[float(rng.choice((-1, 1))) for _ in range(DIM)] for _ in range(N_PLANES)]


def lsh_buckets(embeddings: DataFrame) -> DataFrame:
    """Sign-random-projection bucket per vector (16-bit code).

    The float->double cast is hoisted into one projection so the 16 plane
    dots share it instead of re-casting the array per bit."""
    pre = embeddings.select("vec_id", "label", _as_double("embedding").alias("e"))
    bucket = None
    for p, weights in enumerate(_planes()):
        w = F.array(*[F.lit(v) for v in weights])
        bit = F.when(_dot(F.col("e"), w) > 0, F.lit(2**p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return pre.select("vec_id", "label", bucket.alias("bucket"))


def lsh_buckets_oracle() -> str:
    terms = []
    for p, weights in enumerate(_planes()):
        arr = "[" + ", ".join(repr(v) for v in weights) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {arr}::DOUBLE[]) > 0"
            f" THEN {2**p} ELSE 0 END)"
        )
    expr = " + ".join(terms)
    return f"SELECT vec_id, label, {expr} AS bucket FROM {_EMB}"


N_VBANDS = 4
BITS_PER_VBAND = N_PLANES // N_VBANDS
NEARDUP_COS = 0.4          # fixture vectors are near-orthogonal; real
                           # near-dup corpora would sit at ~0.9+
BUCKET_CAP_FRAC = 0.25     # guard against degenerate all-in-one-bucket data
BUCKET_CAP_MAX = 1024      # absolute per-bucket bound: C(cap, 2) limits
                           # fanout on corpora big enough that frac*N is
                           # itself quadratic trouble (r10 scale curve)
# the 100 TB band geometry: same 16 planes, 2 bands x 8 bits. Band width
# must track corpus size (bits ~ log2(N / target_bucket_size)) because a
# FIXED w-bit band puts ~N/2^w random vectors in every bucket — candidate
# pairs then grow ~N^2 regardless of any cap fraction. Measured (SCALE.md
# "Dedup-family scale curve"): 4x4 bands at 10x fixture = 23x wall time;
# 8-bit bands restore ~linear. Pick n_bands so 2^(planes/n_bands) >> N/B.
WIDE_VBANDS = 2

# sorted id array -> all i<j pairs via two-level explode (callers filter
# size>=2 first). One flatten(transform(...)) would materialize
# C(|ds|, 2) structs in a single row before exploding — at
# BUCKET_CAP_MAX (1024) a ~500k-struct array per bucket row; the
# two-generator form streams the same pair set with O(|ds|) rows
# (same fix as dedup._explode_pairs_ids, r10 audit).


def _explode_vpairs(buckets: DataFrame) -> DataFrame:
    return (
        buckets.select("ds", F.explode(F.expr("sequence(1, size(ds) - 1)")).alias("i"))
        .select(
            F.expr("element_at(ds, i)").alias("vec_a"),
            F.explode(F.expr("slice(ds, i + 1, size(ds) - i)")).alias("vec_b"),
        )
    )


def _band_bits(
    planes: list[list[float]], band: int, emb_col: str = "e", bits: int = BITS_PER_VBAND
):
    """The band-th ``bits``-wide sign pattern as an int column (over a
    pre-cast double-array column so the 16 dots share one cast)."""
    bval = None
    for i in range(bits):
        w = F.array(*[F.lit(v) for v in planes[band * bits + i]])
        bit = F.when(_dot(F.col(emb_col), w) > 0, F.lit(2**i)).otherwise(F.lit(0))
        bval = bit if bval is None else bval + bit
    return bval


def _sign_code(base: DataFrame) -> DataFrame:
    """(vec_id, 16-bit sign code) over a ``_norm_base``-shaped relation —
    plane p contributes 2^p, identical weights to ``_band_bits``, so any
    band geometry's bval is a pure shift/mask of this one code:
    ``bval(b) = (code >> b*bits) & (2^bits - 1)``. The geometry report
    cuts THIS relation once and derives both geometries from it (r18) —
    previously each geometry re-ran the 16-plane dot fold over the
    corpus."""
    code = None
    for p, weights in enumerate(_planes()):
        w = F.array(*[F.lit(v) for v in weights])
        bit = F.when(_dot(F.col("emb"), w) > 0, F.lit(2**p)).otherwise(F.lit(0))
        code = bit if code is None else code + bit
    return base.select("vec_id", code.alias("code"))


def _code_band_rows(code: DataFrame, n_bands: int) -> DataFrame:
    """(vec_id, band, bval) rows for a geometry, derived from a
    ``_sign_code`` relation by shift/mask — exact integer equality with
    ``_band_bits`` (bit i of band b is plane b*bits+i at weight 2^i)."""
    bits = N_PLANES // n_bands
    mask = (1 << bits) - 1
    bands = F.expr(
        f"transform(sequence(0, {n_bands - 1}), "
        f"b -> struct(b AS band, shiftright(code, b * {bits}) & {mask} AS bval))"
    )
    return code.select("vec_id", F.explode(bands).alias("bb")).select(
        "vec_id", "bb.band", "bb.bval"
    )


def _vband_buckets(
    embeddings: DataFrame,
    n_bands: int,
    base: DataFrame | None = None,
    code: DataFrame | None = None,
) -> DataFrame:
    """Capped sign-LSH bucket relation (band, bval, ds, cap) for the given
    band geometry — shared by ``embedding_neardup`` and the geometry
    report. ``base``: a lineage-cut ``_norm_base`` relation to band from
    instead of re-planning the corpus scan. ``code``: a (usually
    lineage-cut) ``_sign_code`` relation — band rows then derive by
    shift/mask and need no cut of their own (the double-read of
    ``_capped_sorted_buckets`` re-reads the code blocks, not the dot
    fold)."""
    if code is not None:
        exploded = _code_band_rows(code, n_bands)
        cap_src = base if base is not None else embeddings
        cap = cap_src.agg(
            F.greatest(
                F.least(
                    F.floor(F.count(F.lit(1)) * F.lit(BUCKET_CAP_FRAC)).cast("bigint"),
                    F.lit(BUCKET_CAP_MAX).cast("bigint"),
                ),
                F.lit(2),
            ).alias("cap")
        )
        from .dedup import _capped_sorted_buckets

        return _capped_sorted_buckets(exploded, ["band", "bval"], "vec_id", cap)
    planes = _planes()
    bits = N_PLANES // n_bands
    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), _band_bits(planes, b, bits=bits).alias("bval"))
            for b in range(n_bands)
        ]
    )
    src = (
        base.select("vec_id", F.col("emb").alias("e"))
        if base is not None
        else spread(embeddings).select("vec_id", _as_double("embedding").alias("e"))
    )
    exploded = cut_lineage(
        # materialized once (r17): _capped_sorted_buckets reads its input
        # twice (hot-key histogram + collect), and each read re-ran the
        # 16-plane banding fold over the corpus (~0.25 s/pass at sf0.1)
        src.select("vec_id", F.explode(bands).alias("bb")).select(
            "vec_id", "bb.band", "bb.bval"
        ),
        eager=False,
    )
    cap = (base if base is not None else embeddings).agg(
        F.greatest(
            F.least(
                F.floor(F.count(F.lit(1)) * F.lit(BUCKET_CAP_FRAC)).cast("bigint"),
                F.lit(BUCKET_CAP_MAX).cast("bigint"),
            ),
            F.lit(2),
        ).alias("cap")
    )
    # over-cap buckets dropped BEFORE collect_list materializes their
    # arrays (dedup._capped_sorted_buckets — r10 OOM-at-the-cap audit)
    from .dedup import _capped_sorted_buckets

    return _capped_sorted_buckets(exploded, ["band", "bval"], "vec_id", cap)


def embedding_neardup(embeddings: DataFrame, n_bands: int = N_VBANDS) -> DataFrame:
    """Embedding-cosine near-dup pairs via banded sign-LSH + exact verify.

    Candidates come from grouping (band, band-bits) into vector-id buckets
    and exploding i<j pairs per bucket — a shuffle on the band value,
    never an all-pairs product. Verification joins the (small) candidate
    set back to the embeddings for the exact cosine.

    ``n_bands`` sets the band geometry over the 16 shared planes
    (bits per band = 16 / n_bands). The default 4x4 is the high-recall
    small-corpus shape; ``WIDE_VBANDS`` (2x8) is the scale shape — see
    the band-width note at the constant and the r10 scale-curve table in
    SCALE.md for the measured quadratic-vs-linear difference.

    One lineage-cut ``_norm_base`` frontier feeds banding, the cap
    aggregate, and both verify sides (r17 sweep of the winnow-shape
    ``=None`` recompute defaults: this was the one remaining caller
    fanning four uncut corpus frontiers — ``vband_geometry_report``
    already shared a cut frontier for the same sub-operators).
    """
    b = cut_lineage(_norm_base(embeddings), eager=False)
    return _verified_pairs(
        embeddings, _vband_buckets(embeddings, n_bands, base=b), base=b
    )


def _verified_pairs(
    embeddings: DataFrame, buckets: DataFrame, base: DataFrame | None = None
) -> DataFrame:
    """Bucket relation -> exploded i<j candidates -> exact-cosine verify."""
    candidates = _explode_vpairs(buckets).distinct()
    if base is not None:
        a = _prefixed(base, "qa")
        b = _prefixed(base, "qb")
    else:
        a = _with_norm(embeddings, "qa")
        b = _with_norm(embeddings, "qb")
    # NO broadcast hint on the verify joins: neither side is reliably
    # small — `a`/`b` are the full embeddings relation (corpus-sized at
    # 100 TB; force-broadcasting it is a driver/executor OOM), and the
    # candidate pair set is only cap-bounded per bucket, so it can still
    # be large when bands collide heavily (this fixture). Both verify
    # joins are plain keyed equi-joins; the planner broadcasts whichever
    # side its stats say is small (AQE re-plans at runtime) and falls
    # back to a shuffle join when both are big — the only shape that is
    # safe at every scale.
    scored = (
        candidates.join(a, F.col("vec_a") == F.col("qa_id"))
        .join(b, F.col("vec_b") == F.col("qb_id"))
        .select(
            "vec_a",
            "vec_b",
            round0(
                _dot_unrolled(F.col("qa_emb"), F.col("qb_emb"))
                / (F.col("qa_norm") * F.col("qb_norm")),
                ROUND_COS,
            ).alias("cosine"),
        )
    )
    return scored.filter(F.col("cosine") >= NEARDUP_COS)


def _vband_sql_parts(n_bands: int) -> tuple[str, str]:
    """(bands_sql, cap_expr) — the DuckDB mirror of ``_vband_buckets``'s
    banding and cap for the given geometry."""
    planes = _planes()
    bits = N_PLANES // n_bands
    band_rows = []
    for b in range(n_bands):
        terms = []
        for i in range(bits):
            arr = "[" + ", ".join(repr(v) for v in planes[b * bits + i]) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {arr}::DOUBLE[]) > 0"
                f" THEN {2**i} ELSE 0 END)"
            )
        band_rows.append(
            f"SELECT vec_id, {b} AS band, {' + '.join(terms)} AS bval FROM {_EMB}"
        )
    cap = (
        f"greatest(least(CAST(floor((SELECT count(*) FROM {_EMB}) * {BUCKET_CAP_FRAC})"
        f" AS BIGINT), {BUCKET_CAP_MAX}), 2)"
    )
    return "\nUNION ALL\n".join(band_rows), cap


def embedding_neardup_oracle(n_bands: int = N_VBANDS) -> str:
    bands_sql, cap = _vband_sql_parts(n_bands)
    return f"""
        WITH bands AS ({bands_sql}),
        okb AS (
            SELECT band, bval FROM bands GROUP BY band, bval
            HAVING count(*) >= 2 AND count(*) <= {cap}
        ),
        candidates AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM bands a
            JOIN okb ON a.band = okb.band AND a.bval = okb.bval
            JOIN bands b ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
        )
        SELECT vec_a, vec_b, {_COS_DUCK.replace('q.', 'qa.').replace('c.', 'qb.')} AS cosine
        FROM candidates
        JOIN {_EMB} qa ON vec_a = qa.vec_id
        JOIN {_EMB} qb ON vec_b = qb.vec_id
        WHERE {_COS_DUCK.replace('q.', 'qa.').replace('c.', 'qb.')} >= {NEARDUP_COS}
    """


def vband_geometry_report_oracle() -> str:
    cos = _COS_DUCK.replace("q.", "qa.").replace("c.", "qb.")
    blocks, selects = [], []
    for g in (N_VBANDS, WIDE_VBANDS):
        bands_sql, cap = _vband_sql_parts(g)
        blocks.append(f"bands{g} AS ({bands_sql})")
        blocks.append(
            f"okb{g} AS (SELECT band, bval, count(*) AS n FROM bands{g} "
            f"GROUP BY band, bval HAVING count(*) >= 2 AND count(*) <= {cap})"
        )
        blocks.append(
            f"cand{g} AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b "
            f"FROM bands{g} a "
            f"JOIN okb{g} ok ON a.band = ok.band AND a.bval = ok.bval "
            f"JOIN bands{g} b ON a.band = b.band AND a.bval = b.bval "
            f"AND a.vec_id < b.vec_id)"
        )
        blocks.append(
            f"np{g} AS (SELECT count(*) AS n FROM cand{g} "
            f"JOIN {_EMB} qa ON vec_a = qa.vec_id "
            f"JOIN {_EMB} qb ON vec_b = qb.vec_id "
            f"WHERE {cos} >= {NEARDUP_COS})"
        )
        selects.append(
            f"SELECT CAST({g} AS INT) AS n_bands, "
            f"(SELECT count(*) FROM okb{g}) AS n_buckets, "
            f"(SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT) FROM okb{g})"
            f" AS n_candidates, "
            f"(SELECT CAST(coalesce(max(n), 0) AS INT) FROM okb{g}) AS max_bucket, "
            f"(SELECT n FROM np{g}) AS n_pairs"
        )
    return "WITH " + ",\n".join(blocks) + "\n" + "\nUNION ALL\n".join(selects)


N_CENTROIDS = 4  # coarse quantizer size (nlist); fixture-scaled


def _centroids(embeddings: DataFrame, nlist: int = N_CENTROIDS) -> DataFrame:
    """Seed centroid table: the first ``nlist`` vectors by vec_id.

    Production IVF trains centroids OFFLINE (sampled k-means) and ships
    them as a small table; the online path — assignment + probe — is
    exactly what the registered operators implement. Seeding by id keeps
    the whole pipeline deterministic and SQL-expressible (a float
    k-means update averages doubles, whose summation order is not
    cross-engine stable)."""
    return embeddings.filter(F.col("vec_id") < nlist).select(
        F.col("vec_id").alias("c_id"), _as_double("embedding").alias("c_emb")
    )


def _assign_inline(src: DataFrame, cents: DataFrame) -> DataFrame:
    """Per-row nearest-centroid assignment as a PROJECTION (r17, guide
    §2.4 "remove shuffles outright"): the centroid table collapses into
    one broadcast row holding a c_id-sorted array, and each source row
    folds its argmin over that array — no corpus exchange, no sort, no
    back-join, and consumers keep every ``src`` column (so the member
    join the old window form required downstream disappears too).

    ``src`` must carry ``vec_id`` and a double-array column ``e``.
    dist2 per centroid is the IDENTICAL expression the crossJoin form
    computed (round0(<e,e> - 2<e,c> + <c,c>)), so values hash-match;
    the fold keeps the (dist2 ASC, c_id ASC) lexicographic minimum —
    exactly the old window's first row. The init sentinel (+inf) can
    never win because validated embeddings make every dist2 finite, and
    the empty-centroid-table guard reproduces the old crossJoin
    behavior (no centroids -> no output rows)."""
    cent_arr = cents.agg(
        F.sort_array(F.collect_list(F.struct("c_id", "c_emb"))).alias("cs")
    )
    e = F.col("e")
    scored = F.transform(
        F.col("cs"),
        lambda c: F.struct(
            round0(
                _dot(e, e)
                - 2 * _dot(e, c["c_emb"])
                + _dot(c["c_emb"], c["c_emb"]),
                ROUND_COS,
            ).alias("dist2"),
            c["c_id"].alias("c_id"),
        ),
    )
    init = F.struct(
        F.lit(float("inf")).cast("double").alias("dist2"),
        F.lit(None).cast("long").alias("c_id"),
    )
    best = F.aggregate(
        scored,
        init,
        lambda acc, x: F.when(
            (x["dist2"] < acc["dist2"])
            | ((x["dist2"] == acc["dist2"]) & (x["c_id"] < acc["c_id"])),
            x,
        ).otherwise(acc),
    )
    return (
        src.crossJoin(F.broadcast(cent_arr))
        .filter(F.size("cs") > 0)
        .withColumn("_best", best)
        .withColumn("centroid_id", F.col("_best.c_id"))
        .withColumn("dist2", F.col("_best.dist2"))
        .drop("_best", "cs")
    )


def ivf_assign(
    embeddings: DataFrame,
    nlist: int = N_CENTROIDS,
    base: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse assignment: nearest centroid per vector by squared L2.

    Plan shape (r17): broadcast the tiny centroid table as ONE array
    row against every vector and fold the argmin per row
    (``_assign_inline``) — dist2 = <e,e> - 2<e,c> + <c,c> rounded
    before comparison so float noise cannot flip an order, centroid id
    breaking ties. At 100 TB this is one scan + a broadcast, zero
    shuffles — the shape a real coarse quantizer runs in (the previous
    crossJoin + rank-window form shuffled and sorted corpus x nlist
    rows to pick each vector's minimum)."""
    if base is not None:
        e = base.select("vec_id", F.col("emb").alias("e"))
        cents = base.filter(F.col("vec_id") < nlist).select(
            F.col("vec_id").alias("c_id"), F.col("emb").alias("c_emb")
        )
    else:
        e = spread(embeddings).select("vec_id", _as_double("embedding").alias("e"))
        cents = _centroids(embeddings, nlist)
    return _assign_inline(e, cents).select("vec_id", "centroid_id", "dist2")


_DIST2_DUCK = round0_sql(
    "list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])"
    " - 2 * list_dot_product(e.embedding::DOUBLE[], c.embedding::DOUBLE[])"
    " + list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])",
    ROUND_COS,
)


def _assign_duck(nlist: int = N_CENTROIDS) -> str:
    return f"""
    SELECT vec_id, centroid_id, dist2 FROM (
        SELECT e.vec_id, c.vec_id AS centroid_id, {_DIST2_DUCK} AS dist2,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_DIST2_DUCK} ASC, c.vec_id ASC) AS rn
        FROM {_EMB} e
        JOIN {_EMB} c ON c.vec_id < {nlist}
    ) WHERE rn = 1
"""


_ASSIGN_DUCK = _assign_duck()

IVF_ASSIGN_ORACLE = _ASSIGN_DUCK


def topk_cosine_ivf(
    embeddings: DataFrame, base: DataFrame | None = None
) -> DataFrame:
    """Blocked top-k over the COMPUTED coarse cells (nprobe=1): the real
    IVF read path — ``topk_cosine_blocked`` with the fixture label
    replaced by ``ivf_assign``'s nearest-centroid cell. Scores
    ~1/nlist of the corpus per query; recall-vs-cost is tuned by
    probing more cells, never by scanning everything.

    The assignment is an inline projection (r17, ``_assign_inline``):
    each row keeps its vector and norm next to its computed cell, so
    the old materialize-assignment-then-join-back-by-vec_id dance (and
    its lineage cut) is gone — the query branch's vec_id filter pushes
    below the fold, so only the candidate branch pays the corpus-sized
    assignment, once."""
    src = base if base is not None else _norm_base(embeddings)
    with_cell = _assign_inline(
        src.select("vec_id", F.col("emb").alias("e"), "nrm"),
        src.filter(F.col("vec_id") < N_CENTROIDS).select(
            F.col("vec_id").alias("c_id"), F.col("emb").alias("c_emb")
        ),
    ).select("vec_id", "centroid_id", F.col("e").alias("emb"), "nrm")
    q = _prefixed_cell(with_cell.filter(F.col("vec_id") < N_QUERIES), "query")
    c = _prefixed_cell(with_cell, "cand")
    scored = (
        c.join(F.broadcast(q), F.col("cand_label") == F.col("query_label"))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            round0(
                _dot(F.col("query_emb"), F.col("cand_emb"))
                / (F.col("query_norm") * F.col("cand_norm")),
                ROUND_COS,
            ).alias("cosine"),
        )
    )
    return _rank_topk(scored)


TOPK_COSINE_IVF_ORACLE = f"""
    WITH assign AS ({_ASSIGN_DUCK}),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_COS_DUCK} AS cosine
        FROM {_EMB} q
        JOIN assign qa ON qa.vec_id = q.vec_id
        JOIN assign ca ON ca.centroid_id = qa.centroid_id
        JOIN {_EMB} c ON c.vec_id = ca.vec_id AND c.vec_id != q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
"""


N_PROBE = 2  # cells probed per query in the multi-probe variant


def ivf_probe_cells(
    embeddings: DataFrame,
    nprobe: int = N_PROBE,
    base: DataFrame | None = None,
) -> DataFrame:
    """Per-QUERY probe list: the ``nprobe`` nearest centroids (recall
    knob of IVF — candidates stay in their single home cell; only the
    query fans out)."""
    if base is not None:
        e = base.filter(F.col("vec_id") < N_QUERIES).select(
            "vec_id", F.col("emb").alias("e")
        )
        cents = base.filter(F.col("vec_id") < N_CENTROIDS).select(
            F.col("vec_id").alias("c_id"), F.col("emb").alias("c_emb")
        )
    else:
        e = embeddings.filter(F.col("vec_id") < N_QUERIES).select(
            "vec_id", _as_double("embedding").alias("e")
        )
        cents = _centroids(embeddings)
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "c_id",
        round0(
            _dot(F.col("e"), F.col("e"))
            - 2 * _dot(F.col("e"), F.col("c_emb"))
            + _dot(F.col("c_emb"), F.col("c_emb")),
            ROUND_COS,
        ).alias("dist2"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select(F.col("vec_id").alias("query_id"), F.col("c_id").alias("probe_cell"))
    )


def topk_cosine_ivf_probe2(embeddings: DataFrame) -> DataFrame:
    """IVF top-k with nprobe=2: each query scores candidates in its TWO
    nearest cells. Strictly higher recall than nprobe=1 at 2/nlist of
    the scan cost — the production recall/cost dial, expressed as one
    extra broadcast-joined probe row per query.

    Like the nprobe=1 read path, the corpus frontier is shared: one
    lineage-cut ``_norm_base`` relation feeds the assignment, the probe
    list, and both scoring sides, so the plan scans the corpus once
    (r12 frontier-cut pass; scan count pinned in tests/test_plans.py)."""
    b = cut_lineage(_norm_base(embeddings), eager=False)
    probes = ivf_probe_cells(embeddings, base=b)
    # inline assignment (r17): the candidate rows keep their vector and
    # norm next to the computed cell — no assignment join back on vec_id
    c = _prefixed_cell(
        _assign_inline(
            b.select("vec_id", F.col("emb").alias("e"), "nrm"),
            b.filter(F.col("vec_id") < N_CENTROIDS).select(
                F.col("vec_id").alias("c_id"), F.col("emb").alias("c_emb")
            ),
        ).select("vec_id", "centroid_id", F.col("e").alias("emb"), "nrm"),
        "cand",
    )
    q = _prefixed(b.filter(F.col("vec_id") < N_QUERIES), "query").join(
        F.broadcast(probes), "query_id"
    )
    scored = (
        c.join(F.broadcast(q), F.col("cand_label") == F.col("probe_cell"))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            round0(
                _dot(F.col("query_emb"), F.col("cand_emb"))
                / (F.col("query_norm") * F.col("cand_norm")),
                ROUND_COS,
            ).alias("cosine"),
        )
        .distinct()  # a candidate can appear via at most one cell, but keep the
        # semantics explicit: per (query, cand) one score row
    )
    return _rank_topk(scored)


TOPK_COSINE_IVF_PROBE2_ORACLE = f"""
    WITH assign AS ({_ASSIGN_DUCK}),
    probes AS (
        SELECT vec_id AS query_id, centroid_id AS probe_cell FROM (
            SELECT e.vec_id, c.vec_id AS centroid_id,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_DIST2_DUCK} ASC, c.vec_id ASC) AS rn
            FROM {_EMB} e
            JOIN {_EMB} c ON c.vec_id < {N_CENTROIDS}
            WHERE e.vec_id < {N_QUERIES}
        ) WHERE rn <= {N_PROBE}
    ),
    scored AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id, {_COS_DUCK} AS cosine
        FROM {_EMB} q
        JOIN probes p ON p.query_id = q.vec_id
        JOIN assign ca ON ca.centroid_id = p.probe_cell
        JOIN {_EMB} c ON c.vec_id = ca.vec_id AND c.vec_id != q.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------- IVF training
# One Lloyd round closes the IVF loop the earlier operators left offline:
# seed centroids (_centroids) -> assign (ivf_assign) -> UPDATE (element-wise
# member mean) -> re-assign against the trained table. Averages are rounded
# to ROUND_COS decimals so cross-engine double accumulation order cannot
# flip a value hash — the same guarantee every avg aggregate in this repo
# makes. Production would iterate update/assign to convergence over a
# SAMPLE of the corpus; each round is exactly these two shapes.


def kmeans_update(embeddings: DataFrame) -> DataFrame:
    """One k-means (Lloyd) update step in long form: for every
    (centroid, dimension), the mean of the member vectors' components,
    plus the member count.

    Plan shape (r17): inline broadcast-assign (``_assign_inline``
    keeps the vector on the assigned row, so the old corpus re-scan +
    vec_id join is gone), then posexplode each member vector to
    (centroid_id, pos, v) and hash-aggregate the mean — one scan + ONE
    shuffle on (centroid_id, pos), k*dim output rows. At 100 TB the
    update aggregate carries k*dim cells of partial (sum, count), not
    vectors; this is the canonical distributed k-means round (MLlib's
    KMeans does the same reduce, RDD-side)."""
    e = spread(embeddings).select("vec_id", _as_double("embedding").alias("e"))
    members = _assign_inline(e, _centroids(embeddings)).select(
        "centroid_id", F.posexplode("e").alias("pos", "v")
    )
    return members.groupBy("centroid_id", "pos").agg(
        round0(F.avg("v"), ROUND_COS).alias("coord"),
        F.count(F.lit(1)).alias("n_members"),
    )


_KMEANS_UPDATE_DUCK = f"""
    SELECT a.centroid_id, d.pos,
           round(avg(e.embedding[d.pos + 1]::DOUBLE), {ROUND_COS})
               + CAST(0.0 AS DOUBLE) AS coord,
           count(*) AS n_members
    FROM ({_ASSIGN_DUCK}) a
    JOIN {_EMB} e ON e.vec_id = a.vec_id
    CROSS JOIN (SELECT generate_series AS pos FROM generate_series(0, {DIM - 1})) d
    GROUP BY 1, 2
"""

KMEANS_UPDATE_ORACLE = _KMEANS_UPDATE_DUCK


def _trained_centroids(embeddings: DataFrame) -> DataFrame:
    """Round-1 centroids re-assembled to arrays: (c_id, c_emb)."""
    return kmeans_update(embeddings).groupBy(
        F.col("centroid_id").alias("c_id")
    ).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "coord"))),
            lambda s: s.coord,
        ).alias("c_emb")
    )


def ivf_assign_trained(
    embeddings: DataFrame, cents: DataFrame | None = None
) -> DataFrame:
    """IVF assignment against the TRAINED (round-1 Lloyd) centroids —
    the read side of the training loop: the same inline broadcast +
    dist2 fold as ``ivf_assign``, against k mean vectors instead of the
    k seeds. Rounded coords enter identically in both engines, and both
    fold the dot products sequentially, so dist2 hashes match.
    ``cents``: a pre-built (usually lineage-cut) ``_trained_centroids``
    relation, so a caller that ALSO reads the centroid table does not
    re-plan the whole Lloyd-round frontier per branch."""
    if cents is None:
        cents = _trained_centroids(embeddings)
    e = spread(embeddings).select("vec_id", _as_double("embedding").alias("e"))
    return _assign_inline(e, cents).select("vec_id", "centroid_id", "dist2")


IVF_ASSIGN_TRAINED_ORACLE = f"""
    WITH upd AS ({_KMEANS_UPDATE_DUCK}),
    cent AS (
        SELECT centroid_id AS c_id, list(coord ORDER BY pos) AS cemb
        FROM upd GROUP BY centroid_id
    )
    SELECT vec_id, centroid_id, dist2 FROM (
        SELECT e.vec_id, c.c_id AS centroid_id,
               round(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
                     - 2 * list_dot_product(e.embedding::DOUBLE[], c.cemb)
                     + list_dot_product(c.cemb, c.cemb), {ROUND_COS})
                   + CAST(0.0 AS DOUBLE) AS dist2,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   round(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
                         - 2 * list_dot_product(e.embedding::DOUBLE[], c.cemb)
                         + list_dot_product(c.cemb, c.cemb), {ROUND_COS}) ASC,
                   c.c_id ASC) AS rn
        FROM {_EMB} e CROSS JOIN cent c
    ) WHERE rn = 1
"""


def ivf_recall_report(embeddings: DataFrame) -> DataFrame:
    """ANN evaluation tooling: per-query recall@k of the IVF (nprobe=1)
    read path against the exact brute-force top-k — the measurement a
    production ANN deployment runs continuously to tune nlist/nprobe.
    Exact integer ppm (hits * 1e6 div k), so the report itself is
    hash-oracle-checked. Both inputs are the registered operators; the
    join ships only (query_id, cand_id) pairs — k rows per query.

    Both rankings derive from ONE lineage-cut ``_norm_base`` frontier:
    without it, the brute and IVF branches each re-plan the corpus scan
    + norm fold (4 scans of one file — the r11 duplicate-scan audit's
    `weak` class); with it, one materialization serves all four
    scoring sides (scan count pinned in tests/test_plans.py)."""
    b = cut_lineage(_norm_base(embeddings), eager=False)
    brute = topk_cosine(embeddings, base=b).select("query_id", "cand_id")
    approx = topk_cosine_ivf(embeddings, base=b).select(
        "query_id", "cand_id", F.lit(1).alias("hit")
    )
    return (
        brute.join(approx, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.expr(f"n_hits * 1000000 div {TOP_K}").alias("recall_ppm"),
        )
    )


IVF_RECALL_REPORT_ORACLE = f"""
    WITH brute AS ({TOPK_COSINE_ORACLE}),
    approx AS ({TOPK_COSINE_IVF_ORACLE})
    SELECT b.query_id,
           CAST(count(a.cand_id) AS BIGINT) AS n_hits,
           (count(a.cand_id) * 1000000) // {TOP_K} AS recall_ppm
    FROM brute b
    LEFT JOIN approx a ON a.query_id = b.query_id AND a.cand_id = b.cand_id
    GROUP BY b.query_id
"""


def q_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_recall_report(load_embeddings(spark, sf_dir))


QUANT_LEVELS = 255  # 8-bit scalar quantization codes per dimension


def _quant_params(e):
    """(min, scale) per vector, rounded to 6dp BEFORE any code math so
    both engines quantize from identical parameters. Scale floored at
    1e-6 (constant-vector guard, and keeps the rounded value nonzero)."""
    mn = round0(F.array_min(e), 6)
    rng = F.array_max(e) - F.array_min(e)
    scale = F.greatest(
        F.round(rng / QUANT_LEVELS, 6), F.lit(1e-6)
    )
    return mn, scale


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """Per-vector 8-bit scalar quantization — the storage-compression op
    of a vector index: 64 float32 components become 64 byte codes plus
    two doubles (min, scale), a ~4x raw shrink that at 100 TB is the
    difference between an index that fits executor memory and one that
    doesn't. Codes are clamped to [0, 255] and emitted as a CSV string
    so the cross-engine compare is dtype-unambiguous.

    Map-side only (per-row array math, no shuffle). The quantization
    parameters are rounded to 6dp FIRST and both engines compute codes
    from the rounded values, so the codes hash-match structurally.
    """
    e = _as_double("embedding")
    mn, scale = _quant_params(e)
    codes = F.transform(
        e,
        lambda x: F.least(
            F.greatest(F.round((x - mn) / scale).cast("int"), F.lit(0)),
            F.lit(QUANT_LEVELS),
        ),
    )
    return spread(embeddings).select(
        "vec_id",
        mn.alias("q_min"),
        scale.alias("q_scale"),
        F.concat_ws(",", codes.cast("array<string>")).alias("codes_csv"),
    )


_QMN_DUCK = "(round(list_min(embedding::DOUBLE[]), 6) + CAST(0.0 AS DOUBLE))"
_QSCALE_DUCK = (
    "greatest(round((list_max(embedding::DOUBLE[]) - list_min(embedding::DOUBLE[]))"
    f" / CAST({QUANT_LEVELS} AS DOUBLE), 6), CAST(0.000001 AS DOUBLE))"
)
_QCODES_DUCK = (
    "list_transform(embedding::DOUBLE[], x -> least(greatest("
    "CAST(round((x - mn) / scale) AS INT), 0), " + str(QUANT_LEVELS) + "))"
)

QUANTIZE_EMBEDDINGS_ORACLE = f"""
    WITH params AS (
        SELECT vec_id, embedding, {_QMN_DUCK} AS mn, {_QSCALE_DUCK} AS scale
        FROM {_EMB}
    )
    SELECT vec_id, mn AS q_min, scale AS q_scale,
           array_to_string({_QCODES_DUCK}, ',') AS codes_csv
    FROM params
"""


def quantized_recall_report(embeddings: DataFrame) -> DataFrame:
    """Recall@k of brute-force top-k over DEQUANTIZED vectors vs the
    exact float top-k — the measurement that justifies (or rejects) the
    4x compression for a given corpus. Same int-ppm report shape as
    ``ivf_recall_report``; dequantized component = min + code*scale."""
    # one lineage-cut corpus frontier feeds the dequantization AND the
    # brute ranking; the dequantized relation is cut too (its q/c
    # branches would otherwise re-plan the per-component quantize/
    # dequantize fold per side) — r12 audit stragglers
    bq = cut_lineage(_norm_base(embeddings), eager=False)
    e = F.col("emb")
    mn, scale = _quant_params(e)
    dq = F.transform(
        e,
        lambda x: mn
        + F.least(
            F.greatest(F.round((x - mn) / scale).cast("int"), F.lit(0)),
            F.lit(QUANT_LEVELS),
        ).cast("double")
        * scale,
    )
    deq = cut_lineage(
        bq.select("vec_id", "label", dq.alias("demb")), eager=False
    )

    def _norm(df, prefix):
        return df.select(
            F.col("vec_id").alias(f"{prefix}_id"),
            F.col("demb").alias(f"{prefix}_emb"),
            F.sqrt(_dot(F.col("demb"), F.col("demb"))).alias(f"{prefix}_norm"),
        )

    q = _norm(deq.filter(F.col("vec_id") < N_QUERIES), "query")
    c = _norm(deq, "cand")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            round0(
                _dot(F.col("query_emb"), F.col("cand_emb"))
                / (F.col("query_norm") * F.col("cand_norm")),
                ROUND_COS,
            ).alias("cosine"),
        )
    )
    approx = _rank_topk(scored).select(
        "query_id", "cand_id", F.lit(1).alias("hit")
    )
    brute = topk_cosine(embeddings, base=bq).select("query_id", "cand_id")
    return (
        brute.join(approx, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.expr(f"n_hits * 1000000 div {TOP_K}").alias("recall_ppm"),
        )
    )


_DEQ_DUCK = (
    "list_transform(embedding::DOUBLE[], x -> mn + CAST(least(greatest("
    "CAST(round((x - mn) / scale) AS INT), 0), "
    + str(QUANT_LEVELS)
    + ") AS DOUBLE) * scale)"
)

QUANTIZED_RECALL_REPORT_ORACLE = f"""
    WITH params AS (
        SELECT vec_id, embedding, {_QMN_DUCK} AS mn, {_QSCALE_DUCK} AS scale
        FROM {_EMB}
    ),
    deq AS (SELECT vec_id, {_DEQ_DUCK} AS demb FROM params),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               round(list_dot_product(q.demb, c.demb)
                     / (sqrt(list_dot_product(q.demb, q.demb))
                        * sqrt(list_dot_product(c.demb, c.demb))), {ROUND_COS})
                   + CAST(0.0 AS DOUBLE) AS cosine
        FROM deq q JOIN deq c ON c.vec_id != q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ),
    approx AS (
        SELECT query_id, cand_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, cand_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {TOP_K}
    ),
    brute AS ({TOPK_COSINE_ORACLE})
    SELECT b.query_id,
           CAST(count(a.cand_id) AS BIGINT) AS n_hits,
           (count(a.cand_id) * 1000000) // {TOP_K} AS recall_ppm
    FROM brute b
    LEFT JOIN approx a ON a.query_id = b.query_id AND a.cand_id = b.cand_id
    GROUP BY b.query_id
"""


SEMDEDUP_COS = 0.4  # keep-threshold; fixture vectors are near-orthogonal
SEM_NLIST = 16      # ~sqrt(n) clusters: pair volume is Σ cluster², so the
                    # cluster count — not the threshold — is the cost dial
                    # (nlist=4 measured 4.7s at sf0.1; 16 cuts pairs ~4x)


def semantic_dedup(embeddings: DataFrame) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster, then prune
    within-cluster near-duplicates (Abbas et al. 2023 — the public
    SemDeDup recipe: k-means the corpus, drop all but one of each
    intra-cluster cosine-near group).

    Plan shape: nearest-centroid assignment (broadcast nlist-row
    centroid table, one corpus scan), then a SELF equi-join on
    ``centroid_id`` restricted to ``vec_a < vec_b`` — pair volume is
    sum of per-cluster squares, never corpus², and at 100 TB nlist
    grows ~sqrt(n) so clusters stay bounded. A vector is DROPPED when
    some lower-id cluster-mate sits above the cosine threshold (the
    deterministic stand-in for SemDeDup's keep-one-per-group); kept
    rows carry their max lower-mate cosine (-1 when the vector has no
    lower cluster-mate) so the decision is auditable.

    The member relation ``m`` feeds THREE readers (both pair sides and
    the final keep projection), so it is lineage-cut — as is the
    ``_norm_base`` frontier under it — turning the r11 audit's 9
    corpus scans into one materialization (pinned in
    tests/test_plans.py)."""
    b = cut_lineage(_norm_base(embeddings), eager=False)
    # inline assignment (r17): each row keeps (e, nrm) next to its
    # computed cell, so the old assignment join back on vec_id is gone
    m = cut_lineage(
        _assign_inline(
            b.select("vec_id", F.col("emb").alias("e"), "nrm"),
            b.filter(F.col("vec_id") < SEM_NLIST).select(
                F.col("vec_id").alias("c_id"), F.col("emb").alias("c_emb")
            ),
        ).select("vec_id", "centroid_id", "e", "nrm"),
        eager=False,
    )
    lo = m.select(
        F.col("centroid_id").alias("g"),
        F.col("vec_id").alias("lo_id"),
        F.col("e").alias("lo_e"),
        F.col("nrm").alias("lo_nrm"),
    )
    hi = m.select(
        F.col("centroid_id").alias("g"),
        F.col("vec_id").alias("hi_id"),
        F.col("e").alias("hi_e"),
        F.col("nrm").alias("hi_nrm"),
    )
    pair_cos = (
        lo.join(hi, "g")
        .filter(F.col("lo_id") < F.col("hi_id"))
        .select(
            F.col("hi_id").alias("vec_id"),
            round0(
                _dot_unrolled(F.col("lo_e"), F.col("hi_e"))
                / (F.col("lo_nrm") * F.col("hi_nrm")),
                ROUND_COS,
            ).alias("cos"),
        )
        .groupBy("vec_id")
        .agg(F.max("cos").alias("max_lower_cos"))
    )
    return (
        m.join(pair_cos, "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            F.coalesce("max_lower_cos", F.lit(-1.0)).alias("max_lower_cos"),
            (F.coalesce("max_lower_cos", F.lit(-1.0)) < F.lit(SEMDEDUP_COS))
            .cast("int")
            .alias("is_kept"),
        )
    )


SEMANTIC_DEDUP_ORACLE = f"""
    WITH assign AS ({_assign_duck(SEM_NLIST)}),
    members AS (
        SELECT e.vec_id, a.centroid_id, e.embedding
        FROM {_EMB} e JOIN assign a ON a.vec_id = e.vec_id
    ),
    pair_cos AS (
        SELECT c.vec_id,
               max({_COS_DUCK.replace('q.', 'q2.')}) AS max_lower_cos
        FROM members q2
        JOIN members c
          ON c.centroid_id = q2.centroid_id AND q2.vec_id < c.vec_id
        GROUP BY c.vec_id
    )
    SELECT m.vec_id, m.centroid_id,
           CAST(coalesce(p.max_lower_cos, -1.0) AS DOUBLE) AS max_lower_cos,
           CAST(coalesce(p.max_lower_cos, -1.0) < {SEMDEDUP_COS} AS INT) AS is_kept
    FROM members m LEFT JOIN pair_cos p ON p.vec_id = m.vec_id
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semantic_dedup(load_embeddings(spark, sf_dir))


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quantize_embeddings(load_embeddings(spark, sf_dir))


def q_quantized_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quantized_recall_report(load_embeddings(spark, sf_dir))


def q_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans_update(load_embeddings(spark, sf_dir))


def q_ivf_assign_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_assign_trained(load_embeddings(spark, sf_dir))


def cluster_quality_report(embeddings: DataFrame) -> DataFrame:
    """Clustering-quality audit over the trained coarse quantizer — the
    compactness-vs-separation report (a Davies-Bouldin-style signal) a
    deployment checks before trusting IVF routing: per cluster, member
    count, total/average within-cluster squared distance, the squared
    distance to the nearest OTHER centroid, and a ``compact`` flag
    (avg within-distance < nearest-neighbor-centroid distance).

    All distance sums are int64 MICRO units (dist2 is already rounded
    to 6dp identically in both engines by ``ivf_assign_trained``;
    summing the 1e6-scaled integers sidesteps float accumulation-order
    drift — the hierarchical_rollups trick). The centroid-pair
    separation scan is k² rows with k = nlist (config-bounded), behind
    a broadcast nested-loop on a k-row side.

    The trained-centroid table is read by BOTH the re-assignment and
    the separation branch; lineage-cutting it materializes the whole
    Lloyd-round frontier (assign → posexplode → mean → re-assemble)
    once instead of planning it into each branch (r11 audit: 10 corpus
    scans; pinned in tests/test_plans.py).
    """
    cents = cut_lineage(_trained_centroids(embeddings), eager=False)
    assign = ivf_assign_trained(embeddings, cents=cents)
    per = assign.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.round(F.col("dist2") * 1000000).cast("long")).alias("inertia_micro"),
    )
    other = cents.select(
        F.col("c_id").alias("o_id"), F.col("c_emb").alias("o_emb")
    )
    sep = (
        cents.crossJoin(F.broadcast(other))
        .filter(F.col("c_id") != F.col("o_id"))
        .select(
            "c_id",
            F.round(
                (
                    _dot(F.col("c_emb"), F.col("c_emb"))
                    - 2 * _dot(F.col("c_emb"), F.col("o_emb"))
                    + _dot(F.col("o_emb"), F.col("o_emb"))
                )
                * 1000000
            )
            .cast("long")
            .alias("pair_micro"),
        )
        .groupBy("c_id")
        .agg(F.min("pair_micro").alias("nn_centroid_dist2_micro"))
    )
    return (
        per.join(sep, per.centroid_id == sep.c_id)
        .select(
            "centroid_id",
            "n_members",
            "inertia_micro",
            F.expr("inertia_micro DIV n_members").alias("avg_dist2_micro"),
            "nn_centroid_dist2_micro",
            (
                F.expr("inertia_micro DIV n_members")
                < F.col("nn_centroid_dist2_micro")
            ).alias("compact"),
        )
    )


CLUSTER_QUALITY_ORACLE = f"""
    WITH upd AS ({_KMEANS_UPDATE_DUCK}),
    cent AS (
        SELECT centroid_id AS c_id, list(coord ORDER BY pos) AS cemb
        FROM upd GROUP BY centroid_id
    ),
    assign AS ({IVF_ASSIGN_TRAINED_ORACLE}),
    per AS (
        SELECT centroid_id, count(*) AS n_members,
               CAST(sum(CAST(round(dist2 * 1000000) AS BIGINT)) AS BIGINT)
                   AS inertia_micro
        FROM assign GROUP BY centroid_id
    ),
    sep AS (
        SELECT a.c_id,
               min(CAST(round((list_dot_product(a.cemb, a.cemb)
                               - 2 * list_dot_product(a.cemb, b.cemb)
                               + list_dot_product(b.cemb, b.cemb)) * 1000000)
                        AS BIGINT)) AS nn_centroid_dist2_micro
        FROM cent a JOIN cent b ON a.c_id <> b.c_id
        GROUP BY a.c_id
    )
    SELECT p.centroid_id, p.n_members, p.inertia_micro,
           p.inertia_micro // p.n_members AS avg_dist2_micro,
           s.nn_centroid_dist2_micro,
           (p.inertia_micro // p.n_members) < s.nn_centroid_dist2_micro AS compact
    FROM per p JOIN sep s ON p.centroid_id = s.c_id
"""


def q_cluster_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cluster_quality_report(load_embeddings(spark, sf_dir))


def q_topk_cosine_ivf_probe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk_cosine_ivf_probe2(load_embeddings(spark, sf_dir))


def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_assign(load_embeddings(spark, sf_dir))


def q_topk_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk_cosine_ivf(load_embeddings(spark, sf_dir))


def q_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk_cosine(load_embeddings(spark, sf_dir))


def q_topk_cosine_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk_cosine_blocked(load_embeddings(spark, sf_dir))


def q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_buckets(load_embeddings(spark, sf_dir))


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_neardup(load_embeddings(spark, sf_dir))


def vband_geometry_report(embeddings: DataFrame) -> DataFrame:
    """Band-geometry dial report for the sign-LSH near-dup pipeline: one
    row per geometry — the 4x4 small-corpus default and the 2x8 scale
    shape (``WIDE_VBANDS``) — with the capped bucket stats and the
    verified pair count. ``n_candidates`` is the quantity the r10 scale
    curve measured growing ~N^2 under the 4-bit bands on a 10x random
    corpus (23x wall time) and ~linearly under 8-bit bands; registering
    both geometries as hash-checked numbers pins the cost/recall dial
    the way the IVF probe reports pin theirs — including the honest
    recall cost (the wide geometry finds fewer of the fixture's
    weak-cosine pairs)."""
    b = cut_lineage(_norm_base(embeddings), eager=False)
    # the 16 plane dots run ONCE for both geometries (r18): the sign code
    # is geometry-independent, and each geometry's band values derive
    # from it by shift/mask (_code_band_rows) — previously each geometry
    # materialized its own band rows with a full 16-dot corpus fold
    code = cut_lineage(_sign_code(b), eager=False)
    rows = []
    for g in (N_VBANDS, WIDE_VBANDS):
        # ONE bucket relation per geometry feeds both the stats aggregate
        # and the verified-pair count (building it twice doubles the
        # banding dot-products — measured ~2s of the report's cost).
        # The bucket relation is ALSO lineage-cut: without the cut its
        # subtree (band derivation + cap anti-join) re-plans into each
        # of its two readers, and the shared corpus frontier re-plans
        # into every geometry branch — 16 scans of one file in the r11
        # audit; post-cut the corpus materializes once (pinned in
        # tests/test_plans.py).
        buckets = cut_lineage(
            _vband_buckets(embeddings, g, base=b, code=code), eager=False
        )
        stats = buckets.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.coalesce(
                F.sum(F.expr("size(ds) * (size(ds) - 1) / 2")).cast("long"), F.lit(0)
            ).alias("n_candidates"),
            F.coalesce(F.max(F.size("ds")), F.lit(0)).alias("max_bucket"),
        )
        pairs = _verified_pairs(embeddings, buckets, base=b).agg(
            F.count(F.lit(1)).alias("n_pairs")
        )
        rows.append(
            stats.crossJoin(F.broadcast(pairs)).select(
                F.lit(g).alias("n_bands"),
                "n_buckets",
                "n_candidates",
                "max_bucket",
                "n_pairs",
            )
        )
    return rows[0].unionByName(rows[1])


def q_vband_geometry_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vband_geometry_report(load_embeddings(spark, sf_dir))


RP_DIM = 16   # Johnson-Lindenstrauss target dimensionality (64 -> 16)
RP_SEED = 13  # distinct from the LSH planes seed


def _rp_matrix() -> list[list[float]]:
    """Deterministic ±1 projection matrix (Achlioptas-style), identical
    literals in Spark and the DuckDB oracle."""
    rng = random.Random(RP_SEED)
    return [[float(rng.choice((-1, 1))) for _ in range(DIM)] for _ in range(RP_DIM)]


def rp_project(
    embeddings: DataFrame, base: DataFrame | None = None
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: 64-d -> 16-d with a ±1
    matrix scaled by 1/sqrt(RP_DIM) — the 4x distance-preserving
    compression used before expensive pairwise stages (clustering,
    near-dup, ANN index build).

    The matrix lives in the PLAN as literal arrays (nothing broadcast,
    nothing collected); the projection is a map-side fold per row, so at
    100 TB this pipelines into the scan. sqrt(16) = 4 keeps the scale
    factor float-exact; components round to 6 dp for the cross-engine
    hash.
    """
    pre = (
        base.select("vec_id", "label", F.col("emb").alias("e"))
        if base is not None
        else spread(embeddings).select(
            "vec_id", "label", _as_double("embedding").alias("e")
        )
    )
    cols = [
        round0(
            _dot(F.col("e"), F.array(*[F.lit(v) for v in weights])) / 4.0, 6
        ).alias(f"rp_{k}")
        for k, weights in enumerate(_rp_matrix())
    ]
    return pre.select("vec_id", "label", *cols)


def rp_project_oracle() -> str:
    cols = []
    for k, weights in enumerate(_rp_matrix()):
        arr = "[" + ", ".join(repr(v) for v in weights) + "]"
        cols.append(
            f"(round(list_dot_product(embedding::DOUBLE[], {arr}::DOUBLE[])"
            f" / 4.0, 6) + CAST(0.0 AS DOUBLE)) AS rp_{k}"
        )
    return f"SELECT vec_id, label, {', '.join(cols)} FROM {_EMB}"


def _rp_vec_duck() -> str:
    comps = []
    for weights in _rp_matrix():
        arr = "[" + ", ".join(repr(v) for v in weights) + "]"
        comps.append(
            f"(round(list_dot_product(embedding::DOUBLE[], {arr}::DOUBLE[]) / 4.0, 6)"
            f" + CAST(0.0 AS DOUBLE))"
        )
    return "[" + ", ".join(comps) + "]"


def rp_recall_report(embeddings: DataFrame) -> DataFrame:
    """Recall@k of top-k cosine run in the 16-d projected space against
    the exact 64-d brute force — the dimensionality-reduction quality
    dial (the JL analogue of ``ivf_recall_report``). Integer ppm, fully
    hash-oracle-checked.

    Ranking happens on 6-dp-rounded projected components, so the
    candidate order is a deterministic function of oracle-identical
    values in both engines.
    """
    # NO lineage cut here, deliberately (r12 re-audit adjudication): the
    # raw scan count of 4 is NOT a duplicate frontier — the query-side
    # branches push their vec_id filter BELOW the projection/norm folds
    # (5-row work), so the only full-corpus projection already runs
    # once, and a cut (measured both proj-only and full-base forms)
    # only adds a materialization barrier: 1.97 s -> 2.9-3.4 s at sf0.1.
    proj = rp_project(embeddings).select(
        "vec_id",
        F.array(*[F.col(f"rp_{k}") for k in range(RP_DIM)]).alias("r"),
    )
    q = proj.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("r").alias("qr"),
        F.sqrt(_dot(F.col("r"), F.col("r"), RP_DIM)).alias("qn"),
    )
    scored = (
        proj.select(
            F.col("vec_id").alias("cand_id"),
            F.col("r").alias("cr"),
            F.sqrt(_dot(F.col("r"), F.col("r"), RP_DIM)).alias("cn"),
        )
        .crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            round0(
                _dot(F.col("qr"), F.col("cr"), RP_DIM) / (F.col("qn") * F.col("cn")),
                ROUND_COS,
            ).alias("cosine"),
        )
    )
    approx = _rank_topk(scored).select(
        "query_id", "cand_id", F.lit(1).alias("hit")
    )
    brute = topk_cosine(embeddings).select("query_id", "cand_id")
    return (
        brute.join(approx, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.expr(f"n_hits * 1000000 div {TOP_K}").alias("recall_ppm"),
        )
    )


def rp_recall_report_oracle() -> str:
    return f"""
    WITH rp AS (SELECT vec_id, {_rp_vec_duck()} AS r FROM {_EMB}),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               round(list_dot_product(q.r, c.r)
                     / (sqrt(list_dot_product(q.r, q.r))
                        * sqrt(list_dot_product(c.r, c.r))), {ROUND_COS})
                   + CAST(0.0 AS DOUBLE) AS cosine
        FROM rp q JOIN rp c ON c.vec_id != q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, cand_id ASC) AS rank
        FROM scored
    ),
    approx AS (SELECT query_id, cand_id FROM ranked WHERE rank <= {TOP_K}),
    brute AS ({TOPK_COSINE_ORACLE})
    SELECT b.query_id,
           CAST(count(a.cand_id) AS BIGINT) AS n_hits,
           (count(a.cand_id) * 1000000) // {TOP_K} AS recall_ppm
    FROM brute b
    LEFT JOIN approx a ON a.query_id = b.query_id AND a.cand_id = b.cand_id
    GROUP BY b.query_id
"""


def q_rp_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rp_project(load_embeddings(spark, sf_dir))


def q_rp_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rp_recall_report(load_embeddings(spark, sf_dir))


def modality_agreement_report(docs: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Cross-modal dedup agreement: every verified TEXT near-dup pair
    (exact shingle Jaccard, from ``ngram_jaccard_pairs``) scored with the
    pair's EMBEDDING cosine — the audit that tells you whether lexical
    and semantic dedup would keep/drop the same pairs, i.e. whether
    running only the cheaper lexical pass loses semantic duplicates.

    The fixture keys line up (``doc_id == vec_id``), mirroring a real
    corpus where embeddings are derived per document. Plan: the pair
    table is cap-bounded (never corpus²); it joins the doc-keyed
    embedding relation twice — both keyed joins, nothing corpus-scale
    broadcast. Cosine rounds at 6dp, agreement thresholds on the rounded
    value (engine-deterministic).
    """
    from .dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs)
    e = embeddings.select(
        "vec_id",
        _as_double("embedding").alias("emb"),
    )
    e = e.select(
        "vec_id", "emb", F.sqrt(_dot(F.col("emb"), F.col("emb"))).alias("nrm")
    )
    a = e.select(
        F.col("vec_id").alias("doc_a"),
        F.col("emb").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = e.select(
        F.col("vec_id").alias("doc_b"),
        F.col("emb").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            round0(
                _dot_unrolled(F.col("emb_a"), F.col("emb_b"))
                / (F.col("nrm_a") * F.col("nrm_b")),
                ROUND_COS,
            ).alias("cosine"),
        )
        .withColumn("semantic_agrees", F.col("cosine") >= NEARDUP_COS)
    )


def modality_agreement_report_oracle() -> str:
    from .dedup import ngram_jaccard_oracle

    return f"""
    WITH pairs AS ({ngram_jaccard_oracle()})
    SELECT p.doc_a, p.doc_b, p.jaccard,
           round(list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]))),
                 {ROUND_COS}) + CAST(0.0 AS DOUBLE) AS cosine,
           round(list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]))),
                 {ROUND_COS}) >= {NEARDUP_COS} AS semantic_agrees
    FROM pairs p
    JOIN {_EMB} ea ON ea.vec_id = p.doc_a
    JOIN {_EMB} eb ON eb.vec_id = p.doc_b
"""


def q_modality_agreement_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return modality_agreement_report(
        load_table(spark, sf_dir, "documents"), load_embeddings(spark, sf_dir)
    )


# --------------------------------------------------------------------------
# Embedding drift report (per-source domain shift)
# --------------------------------------------------------------------------


def embedding_drift_report(docs: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Per-source embedding-space drift: the cosine between each source's
    centroid and the corpus centroid — the domain-shift dial a mixture
    builder reads before re-weighting sources (a source whose centroid
    points away from the corpus is contributing a different distribution,
    deliberately or because its scrape went bad).

    Centroids are built in long form exactly like ``kmeans_update`` (one
    posexplode scan, hash aggregate per (source, pos) — k×dim cells of
    partial sums, never vectors, through the shuffle), coords rounded at
    {ROUND_COS}dp so identical doubles enter both engines, then
    re-assembled and compared with the sequential ``_dot`` fold. The
    corpus centroid is ONE broadcast row; sources×dim bounds everything
    after the single corpus-scale scan.
    """
    tagged = (
        spread(embeddings)
        # NULL-embedding rows carry no signal for a centroid and would
        # diverge cross-engine (posexplode emits nothing for NULL, the
        # oracle's generate_series join keeps the row) — excluded on
        # BOTH sides; n_docs therefore counts embedded docs. Arrays are
        # DIM-wide by the module-wide contract (same generate_series
        # indexing as every other oracle here).
        .filter(F.col("embedding").isNotNull())
        .join(docs.select(F.col("doc_id").alias("vec_id"), "source"), "vec_id")
    )
    # materialized once (r17): the source-centroid, corpus-centroid and
    # per-source count branches all read this scan+join frontier, and
    # Catalyst re-planned it per branch (12 parquet scans in the before
    # plan; guide §2.4 duplicated subtrees)
    tagged = cut_lineage(tagged, eager=False)
    cells = tagged.select(
        "source", F.posexplode(_as_double("embedding")).alias("pos", "v")
    )
    src_cells = cells.groupBy("source", "pos").agg(
        round0(F.avg("v"), ROUND_COS).alias("coord")
    )
    corpus_cells = cells.groupBy("pos").agg(
        round0(F.avg("v"), ROUND_COS).alias("coord")
    )
    assemble = lambda df, keys: df.groupBy(*keys).agg(  # noqa: E731
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "coord"))), lambda s: s.coord
        ).alias("emb")
    )
    src_cent = assemble(src_cells, ["source"]).withColumnRenamed("emb", "s_emb")
    corpus_cent = (
        assemble(corpus_cells.withColumn("_g", F.lit(1)), ["_g"])
        .withColumnRenamed("emb", "c_emb")
        .drop("_g")
    )
    counts = tagged.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    cos = round0(
        _dot(F.col("s_emb"), F.col("c_emb"))
        / (
            F.sqrt(_dot(F.col("s_emb"), F.col("s_emb")))
            * F.sqrt(_dot(F.col("c_emb"), F.col("c_emb")))
        ),
        ROUND_COS,
    )
    return (
        src_cent.crossJoin(F.broadcast(corpus_cent))
        .join(counts, "source")
        .select("source", "n_docs", cos.alias("centroid_cosine"))
    )


def embedding_drift_report_oracle() -> str:
    return f"""
        WITH tagged AS (
            SELECT d.source, e.vec_id, e.embedding
            FROM {_EMB} e JOIN documents d ON d.doc_id = e.vec_id
            WHERE e.embedding IS NOT NULL
        ),
        cells AS (
            SELECT source, p.pos, embedding[p.pos + 1]::DOUBLE AS v
            FROM tagged CROSS JOIN
                 (SELECT generate_series AS pos FROM generate_series(0, {DIM - 1})) p
        ),
        src AS (
            SELECT source, pos,
                   round(avg(v), {ROUND_COS}) + CAST(0.0 AS DOUBLE) AS coord
            FROM cells GROUP BY 1, 2
        ),
        corpus AS (
            SELECT pos,
                   round(avg(v), {ROUND_COS}) + CAST(0.0 AS DOUBLE) AS coord
            FROM cells GROUP BY 1
        ),
        src_c AS (
            SELECT source, list(coord ORDER BY pos) AS s_emb FROM src GROUP BY 1
        ),
        corpus_c AS (SELECT list(coord ORDER BY pos) AS c_emb FROM corpus),
        counts AS (SELECT source, count(*) AS n_docs FROM tagged GROUP BY 1)
        SELECT s.source, n.n_docs,
               round(list_dot_product(s_emb, c_emb)
                     / (sqrt(list_dot_product(s_emb, s_emb))
                        * sqrt(list_dot_product(c_emb, c_emb))),
                     {ROUND_COS}) + CAST(0.0 AS DOUBLE) AS centroid_cosine
        FROM src_c s CROSS JOIN corpus_c JOIN counts n ON n.source = s.source
    """


def q_embedding_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_drift_report(
        load_table(spark, sf_dir, "documents"), load_embeddings(spark, sf_dir)
    )


# --------------------------------------------------------------------------
# Filtered vector search (metadata-constrained top-k)
# --------------------------------------------------------------------------

FILTER_LANG = "en"  # the metadata predicate for the filtered-search family


def topk_cosine_filtered(
    docs: DataFrame,
    embeddings: DataFrame,
    base: DataFrame | None = None,
    keep: DataFrame | None = None,
) -> DataFrame:
    """Metadata-constrained exact top-k: each query's nearest neighbors
    among only the candidates whose document passes the filter
    (lang = FILTER_LANG) — PRE-filtering, the correct formulation of
    filtered vector search (retrieval systems that filter AFTER a
    global top-k silently return fewer/wrong results when the predicate
    is selective; ``filtered_topk_recall_report`` quantifies exactly
    that loss).

    Plan: the filter is a keyed semi-join applied to the candidate side
    BEFORE scoring, so the cosine work is |queries| × |filtered|, never
    |queries| × corpus; queries themselves are not required to pass the
    filter. Same scoring/rank/tie-break as ``topk_cosine``.

    ``base``/``keep``: pre-built (usually lineage-cut) ``_norm_base``
    and filter-id relations, for callers that fan several rankings off
    the same corpus (``filtered_topk_recall_report``).
    """
    if keep is None:
        keep = docs.filter(F.col("lang") == FILTER_LANG).select(
            F.col("doc_id").alias("vec_id")
        )
    if base is not None:
        q = _prefixed(base.filter(F.col("vec_id") < N_QUERIES), "query")
        c = _prefixed(base.join(keep, "vec_id", "left_semi"), "cand")
    else:
        q = _with_norm(embeddings.filter(F.col("vec_id") < N_QUERIES), "query")
        c = _with_norm(spread(embeddings).join(keep, "vec_id", "left_semi"), "cand")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            round0(
                _dot(F.col("query_emb"), F.col("cand_emb"))
                / (F.col("query_norm") * F.col("cand_norm")),
                ROUND_COS,
            ).alias("cosine"),
        )
    )
    return _rank_topk(scored)


TOPK_COSINE_FILTERED_ORACLE = f"""
    WITH keep AS (SELECT doc_id AS vec_id FROM documents WHERE lang = '{FILTER_LANG}'),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {_COS_DUCK} AS cosine
        FROM {_EMB} q
        JOIN {_EMB} c ON c.vec_id != q.vec_id
        JOIN keep k ON k.vec_id = c.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC
               ) AS rank
        FROM scored
    )
    SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
"""


def q_topk_cosine_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk_cosine_filtered(
        load_table(spark, sf_dir, "documents"), load_embeddings(spark, sf_dir)
    )


def filtered_topk_recall_report(docs: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Pre-filter vs post-filter comparison, per query: how much of the
    TRUE filtered top-k does "take the global top-k, then filter" keep?
    ``post_survivors`` (global winners passing the filter, <= k) and
    ``overlap_ppm`` (their intersection with the true filtered top-k) —
    the measurement that justifies pushing predicates INTO the index
    scan instead of filtering results (selective predicate =>
    post-filtering returns almost nothing).

    Both rankings reuse the exact scorers above; the comparison is two
    bounded per-query sets joined on (query, cand), all-integer output.

    One lineage-cut ``_norm_base`` frontier feeds both rankings and one
    lineage-cut filter-id set feeds both the pre- and post-filter —
    without the cuts each branch re-plans the corpus scan + norm fold
    (8 embedding + 4 document scans in the r11 audit; pinned in
    tests/test_plans.py).
    """
    b = cut_lineage(_norm_base(embeddings), eager=False)
    keep_ids = cut_lineage(
        docs.filter(F.col("lang") == FILTER_LANG).select("doc_id"), eager=False
    )
    true_k = topk_cosine_filtered(
        docs,
        embeddings,
        base=b,
        keep=keep_ids.select(F.col("doc_id").alias("vec_id")),
    ).select("query_id", "cand_id")
    keep = keep_ids.select(F.col("doc_id").alias("cand_id"))
    post_k = topk_cosine(embeddings, base=b).join(
        keep, "cand_id", "left_semi"
    ).select("query_id", "cand_id")
    hits = true_k.join(post_k, ["query_id", "cand_id"], "left_semi")
    per_q = (
        true_k.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_true"))
        .join(
            post_k.groupBy("query_id").agg(F.count(F.lit(1)).alias("post_survivors")),
            "query_id",
            "left",
        )
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")),
            "query_id",
            "left",
        )
    )
    return per_q.select(
        "query_id",
        "n_true",
        F.coalesce("post_survivors", F.lit(0)).alias("post_survivors"),
        F.expr("coalesce(n_hit, 0) * 1000000 div n_true").alias("overlap_ppm"),
    )


def filtered_topk_recall_report_oracle() -> str:
    return f"""
        WITH true_k AS (
            SELECT query_id, cand_id FROM ({TOPK_COSINE_FILTERED_ORACLE})
        ),
        global_k AS (
            SELECT query_id, cand_id FROM ({TOPK_COSINE_ORACLE})
        ),
        keep AS (SELECT doc_id FROM documents WHERE lang = '{FILTER_LANG}'),
        post_k AS (
            SELECT g.query_id, g.cand_id FROM global_k g
            JOIN keep k ON k.doc_id = g.cand_id
        ),
        per_q AS (
            SELECT t.query_id,
                   count(*) AS n_true,
                   (SELECT count(*) FROM post_k p WHERE p.query_id = t.query_id)
                       AS post_survivors,
                   sum(CASE WHEN EXISTS (
                       SELECT 1 FROM post_k p
                       WHERE p.query_id = t.query_id AND p.cand_id = t.cand_id
                   ) THEN 1 ELSE 0 END) AS n_hit
            FROM true_k t GROUP BY t.query_id
        )
        SELECT query_id, n_true,
               CAST(post_survivors AS BIGINT) AS post_survivors,
               CAST(n_hit * 1000000 // n_true AS BIGINT) AS overlap_ppm
        FROM per_q
    """


def q_filtered_topk_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return filtered_topk_recall_report(
        load_table(spark, sf_dir, "documents"), load_embeddings(spark, sf_dir)
    )
