"""Text-pipeline column builders shared by dedup / text-analysis operators.

Cross-engine hash parity: MinHash/SimHash need a hash function that is
bit-identical in Spark and in the DuckDB oracle. Spark's ``hash``/
``xxhash64`` don't exist in DuckDB, so we derive a 60-bit integer from
``md5`` (available and identical in both): the first 15 hex chars parsed as
an integer. 60 bits keeps it inside a signed BIGINT in both engines.

Seeded variants h_s(x) = hash60(seed || '|' || x) give the k independent
hash functions MinHash needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# English stopword mini-set used by quality scoring / language-ID heuristics.
STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "for", "on", "with")


def hash60_spark_sql(expr: str) -> str:
    """60-bit md5-derived hash, Spark SQL dialect."""
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def hash60_duck_sql(expr: str) -> str:
    """The identical hash in DuckDB SQL (hex-literal cast)."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def ln_u60_exact_sql(h: str, dialect: str) -> str:
    """ENGINE-EXACT ``ln((h+1) / 2^60)`` for a 60-bit hash column ``h`` —
    built from exactly-rounded IEEE-754 double ops only (+ - * / and a
    correctly-rounded decimal literal), never libm ``ln``/``log``/``pow``,
    so the resulting double is BIT-IDENTICAL in Spark and DuckDB and an
    ORDER BY over it can never flip between the engines (r9 verdict #3:
    ``weighted_sample``'s cross-libm ulp coin-flip).

    Construction (every step exactly rounded, hence deterministic):
      e  = floor(log2(h+1))    -- integer-exact: length(bin(h+1)) - 1
      m  = double(h+1) / 2^e   -- 2^e via integer shift-left, cast exact;
                                  double(h+1) rounds once (monotone)
      z  = (m-1)/(m+1)         -- z in [0, 1/3] for m in [1, 2)
      ln(m) ~= 2z(1 + z^2/3 + z^4/5 + ... + z^12/13)   -- atanh series,
                                  |truncation| < 5e-9, monotone in m
      ln(u) = ln(m) + (e-60) * LN2   -- LN2 as an exact double literal

    The ~5e-9 truncation error only perturbs the IMPLIED sampling
    distribution infinitesimally (the uniform u is itself hash-derived);
    what matters is that both engines compute the identical bits.
    tests/test_textops.py pins Spark-vs-DuckDB bit equality, including
    adversarial h at power-of-two boundaries.
    """
    hp1 = f"({h} + 1)"
    e = f"(length(bin({hp1})) - 1)"
    if dialect == "spark":
        shift = f"CAST(shiftleft(CAST(1 AS BIGINT), {e}) AS DOUBLE)"
    elif dialect == "duck":
        shift = f"CAST((CAST(1 AS BIGINT) << {e}) AS DOUBLE)"
    else:
        raise ValueError(f"unknown dialect: {dialect}")
    # scientific-notation literals (2e0, not 2.0): BOTH engines parse a
    # plain decimal literal as DECIMAL, whose division truncates at a
    # dialect-specific scale — 1.0/3.0 differs between them at ~1e-9.
    # `Ne0` literals are DOUBLE in Spark and DuckDB alike, keeping every
    # op an exactly-rounded IEEE double op.
    m = f"(CAST({hp1} AS DOUBLE) / {shift})"
    z = f"(({m} - 1e0) / ({m} + 1e0))"
    z2 = f"({z} * {z})"
    poly = (
        f"(2e0 * {z} * (1e0 + {z2} * ((1e0/3e0) + {z2} * ((1e0/5e0) + "
        f"{z2} * ((1e0/7e0) + {z2} * ((1e0/9e0) + {z2} * ((1e0/11e0) + "
        f"{z2} * (1e0/13e0))))))))"
    )
    return f"({poly} + CAST({e} - 60 AS DOUBLE) * 6.931471805599453e-1)"


# lower() is engine-divergent on exactly TWO unconditional cases in the
# root locale (probed cross-engine, r13): U+0130 İ (Java's SpecialCasing
# full mapping -> 'i' + U+0307 combining dot; utf8proc's simple mapping ->
# 'i') and word-final Σ (Java applies the contextual final-sigma rule ->
# ς; utf8proc maps unconditionally -> σ). Everything else — ß, titlecase
# digraphs like ǅ, the whole simple-mapping table — already agrees.
# Pre-folding those three code points (İ->i, Σ->σ, ς->σ, the last so
# medial and final sigma unify) makes lower() ENGINE-IDENTICAL over all
# of Unicode; translate() is codepoint-based in both engines (verified
# byte-for-byte on mixed İ/Σ/ς input). Every content-casefold site goes
# through these two fragments so the contract has one definition.
CASEFOLD_SRC = "İΣς"  # İ Σ ς
CASEFOLD_DST = "iσσ"  # i σ σ
# every consumer f-string-interpolates the fold set into SQL string
# literals (both dialects), so the set must never contain SQL quote or
# escape characters — a future addition that does would silently
# produce broken SQL (r14 advice)
assert not set("'\"\\") & set(CASEFOLD_SRC + CASEFOLD_DST)
# back-compat aliases (pre-r15 private names)
_CASEFOLD_SRC = CASEFOLD_SRC
_CASEFOLD_DST = CASEFOLD_DST


def fold_lower(text: Column) -> Column:
    """Engine-identical lowercase: pre-fold İ/Σ/ς, then ``lower``."""
    return F.lower(F.translate(text, CASEFOLD_SRC, CASEFOLD_DST))


def fold_lower_spark_sql(expr: str) -> str:
    """The identical casefold as a Spark-SQL fragment (for expression
    strings that embed it inside transform()/aggregate() lambdas where
    a Column can't be composed in)."""
    return f"lower(translate({expr}, '{CASEFOLD_SRC}', '{CASEFOLD_DST}'))"


def fold_lower_duck(expr: str) -> str:
    """The identical casefold in DuckDB SQL."""
    return (
        f"lower(translate({expr}, '{CASEFOLD_SRC}', '{CASEFOLD_DST}'))"
    )


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(fold_lower(F.trim(text)), r"\s+")


TOKENS_DUCK = f"string_split_regex({fold_lower_duck('trim(text)')}, '\\s+')"


def shingles(toks_col: str, n: int = 3) -> Column:
    """Distinct word n-grams from a token-array column (1-based slices)."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, size({toks_col}) - {n - 1}),"
            f" i -> concat_ws(' ', slice({toks_col}, i, {n})))"
        )
    )


def shingles_duck(toks_expr: str, n: int = 3) -> str:
    """Identical n-gram construction in DuckDB (1-based inclusive slices)."""
    return (
        f"list_distinct(list_transform(generate_series(1, len({toks_expr}) - {n - 1}),"
        f" i -> array_to_string(({toks_expr})[i:i+{n - 1}], ' ')))"
    )
