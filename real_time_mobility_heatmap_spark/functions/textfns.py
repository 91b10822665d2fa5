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


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(F.trim(text)), r"\s+")


TOKENS_DUCK = "string_split_regex(lower(trim(text)), '\\s+')"


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
