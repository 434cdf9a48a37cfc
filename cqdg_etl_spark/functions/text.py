"""Text-analysis column helpers for the training-data pipeline operators.

All pure built-in expressions (JVM-side, codegen'd) — no Python in the hot
path. Used by operators/dedup.py, operators/textstats.py and the query
registry.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WHITESPACE_RE = r"\s+"


def normalize_ws(col: Column) -> Column:
    """Lowercase + collapse all whitespace runs to single spaces + trim.

    The canonical form used for exact-dedup hashing and fingerprinting.
    """
    return F.trim(F.regexp_replace(F.lower(col), WHITESPACE_RE, " "))


def tokens(col: Column) -> Column:
    """Whitespace tokenization → array<string> (empty array for blank)."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, WHITESPACE_RE)
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """n-word shingles of the whitespace tokens → array<string>.

    Built from ``slice`` over a ``transform`` on token indexes — stays
    declarative. Documents shorter than n words yield a single shingle of
    the whole text.
    """
    toks = tokens(normalize_ws(col))
    count = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(count - F.lit(n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def char_ngrams(col: Column, n: int = 5) -> Column:
    """Character n-grams of the normalized text → array<string>."""
    norm = normalize_ws(col)
    length = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(length - F.lit(n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substring(norm, i, n))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_ws(col))


def token_hash(col: Column) -> Column:
    """Portable 32-bit token hash: first 8 hex chars of md5 → bigint.

    md5 (not Spark's murmur ``hash``) so an external engine (DuckDB
    oracle, or any other system) can reproduce the value exactly.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
