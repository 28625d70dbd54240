"""Cross-engine portable hashing and shingling primitives.

The dedup family (MinHash, SimHash) needs hash functions that produce
IDENTICAL values in Spark and in the DuckDB oracle. Engine-native hashes
(Spark xxhash64, DuckDB hash()) differ, so we standardize on md5 — both
engines implement RFC 1321 over utf8 bytes — and parse the first 15 hex
chars (60 bits, safely inside a signed 64-bit int):

- Spark:  ``conv(substring(md5(s), 1, 15), 16, 10)`` cast to bigint
- DuckDB: ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``

A seeded family h_i(s) = H(concat(i, ':', s)) gives the k independent
hash functions MinHash needs. md5 costs more than xxhash64, but stays
fully inside whole-stage codegen (no Python), and dedup jobs are
shuffle-bound at scale, not hash-bound.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60
HEX_CHARS = 15  # 60 bits

#: Seed for verify-side shingle hashing across the dedup family
#: (minhash verify arrays, ngram jaccard, containment): set membership
#: runs over h_99(shingle) in BOTH engines, so the 8-byte long replaces
#: the string through every shuffle and a collision (p ~ 2^-60 per
#: pair) shifts both engines identically. Distinct from the signature
#: seeds 0..k-1 for clarity only.
VERIFY_SEED = 99


def hash60(col: Column | str) -> Column:
    """Spark column: 60-bit md5-derived hash (non-negative bigint)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, HEX_CHARS), 16, 10).cast("bigint")


def hash60_seeded(col: Column | str, seed: int) -> Column:
    """Spark column: seeded family member h_seed(s)."""
    c = F.col(col) if isinstance(col, str) else col
    return hash60(F.concat(F.lit(f"{seed}:"), c))


def sql_hash60(expr: str) -> str:
    """DuckDB SQL fragment computing the same 60-bit hash."""
    return f"CAST('0x' || substr(md5({expr}), 1, {HEX_CHARS}) AS BIGINT)"


def sql_hash60_seeded(expr: str, seed: int) -> str:
    return sql_hash60(f"concat('{seed}:', {expr})")


def shingles_from_tokens(toks_col: Column | str, n: int = 3) -> Column:
    """Spark column: word n-gram shingles from an ALREADY-MATERIALIZED
    token array column. Always shingle from a materialized column —
    inlining ``split(text)`` here re-evaluates the split once per shingle
    element inside the lambda (no CSE across lambda bodies; measured ~2x
    on the dedup path)."""
    toks = F.col(toks_col) if isinstance(toks_col, str) else toks_col
    # sequence(1, size-n+1) would run DESCENDING when size < n (Spark
    # sequence(1, 0) == [1, 0]) — guard with a when().
    idx = F.when(
        F.size(toks) >= n,
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def shingles(text_col: Column | str, n: int = 3) -> Column:
    """Spark column: array of word n-gram shingles (space-joined).

    Matches :func:`sql_shingles` exactly: tokens are a literal
    ``split(text, ' ')``; shingle i joins tokens [i, i+n). Documents with
    fewer than n tokens yield an empty array. Prefer materializing the
    token array and calling :func:`shingles_from_tokens` in hot paths.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return shingles_from_tokens(F.split(c, " "), n)


def sql_shingles(text_expr: str, n: int = 3) -> str:
    """DuckDB SQL fragment producing the identical shingle list."""
    toks = f"string_split({text_expr}, ' ')"
    joined = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n - 2}), i -> {joined}) "
        f"ELSE [] END"
    )
