"""Cryptographic hash and binary-encoding scalar surface.

The scalar functions every ingestion pipeline leans on for content
addressing and wire formats, proven portable cross-engine:

- ``sha2(x, 256)`` (Spark) == ``sha256(x)`` (DuckDB) — hex digests of
  utf8 bytes; used for content-addressed dedup keys stronger than the
  repo's 60-bit md5 work-hash.
- ``md5`` hex (already the portable work-hash; included for the digest
  length/prefix audit).
- ``base64`` / ``unbase64`` roundtrip — RFC 4648 on utf8 bytes,
  identical alphabets in both engines.

The query fingerprints each market segment's name set: per segment the
min/max sha256 digest, the count of distinct digest first-bytes (a
uniformity probe), and a base64 roundtrip integrity count. Everything
is exact string equality — no floats at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QCRYPTO_ORACLE = """
WITH h AS (
  SELECT c_mktsegment AS segment,
         sha256(c_name) AS sha_hex,
         md5(c_name) AS md5_hex,
         base64(CAST(c_name AS BLOB)) AS b64,
         CASE WHEN CAST(from_base64(base64(CAST(c_name AS BLOB))) AS VARCHAR)
                   = c_name
              THEN 1 ELSE 0 END AS roundtrip_ok
  FROM customer
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(sha_hex) AS min_sha,
       MAX(sha_hex) AS max_sha,
       CAST(COUNT(DISTINCT substr(sha_hex, 1, 2)) AS BIGINT)
         AS distinct_first_bytes,
       CAST(COUNT(DISTINCT substr(md5_hex, 1, 2)) AS BIGINT)
         AS distinct_md5_first_bytes,
       CAST(SUM(roundtrip_ok) AS BIGINT) AS b64_roundtrip_ok,
       MIN(b64) AS min_b64
FROM h
GROUP BY segment
ORDER BY segment
"""


@register(
    "q_scalar_crypto_encoding",
    oracle=_QCRYPTO_ORACLE,
    description=(
        "cryptographic digest + encoding surface: sha256/md5 hex "
        "digests, digest-uniformity probe, base64/unbase64 roundtrip — "
        "portable content-addressing primitives"
    ),
    tags=("scalar", "crypto", "sha256", "base64", "hashing"),
)
def q_scalar_crypto_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    h = c.select(
        F.col("c_mktsegment").alias("segment"),
        F.sha2(F.col("c_name"), 256).alias("sha_hex"),
        F.md5(F.col("c_name")).alias("md5_hex"),
        F.base64(F.col("c_name").cast("binary")).alias("b64"),
        F.when(
            F.unbase64(F.base64(F.col("c_name").cast("binary"))).cast(
                "string"
            )
            == F.col("c_name"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("roundtrip_ok"),
    )
    return (
        h.groupBy("segment")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("sha_hex").alias("min_sha"),
            F.max("sha_hex").alias("max_sha"),
            F.countDistinct(F.substring("sha_hex", 1, 2)).alias(
                "distinct_first_bytes"
            ),
            F.countDistinct(F.substring("md5_hex", 1, 2)).alias(
                "distinct_md5_first_bytes"
            ),
            F.sum("roundtrip_ok").alias("b64_roundtrip_ok"),
            F.min("b64").alias("min_b64"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# String-function parity sweep: the portable subset, checksummed.
# --------------------------------------------------------------------------

_QSTRPAR_ORACLE = """
WITH s AS (
  SELECT c_mktsegment AS segment,
         c_name AS name,
         upper(c_name) AS u,
         lower(c_name) AS l,
         reverse(c_name) AS r,
         lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
         replace(c_name, '0', '#') AS repl,
         levenshtein(c_name, reverse(c_name)) AS lev
  FROM customer
)
SELECT segment,
       CAST(SUM(length(u) + length(l) + length(r)) AS BIGINT) AS len_sum,
       CAST(SUM(lev) AS BIGINT) AS lev_sum,
       CAST(COUNT(DISTINCT substr(r, 1, 4)) AS BIGINT) AS rev_prefixes,
       MIN(padded) AS min_padded,
       CAST(SUM(length(repl) - length(replace(repl, '#', ''))) AS BIGINT)
         AS hash_marks
FROM s
GROUP BY segment
ORDER BY segment
"""


@register(
    "q_scalar_string_parity",
    oracle=_QSTRPAR_ORACLE,
    description=(
        "portable string-function sweep: upper/lower/reverse/lpad/"
        "replace/levenshtein checksummed per segment — the cross-engine "
        "string surface in one oracled pass"
    ),
    tags=("scalar", "string", "levenshtein", "aggregate"),
)
def q_scalar_string_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    s = c.select(
        F.col("c_mktsegment").alias("segment"),
        F.upper("c_name").alias("u"),
        F.lower("c_name").alias("l"),
        F.reverse(F.col("c_name")).alias("r"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded"),
        F.replace(
            F.col("c_name"), F.lit("0"), F.lit("#")
        ).alias("repl"),
        F.levenshtein(F.col("c_name"), F.reverse(F.col("c_name"))).alias(
            "lev"
        ),
    )
    return (
        s.groupBy("segment")
        .agg(
            (
                F.sum(
                    F.length("u") + F.length("l") + F.length("r")
                )
            ).alias("len_sum"),
            F.sum("lev").alias("lev_sum"),
            F.countDistinct(F.substring("r", 1, 4)).alias("rev_prefixes"),
            F.min("padded").alias("min_padded"),
            F.sum(
                F.length("repl")
                - F.length(F.replace(F.col("repl"), F.lit("#"), F.lit("")))
            ).alias("hash_marks"),
        )
        .orderBy("segment")
    )
