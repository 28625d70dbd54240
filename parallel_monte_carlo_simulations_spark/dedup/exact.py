"""Exact deduplication: hash-groupBy keep-first.

The sf0.01 documents table is duplicate-free, so the query builds a
deterministic duplicate-rich corpus first (every doc_id % 7 == 0 doc is
re-added under doc_id + 100000) and dedups that — the operator then
asserts real work at every scale factor.

Scale: dedup is one shuffle on the content hash. Keep-first is a
row_number window over the hash (same shuffle, AQE-coalesced); at 100 TB
you'd hash to a fixed-width key exactly like this rather than comparing
full documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QEXACT_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
),
hashed AS (
  SELECT doc_id, md5(text) AS content_hash FROM corpus
),
ranked AS (
  SELECT
    doc_id,
    content_hash,
    CAST(row_number() OVER (PARTITION BY content_hash ORDER BY doc_id)
         AS INTEGER)                                        AS rn,
    COUNT(*) OVER (PARTITION BY content_hash)               AS n_copies
  FROM hashed
)
SELECT doc_id, content_hash, n_copies
FROM ranked WHERE rn = 1
"""


@register(
    "q_dedup_exact",
    oracle=_QEXACT_ORACLE,
    description="exact dedup: md5 hash-groupBy, keep lowest doc_id",
    tags=("dedup", "exact"),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = d.unionByName(dupes)
    hashed = corpus.select("doc_id", F.md5("text").alias("content_hash"))
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    wc = Window.partitionBy("content_hash")
    return (
        hashed.select(
            "doc_id",
            "content_hash",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n_copies"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
