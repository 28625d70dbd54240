"""Segment-level duplicated-text accounting (round 10).

Web-scale curation pipelines dedup BELOW the document level: a page
can be unique as a whole while half its lines are boilerplate shared
with thousands of siblings (the RefinedWeb/CCNet line-dedup step).
The corpus here is an unstructured token stream (no newlines), so the
"line" proxy is the fixed-width non-overlapping K-token segment —
exactly the granularity the dedup family's shingle operators use, but
with ACCOUNTING semantics instead of pair semantics: how much of each
source's text is segment-duplicated, and how much would line-dedup
(keep first occurrence) remove?

Scale shape: tokenize -> explode segments (O(tokens) rows, narrow) ->
md5-keyed groupBy for the global document-frequency table -> ONE
hash-partitioned join back (merge-pinned: both sides are corpus-sized;
broadcasting either would be the audit-gate hazard) -> source-sized
aggregate. No pairwise work anywhere — this is the linear-cost
complement to q_dedup_containment / q_dedup_minhash_lsh, and the first
screen a 100 TB crawl gets before any quadratic candidate generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Segment width in tokens ("line" proxy on a newline-free stream).
SEG_K = 8

_QSEGL_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
),
segs AS (
  SELECT doc_id, source,
         md5(array_to_string(
           list_slice(t, i * {SEG_K} + 1, i * {SEG_K} + {SEG_K}), ' '))
           AS seg_hash
  FROM toks,
       LATERAL (SELECT unnest(range(0, CAST(len(t) // {SEG_K} AS BIGINT))) AS i)
  WHERE len(t) >= {SEG_K}
),
df AS (
  SELECT seg_hash, CAST(COUNT(*) AS BIGINT) AS occ,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS ndocs
  FROM segs GROUP BY seg_hash
)
SELECT s.source,
       CAST(COUNT(DISTINCT s.doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(COUNT(*) FILTER (WHERE d.occ >= 2) AS BIGINT)
         AS dup_occurrences,
       CAST(COUNT(*) FILTER (WHERE d.ndocs >= 2) AS BIGINT)
         AS xdoc_dup_occurrences,
       FLOOR((CAST(COUNT(*) FILTER (WHERE d.ndocs >= 2) AS DOUBLE)
             / COUNT(*)) * 1e6 + 0.5) / 1e6 AS xdoc_dup_share,
       CAST(MAX(d.occ) AS BIGINT) AS max_segment_df
FROM segs s JOIN df d ON s.seg_hash = d.seg_hash
GROUP BY s.source
"""


@register(
    "q_dedup_segment_lines",
    oracle=_QSEGL_ORACLE,
    description=(
        f"segment-level (line-proxy, {SEG_K}-token) duplicated-text "
        "accounting per source: global segment document frequencies via "
        "one md5-keyed groupBy, merge-pinned join back, per-source "
        "duplicated-occurrence counts and shares — the linear "
        "RefinedWeb-style line-dedup screen, zero pairwise work"
    ),
    tags=("dedup", "lines", "segments", "curation", "llm-pipeline", "scale"),
)
def q_dedup_segment_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.filter(F.split(F.col("text"), " "), lambda t: t != "").alias("t"),
    ).filter(F.size("t") >= SEG_K)
    segs = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(t) div {SEG_K} - 1),"
                f" i -> md5(array_join(slice(t, i * {SEG_K} + 1, {SEG_K}),"
                f" ' ')))"
            )
        ).alias("seg_hash"),
    )
    df_tbl = segs.groupBy("seg_hash").agg(
        F.count("*").cast("long").alias("occ"),
        F.countDistinct("doc_id").cast("long").alias("ndocs"),
    )
    # Both sides are corpus-sized: pin sort-merge so no plan change can
    # ever broadcast a corpus-derived frame (the audit-gate hazard).
    joined = segs.join(df_tbl.hint("merge"), "seg_hash")
    return joined.groupBy("source").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_segments"),
        F.count(F.when(F.col("occ") >= 2, 1)).cast("long").alias(
            "dup_occurrences"
        ),
        F.count(F.when(F.col("ndocs") >= 2, 1)).cast("long").alias(
            "xdoc_dup_occurrences"
        ),
        (F.floor((F.count(F.when(F.col("ndocs") >= 2, 1)).cast("double")
            / F.count("*")) * 1e6 + 0.5) / 1e6).alias("xdoc_dup_share"),
        F.max("occ").cast("long").alias("max_segment_df"),
    )
