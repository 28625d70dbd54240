"""Template/boilerplate detection via shared-header signatures.

Scraped corpora are full of template-generated documents: same header
boilerplate (license preamble, forum chrome, product-page opener),
different middles. Doc-level near-dup misses them when the middles
genuinely differ; substring dedup (``q_dedup_substring_spans``) finds
the shared spans but not the DOCUMENT GROUPS that share them. This
operator groups documents by their first-k-token header signature and
reports, per candidate template, the group size plus the SUFFIX
diversity (distinct closing-token signatures) — a group with many
members and high suffix diversity is a true template (fixed header,
varying content), while low suffix diversity means the docs are plain
near-copies better handled by MinHash. One scan, one signature-keyed
groupBy, no pairwise work at all, so it holds at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.microunit import rdiv_halfup_duck, rdiv_halfup_expr
from ..registry import register
from ..tables import table

#: Header signature width (tokens) and minimum group size.
_SIG_K = 2
_MIN_GROUP = 3

_QTEMPL_ORACLE = f"""
WITH sig AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         array_to_string(string_split(text, ' ')[1:{_SIG_K}], ' ')
           AS header_sig,
         array_to_string(string_split(text, ' ')[-{_SIG_K}:], ' ')
           AS suffix_sig
  FROM documents
  WHERE len(string_split(text, ' ')) >= {2 * _SIG_K}
)
SELECT header_sig,
       CAST(COUNT(*) AS BIGINT)                  AS n_docs,
       CAST(COUNT(DISTINCT suffix_sig) AS BIGINT) AS n_distinct_suffixes,
       CAST(MIN(doc_id) AS BIGINT)               AS exemplar_doc,
       CAST(SUM(n_tokens) AS BIGINT)             AS tokens_total,
       {rdiv_halfup_duck("SUM(n_tokens)", "COUNT(*)", 4)} AS avg_tokens
FROM sig
GROUP BY header_sig
HAVING COUNT(*) >= {_MIN_GROUP}
"""


@register(
    "q_dedup_doc_templates",
    oracle=_QTEMPL_ORACLE,
    description=(
        f"header-template detection: group documents by first-{_SIG_K}-"
        f"token signature; groups of >= {_MIN_GROUP} docs are template "
        "candidates, with suffix diversity separating true templates "
        "(fixed header, varying content) from plain near-copies — one "
        "signature-keyed groupBy, zero pairwise work"
    ),
    tags=("dedup", "template", "boilerplate", "curation", "llm-pipeline"),
)
def q_dedup_doc_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    sig = d.filter(n >= 2 * _SIG_K).select(
        "doc_id",
        n.alias("n_tokens"),
        F.concat_ws(" ", F.slice(toks, 1, _SIG_K)).alias("header_sig"),
        F.concat_ws(" ", F.slice(toks, -_SIG_K, _SIG_K)).alias("suffix_sig"),
    )
    return (
        sig.groupBy("header_sig")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("suffix_sig").cast("long").alias(
                "n_distinct_suffixes"
            ),
            F.min("doc_id").cast("long").alias("exemplar_doc"),
            F.sum("n_tokens").cast("long").alias("tokens_total"),
        )
        .filter(F.col("n_docs") >= _MIN_GROUP)
        .withColumn(
            "avg_tokens", rdiv_halfup_expr("tokens_total", "n_docs", 4)
        )
    )
