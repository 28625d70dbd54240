"""Boilerplate boundary detection: shared document prefixes/suffixes.

Crawled corpora carry templated openings ("cookie notice…", nav bars)
and endings (footers, license blocks) that survive exact-dedup because
the middles differ. The standard screen groups documents by their
boundary n-grams: any first-K or last-K token sequence shared by more
than one document is template material a curation pass should strip or
down-weight before training.

Spark-first shape: two projections of the token array (slice from each
end), one groupBy per side keyed on the boundary string — the same
hash-aggregate scaling as exact dedup, no pairwise comparison anywhere.
At 100 TB the grouped keys are bounded by the template count, far below
the corpus, and the HAVING > 1 filter drops the unique mass map-side
partially before the final aggregate emits only template groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_K = 5  #: boundary width in tokens

_QBOILERPLATE_ORACLE = f"""
WITH b AS (
  SELECT doc_id,
         array_to_string(string_split(text, ' ')[1:{_K}], ' ')  AS prefix_k,
         array_to_string(string_split(text, ' ')[-{_K}:], ' ') AS suffix_k
  FROM documents
  WHERE len(string_split(text, ' ')) >= {2 * _K}
),
p AS (
  SELECT 'prefix' AS kind, prefix_k AS boundary,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(MIN(doc_id) AS BIGINT) AS sample_doc
  FROM b GROUP BY prefix_k HAVING COUNT(*) > 1
),
s AS (
  SELECT 'suffix' AS kind, suffix_k AS boundary,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(MIN(doc_id) AS BIGINT) AS sample_doc
  FROM b GROUP BY suffix_k HAVING COUNT(*) > 1
)
SELECT * FROM p
UNION ALL
SELECT * FROM s
ORDER BY n_docs DESC, kind, boundary
"""


@register(
    "q_text_boilerplate_boundaries",
    oracle=_QBOILERPLATE_ORACLE,
    description=(
        f"boilerplate/template screen: first-{_K} and last-{_K} token "
        f"sequences shared by more than one document (templated "
        f"openings and footers that survive exact dedup), with group "
        f"sizes and a sample doc — the strip-list a curation pass "
        f"feeds back into cleaning"
    ),
    tags=("text", "curation", "dedup", "boilerplate", "llm-pipeline"),
)
def q_text_boilerplate_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    b = d.where(F.size(toks) >= 2 * _K).select(
        "doc_id",
        F.array_join(F.slice(toks, 1, _K), " ").alias("prefix_k"),
        F.array_join(F.slice(toks, -_K, _K), " ").alias("suffix_k"),
    )

    def side(col: str, kind: str) -> DataFrame:
        return (
            b.groupBy(F.col(col).alias("boundary"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.min("doc_id").cast("long").alias("sample_doc"),
            )
            .where(F.col("n_docs") > 1)
            .select(
                F.lit(kind).alias("kind"), "boundary", "n_docs", "sample_doc"
            )
        )

    return (
        side("prefix_k", "prefix")
        .unionAll(side("suffix_k", "suffix"))
        .orderBy(F.desc("n_docs"), "kind", "boundary")
    )
