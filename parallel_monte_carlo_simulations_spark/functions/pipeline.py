"""End-to-end LLM training-data curation pipeline — the composition the
engine exists for, as ONE oracle-checked query:

  documents
    -> language ID (stopword argmax)
    -> quality scoring + threshold filter
    -> near-duplicate removal (MinHash-verified pairs; keep lowest doc_id)
    -> token accounting for the surviving corpus

Everything is the same registered building blocks (functions.text,
dedup.minhash), so this also proves the blocks compose. One Spark job:
scan -> scalar scoring (no shuffle) -> dedup joins (shuffles on doc ids /
band keys) -> final projection. The oracle recomposes the identical
logic in SQL CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dedup.minhash import _QMINHASH_ORACLE, q_dedup_minhash_lsh
from ..registry import register
from ..tables import table
from .text import STOPWORDS, _stopword_count, _tokens

QUALITY_MIN = 0.5

_EN_SW_SQL = "('" + "', '".join(STOPWORDS["en"]) + "')"

_QPIPE_ORACLE = f"""
WITH scored AS (
  SELECT
    doc_id,
    text,
    lang,
    FLOOR((0.4 * LEAST(length(text) / 500.0, 1.0)
      + 0.4 * (len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')))
      + 0.2 * LEAST(len(list_filter(string_split(text, ' '),
                                    t -> t IN {_EN_SW_SQL})) * 5.0
                    / len(string_split(text, ' ')), 1.0)) * 1e6 + 0.5) / 1e6 AS quality
  FROM documents
),
kept_quality AS (
  SELECT * FROM scored WHERE quality >= {QUALITY_MIN}
),
neardup_pairs AS (
  SELECT doc_a, doc_b FROM ({_QMINHASH_ORACLE.strip()}) mh
),
dropped AS (
  SELECT DISTINCT doc_b AS doc_id FROM neardup_pairs
),
curated AS (
  SELECT k.* FROM kept_quality k
  WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.doc_id = k.doc_id)
)
SELECT
  doc_id,
  lang,
  quality,
  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
FROM curated
"""


@register(
    "q_pipeline_llm_curation",
    oracle=_QPIPE_ORACLE,
    description="end-to-end curation: quality filter -> near-dup removal -> token stats",
    tags=("pipeline", "dedup", "text", "composition"),
)
def q_pipeline_llm_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    n = F.size(toks)
    quality = (F.floor((0.4 * F.least(F.length("text") / 500.0, F.lit(1.0))
        + 0.4 * (F.size(F.array_distinct(toks)) / n)
        + 0.2 * F.least(_stopword_count(toks, STOPWORDS["en"]) / n * 5.0, F.lit(1.0))) * 1e6 + 0.5) / 1e6)
    scored = d.select("doc_id", "text", "lang", quality.alias("quality"))
    kept = scored.filter(F.col("quality") >= QUALITY_MIN)

    # near-dup removal: drop the higher doc_id of every verified pair
    pairs = q_dedup_minhash_lsh(spark, sf_dir)
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    curated = kept.join(dropped, "doc_id", "left_anti")

    return curated.select(
        "doc_id",
        "lang",
        "quality",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
