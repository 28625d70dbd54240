"""Warehouse-layer write semantics: schema evolution + dynamic
partition overwrite.

Two capabilities every long-lived parquet warehouse relies on:

- **Schema evolution on read** (``mergeSchema``): producers add columns
  over time; old files lack them. The merged scan surfaces the union
  schema with NULLs for missing columns — no rewrite of history.
- **Dynamic partition overwrite** (``partitionOverwriteMode=dynamic``):
  a job rewrites ONLY the partitions it touches (the daily-reload
  pattern); untouched partitions survive byte-for-byte. Static mode
  would wipe the whole table first — the classic data-loss footgun.

Both oracles compute the expected post-write state from the ORIGINAL
documents table in closed form, so the hash only matches if the write
semantics behaved exactly as specified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .roundtrip import _tmpdir

_QEVOL_ORACLE = """
WITH v1 AS (
  SELECT doc_id, lang, NULL::BIGINT AS n_chars FROM documents WHERE doc_id < 150
),
v2 AS (
  SELECT doc_id, lang, n_chars FROM documents
  WHERE doc_id >= 150 AND doc_id < 300
),
merged AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
SELECT lang,
       CAST(COUNT(*) AS BIGINT)                    AS n_docs,
       CAST(COUNT(n_chars) AS BIGINT)              AS n_with_chars,
       CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT)   AS chars_sum
FROM merged
GROUP BY lang
"""


@register(
    "q_source_schema_evolution",
    oracle=_QEVOL_ORACLE,
    description=(
        "parquet schema evolution: old files lack a column added later; "
        "mergeSchema read surfaces the union schema with NULLs for "
        "missing values"
    ),
    tags=("source", "parquet", "schema_evolution"),
)
def q_source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    path = _tmpdir("evol")
    # generation 1: two columns
    (
        d.filter(F.col("doc_id") < 150)
        .select("doc_id", "lang")
        .write.mode("append")
        .parquet(path)
    )
    # generation 2: a third column appears
    (
        d.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300))
        .select("doc_id", "lang", "n_chars")
        .write.mode("append")
        .parquet(path)
    )
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count("n_chars").cast("long").alias("n_with_chars"),
        F.sum(F.coalesce("n_chars", F.lit(0))).cast("long").alias("chars_sum"),
    )


_QDPO_ORACLE = """
WITH final AS (
  SELECT doc_id, lang, n_chars FROM documents
  WHERE lang <> 'en'
  UNION ALL
  SELECT doc_id, lang, n_chars FROM documents
  WHERE lang = 'en' AND doc_id % 2 = 0
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT)       AS n_docs,
       CAST(SUM(n_chars) AS BIGINT)   AS chars_sum
FROM final
GROUP BY lang
"""


@register(
    "q_sink_dynamic_partition_overwrite",
    oracle=_QDPO_ORACLE,
    description=(
        "partitionOverwriteMode=dynamic: rewriting only the 'en' "
        "partition (halved rows) leaves every other lang partition "
        "byte-intact — the daily-reload pattern without the static-mode "
        "table wipe"
    ),
    tags=("sink", "parquet", "partition", "overwrite", "warehouse"),
)
def q_sink_dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = _tmpdir("dpo")
    d.write.partitionBy("lang").mode("overwrite").parquet(path)
    # reload ONLY the en partition with its even doc_ids
    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            d.filter((F.col("lang") == "en") & (F.col("doc_id") % 2 == 0))
            .write.partitionBy("lang")
            .mode("overwrite")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)
    back = spark.read.parquet(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_sum"),
    )
