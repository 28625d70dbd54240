"""Spark 4 VARIANT type (semi-structured data without a fixed schema)
and outer explode semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QVARIANT_ORACLE = """
SELECT
  event_type,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
  CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
FROM events
GROUP BY event_type
"""


@register(
    "q_variant_type",
    oracle=_QVARIANT_ORACLE,
    description="VARIANT ingestion (parse_json) + typed variant_get extraction",
    tags=("scalar", "variant", "json"),
)
def q_variant_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    # parse once into a VARIANT column (binary semi-structured encoding —
    # at scale this is the shredded-JSON storage story), extract typed.
    v = e.select("event_type", F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "int")
    return v.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.max(k).alias("max_k"),
    )


_QEXPOUTER_ORACLE = """
WITH t AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN []
              ELSE string_split(text, ' ')[1:3] END AS head_toks
  FROM documents WHERE doc_id < 40
)
SELECT doc_id, u.tok AS tok
FROM t LEFT JOIN LATERAL (SELECT unnest(head_toks) AS tok) u ON TRUE
"""


@register(
    "q_explode_outer",
    oracle=_QEXPOUTER_ORACLE,
    description="explode_outer keeps rows whose array is empty (NULL token)",
    tags=("scalar", "explode", "outer"),
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    toks = F.split("text", " ")
    head = F.when(
        F.col("doc_id") % 10 == 0, F.array().cast("array<string>")
    ).otherwise(F.slice(toks, 1, 3))
    t = d.select("doc_id", head.alias("head_toks"))
    return t.select("doc_id", F.explode_outer("head_toks").alias("tok"))
