"""The other two canonical ANN metrics: L2 (Euclidean) and MIPS.

Cosine, L2, and maximum-inner-product are the three retrieval metrics
every vector store exposes (FAISS's METRIC_L2 / METRIC_INNER_PRODUCT
next to cosine); recommendation scoring is typically MIPS while
clustering/dedup is L2. Both queries reuse the brute-force shape of
:mod:`.brute` — broadcast the small query set across the corpus, score
with an index-ordered fold, window top-k — which is the correct
exact-baseline plan at any corpus size (the big side never shuffles for
the join; only the filtered candidates reach the window).

The fold order is identical across engines (Spark ``aggregate`` vs
DuckDB ``list_reduce``), so scores are bit-identical and the rounded
outputs hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import (
    as_double,
    dist2,
    dot,
    sql_as_double,
    sql_dist2,
    sql_dot,
)
from ..registry import register
from ..tables import table

N_QUERIES = 5
TOP_K = 10

_Q = sql_as_double("q.embedding")
_C = sql_as_double("c.embedding")


def _topk_oracle(score_sql: str, direction: str, score_name: str) -> str:
    return f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id, embedding, label FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         c.label AS neighbor_label, {score_sql} AS raw
  FROM q JOIN c ON q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, neighbor_label,
       FLOOR((raw) * 1e6 + 0.5) / 1e6 AS {score_name}, rk
FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY raw {direction}, neighbor_id
  ) AS INTEGER) AS rk
  FROM scored
)
WHERE rk <= {TOP_K}
"""


def _topk(
    spark: SparkSession,
    sf_dir: str,
    score,
    ascending: bool,
    score_name: str,
) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), as_double("embedding").alias("qemb")
    )
    c = e.select("vec_id", as_double("embedding").alias("emb"), "label")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            score(F.col("qemb"), F.col("emb")).alias("raw"),
        )
    )
    order = [F.asc("raw") if ascending else F.desc("raw"), F.asc("neighbor_id")]
    return (
        scored.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("query_id").orderBy(*order)),
        )
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            (F.floor((F.col("raw")) * 1e6 + 0.5) / 1e6).alias(score_name),
            "rk",
        )
    )


@register(
    "q_sim_l2_topk",
    oracle=_topk_oracle(sql_dist2(_Q, _C), "ASC", "l2_sq"),
    description="exact L2 nearest neighbors: squared-euclidean top-10 for 5 queries",
    tags=("similarity", "ann", "l2", "brute"),
)
def q_sim_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _topk(spark, sf_dir, dist2, ascending=True, score_name="l2_sq")


@register(
    "q_sim_mips_topk",
    oracle=_topk_oracle(sql_dot(_Q, _C), "DESC", "inner_product"),
    description=(
        "maximum-inner-product search: unnormalized dot-product top-10 "
        "for 5 queries (the recommendation-scoring metric)"
    ),
    tags=("similarity", "ann", "mips", "brute"),
)
def q_sim_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _topk(spark, sf_dir, dot, ascending=False, score_name="inner_product")
