"""Brute-force cosine top-k similarity search — the exact baseline.

Query vectors (vec_id < 5) are broadcast against the full embedding
table; per-query top-k via a row_number window. This is the correctness
baseline every ANN variant (:mod:`.lsh`) is measured against — and the
right plan when the query set is small: the big side never shuffles for
the join (broadcast), only the tiny (n_queries × n_vectors → filtered)
result shuffles for the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, dot, norm, sql_as_double, sql_cosine
from ..registry import register
from ..tables import table

N_QUERIES = 5
TOP_K = 10

_Q = sql_as_double("q.embedding")
_C = sql_as_double("c.embedding")

_QBRUTE_ORACLE = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id, embedding, label FROM embeddings),
scored AS (
  SELECT
    q.vec_id            AS query_id,
    c.vec_id            AS neighbor_id,
    c.label             AS neighbor_label,
    {sql_cosine(_Q, _C)} AS cos_raw
  FROM q JOIN c ON q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, neighbor_label,
       FLOOR((cos_raw) * 1e6 + 0.5) / 1e6 AS cos_sim,
       rk
FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
  ) AS INTEGER) AS rk
  FROM scored
)
WHERE rk <= {TOP_K}
"""


def topk_cosine(
    queries: DataFrame, corpus: DataFrame, k: int, query_id="query_id"
) -> DataFrame:
    """Generic exact top-k: broadcast queries x corpus, window per query.

    ``queries``: (query_id, qemb array<double>); ``corpus``: (vec_id,
    emb array<double>, ...extra cols). Returns per-query k nearest by
    cosine with deterministic tie-breaking on neighbor id.

    Norms are precomputed per vector BEFORE the pairwise join (higher-
    order folds are interpreted, not codegen'd — one fold per pair
    instead of three cuts the hot loop ~3x; the quotient is bit-identical
    either way, so the oracle is unaffected).
    """
    queries_n = queries.withColumn("qn", norm(F.col("qemb")))
    corpus_n = corpus.withColumn("cn", norm(F.col("emb")))
    scored = F.broadcast(queries_n).crossJoin(corpus_n).where(
        F.col(query_id) != F.col("vec_id")
    )
    cos = dot(F.col("qemb"), F.col("emb")) / (F.col("qn") * F.col("cn"))
    return (
        scored.select(
            query_id,
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            cos.alias("cos_raw"),
        )
        .withColumn("rk", F.row_number().over(
            Window.partitionBy(query_id).orderBy(
                F.desc("cos_raw"), F.asc("neighbor_id")
            )
        ))
        .filter(F.col("rk") <= k)
        .select(
            query_id,
            "neighbor_id",
            "neighbor_label",
            (F.floor((F.col("cos_raw")) * 1e6 + 0.5) / 1e6).alias("cos_sim"),
            "rk",
        )
    )


@register(
    "q_sim_brute_topk",
    oracle=_QBRUTE_ORACLE,
    description="exact ANN baseline: brute-force cosine top-10 for 5 queries",
    tags=("similarity", "ann", "brute"),
)
def q_sim_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), as_double("embedding").alias("qemb")
    )
    corpus = e.select("vec_id", as_double("embedding").alias("emb"), "label")
    return topk_cosine(queries, corpus, TOP_K)
