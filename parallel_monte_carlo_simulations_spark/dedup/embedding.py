"""Embedding-cosine near-duplicate detection.

All-pairs cosine over the ``embeddings`` table with a similarity
threshold. The pairwise join is the exact/verification path (fine at
dimension-table scale); the 100 TB path is :mod:`..similarity.lsh`'s
random-hyperplane bucketing, which turns the quadratic compare into an
equi-join exactly like MinHash does for shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import as_double, dot, norm, sql_as_double, sql_cosine
from ..registry import register
from ..tables import table

COSINE_THRESHOLD = 0.45

_A = sql_as_double("a.embedding")
_B = sql_as_double("b.embedding")

_QEMB_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings)
SELECT
  a.vec_id                          AS vec_a,
  b.vec_id                          AS vec_b,
  FLOOR(({sql_cosine(_A, _B)}) * 1e6 + 0.5) / 1e6    AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {sql_cosine(_A, _B)} >= {COSINE_THRESHOLD}
"""


@register(
    "q_dedup_embedding_cosine",
    oracle=_QEMB_ORACLE,
    description="embedding near-dup pairs: exact pairwise cosine >= 0.45",
    tags=("dedup", "embedding", "cosine"),
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Precompute the norm per vector before the quadratic join: one
    # interpreted fold per pair instead of three (identical quotient, so
    # the inline-cosine oracle still hash-matches).
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    e = e.withColumn("nrm", norm(F.col("emb")))
    a = e.alias("a")
    b = e.alias("b")
    cos = dot(F.col("a.emb"), F.col("b.emb")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= COSINE_THRESHOLD)
        .select("vec_a", "vec_b", (F.floor((F.col("cos")) * 1e6 + 0.5) / 1e6).alias("cos_sim"))
    )
