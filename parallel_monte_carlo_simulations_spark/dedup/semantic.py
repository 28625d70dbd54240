"""Semantic deduplication (SemDeDup-style): cluster, then prune within.

The embedding-space dedup strategy from the SemDeDup line of work
(Abbas et al., 2023, arXiv:2303.09540): k-means-cluster the corpus
embeddings, then compare vectors ONLY within their cluster and drop
every vector that has a sufficiently-similar lower-id neighbor — the
pairwise work collapses from O(n^2) corpus-wide to sum of per-cluster
squares, which is the property that makes semantic dedup feasible at
100 TB (clusters are bounded; the within-cluster self-join is an
equi-join on cluster_id).

The quantizer is the SAME deterministic Lloyd k-means the IVF index
trains (``similarity.ivf.det_centroids``), and the oracle reuses the
IVF oracle's unrolled training CTEs (``sql_training_ctes``) verbatim —
one quantizer, two operators, both hash-verified against the identical
SQL replay.

Keeper policy (deterministic): a vector is DROPPED iff some same-
cluster vector with a LOWER vec_id has cosine >= the threshold; its
keeper is the smallest such id. Output rows are the dropped vectors
with their keeper, duplicate-neighbor count, and best cosine.

Scale knob: per-cluster pairwise work grows with (n/K)^2, so K must
grow with the corpus to keep cluster sizes bounded (SemDeDup uses
K ~ 100k at web scale; the scale study's 2.6x growth on 10x data at
fixed K=16 is exactly this effect). K is pinned here only because the
oracle replays the same K_CLUSTERS=16 quantizer as the IVF index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine, sql_cosine
from ..registry import register
from ..similarity.ivf import _corpus, _nearest, det_centroids, sql_training_ctes

THRESHOLD = 0.35

_QSEM_ORACLE = f"""
WITH {sql_training_ctes()},
pairs AS (
  SELECT a.vec_id AS keeper, b.vec_id AS dropped, a.cluster_id,
         {sql_cosine("a.emb", "b.emb")} AS cos_raw
  FROM asgf a JOIN asgf b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
)
SELECT dropped                            AS vec_id,
       CAST(MIN(keeper) AS BIGINT)        AS keeper_id,
       CAST(ANY_VALUE(cluster_id) AS INTEGER) AS cluster_id,
       CAST(COUNT(*) AS BIGINT)           AS n_dup_neighbors,
       ROUND(MAX(cos_raw), 6)             AS best_cos
FROM pairs
WHERE cos_raw >= {THRESHOLD}
GROUP BY dropped
"""


@register(
    "q_dedup_semantic",
    oracle=_QSEM_ORACLE,
    description=(
        "SemDeDup-style semantic dedup: deterministic k-means clusters, "
        f"drop vectors with a >= {THRESHOLD}-cosine lower-id neighbor in "
        "their cluster (within-cluster pairwise only, never corpus-wide)"
    ),
    tags=("dedup", "semantic", "embedding", "clustering", "curation"),
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    cent = det_centroids(corpus)
    asg = _nearest(corpus, cent)
    a = asg.select(
        F.col("vec_id").alias("keeper"),
        F.col("emb").alias("a_emb"),
        "cluster_id",
    )
    b = asg.select(
        F.col("vec_id").alias("dropped"),
        F.col("emb").alias("b_emb"),
        F.col("cluster_id").alias("b_cluster"),
    )
    pairs = a.join(
        b,
        (F.col("cluster_id") == F.col("b_cluster"))
        & (F.col("keeper") < F.col("dropped")),
    ).withColumn("cos_raw", cosine(F.col("a_emb"), F.col("b_emb")))
    return (
        pairs.filter(F.col("cos_raw") >= THRESHOLD)
        .groupBy(F.col("dropped").alias("vec_id"))
        .agg(
            F.min("keeper").cast("long").alias("keeper_id"),
            F.any_value("cluster_id").cast("int").alias("cluster_id"),
            F.count(F.lit(1)).cast("long").alias("n_dup_neighbors"),
            F.round(F.max("cos_raw"), 6).alias("best_cos"),
        )
    )
