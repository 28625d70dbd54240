"""Clustering-quality report over the deterministic IVF quantizer.

The evaluation loop a vector-index owner runs after (re)training: per
cluster, how many vectors, how tight (inertia = Σ d² to the centroid,
mean distance), and how isolated (distance to the nearest OTHER
centroid — the inter/intra contrast that approximates a silhouette
without the O(n²) pairwise term). Reuses the exact deterministic
2-round Lloyd quantizer of ``similarity.ivf`` (and its unrolled-CTE
oracle replay), so the numbers refer to the same index
``q_sim_ivf_topk`` serves. Assignment is the broadcast-K argmin; all
per-row distances quantize to DECIMAL before the per-cluster sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import dist2, sql_dist2
from ..registry import register
from .ivf import K_CLUSTERS, _corpus, _nearest, det_centroids, sql_training_ctes

_QINERTIA_ORACLE = f"""
WITH {sql_training_ctes()},
dists AS (
  SELECT a.cluster_id,
         CAST(FLOOR(({sql_dist2('a.emb', 'k.centroid')}) * 1e10 + 0.5) / 1e10
              AS DECIMAL(24,10)) AS d2q
  FROM asgf a JOIN cent2 k USING (cluster_id)
),
sep AS (
  SELECT cluster_id, MIN(other_d2) AS nearest_other_d2 FROM (
    SELECT a.cluster_id, {sql_dist2('k1.centroid', 'k2.centroid')} AS other_d2
    FROM (SELECT DISTINCT cluster_id FROM asgf) a
    JOIN cent2 k1 ON k1.cluster_id = a.cluster_id
    JOIN cent2 k2 ON k2.cluster_id <> a.cluster_id
  ) GROUP BY cluster_id
)
SELECT d.cluster_id,
       CAST(COUNT(*) AS BIGINT)                         AS n_vectors,
       FLOOR((CAST(SUM(d.d2q) AS DOUBLE)) * 1e6 + 0.5) / 1e6             AS inertia,
       FLOOR((CAST(SUM(d.d2q) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6  AS mean_d2,
       FLOOR((ANY_VALUE(s.nearest_other_d2)) * 1e6 + 0.5) / 1e6          AS nearest_other_centroid_d2
FROM dists d JOIN sep s USING (cluster_id)
GROUP BY d.cluster_id
"""


@register(
    "q_cluster_inertia_report",
    oracle=_QINERTIA_ORACLE,
    description=(
        f"clustering-quality report over the deterministic {K_CLUSTERS}-"
        "cluster IVF quantizer: per cluster the size, inertia (Σ d² to "
        "centroid), mean d², and squared distance to the nearest other "
        "centroid — the inter/intra tightness contrast, silhouette's "
        "cheap cousin; broadcast-K assignment, DECIMAL-quantized sums"
    ),
    tags=("similarity", "clustering", "evaluation", "ann"),
)
def q_cluster_inertia_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    cent = det_centroids(corpus)
    asg = _nearest(corpus, cent)
    dists = asg.join(F.broadcast(cent), "cluster_id").select(
        "cluster_id",
        (F.floor((dist2(F.col("emb"), F.col("centroid"))) * 1e10 + 0.5) / 1e10)
        .cast("decimal(24,10)")
        .alias("d2q"),
    )
    k1 = cent.select(
        F.col("cluster_id").alias("c1"), F.col("centroid").alias("cent1")
    )
    k2 = cent.select(
        F.col("cluster_id").alias("c2"), F.col("centroid").alias("cent2")
    )
    sep = (
        k1.join(F.broadcast(k2), F.col("c1") != F.col("c2"))
        .groupBy(F.col("c1").alias("cluster_id"))
        .agg(
            F.min(dist2(F.col("cent1"), F.col("cent2"))).alias(
                "nearest_other_d2"
            )
        )
    )
    return (
        dists.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            (F.floor((F.sum("d2q").cast("double")) * 1e6 + 0.5) / 1e6).alias("inertia"),
            (F.floor((F.sum("d2q").cast("double") / F.count(F.lit(1))) * 1e6 + 0.5) / 1e6).alias("mean_d2"),
        )
        .join(F.broadcast(sep), "cluster_id")
        .select(
            "cluster_id",
            "n_vectors",
            "inertia",
            "mean_d2",
            (F.floor((F.col("nearest_other_d2")) * 1e6 + 0.5) / 1e6).alias("nearest_other_centroid_d2"),
        )
    )
