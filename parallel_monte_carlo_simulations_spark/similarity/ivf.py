"""IVF (inverted-file) approximate nearest neighbors: KMeans coarse
quantizer + nprobe cluster search + exact cosine re-rank.

The second ANN scale path next to random-hyperplane LSH
(`similarity.lsh`): cluster the corpus once with distributed KMeans
(pyspark.ml), store each vector under its nearest centroid, and at query
time search only the ``NPROBE`` closest clusters. At 100 TB the
centroid table is tiny (K rows — always broadcast), cluster assignment
is a map-side transform, and a query touches NPROBE/K of the corpus.

Registered rows-only (KMeans assignment is not SQL-oracle-able);
recall vs the brute-force query is property-tested in
tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, dot, norm
from ..registry import register
from ..tables import table

K_CLUSTERS = 16
NPROBE = 4
TOP_K = 10
N_QUERIES = 5
_SEED = 42


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return e.select("vec_id", as_double("embedding").alias("emb"), "label")


def ivf_assignments(corpus: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(assignments, centroids): each corpus vector's cluster id, and the
    centroid table as (cluster_id, centroid array<double>)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = corpus.withColumn("features", array_to_vector("emb"))
    model = KMeans(k=K_CLUSTERS, seed=_SEED, featuresCol="features").fit(vecs)
    assigned = model.transform(vecs).select(
        "vec_id", "emb", "label", F.col("prediction").alias("cluster_id")
    )
    centroids = (
        model.clusterCenters()
    )  # K tiny vectors on the driver — broadcast by construction
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    cdf = corpus.sparkSession.createDataFrame(
        rows, "cluster_id int, centroid array<double>"
    )
    _ = vector_to_array  # imported for parity with ml pipelines; unused
    return assigned, cdf


@register(
    "q_sim_ivf_topk",
    oracle=None,  # KMeans assignment not SQL-expressible; recall-tested
    description="ANN scale path 2: IVF (KMeans quantizer, nprobe=4) + exact re-rank",
    tags=("similarity", "ann", "ivf", "kmeans", "ml"),
)
def q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    assigned, centroids = ivf_assignments(corpus)
    assigned = assigned.persist()

    queries = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    # nprobe: each query picks its NPROBE nearest centroids (centroid
    # table is K rows — broadcast, the cross join is |Q| x K).
    qc = queries.crossJoin(F.broadcast(centroids))
    cdist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("qemb"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("cdist"), F.asc("cluster_id"))
    probes = (
        qc.withColumn("cdist", cdist)
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= NPROBE)
        .select("query_id", "qemb", "cluster_id")
    )

    # search only the probed clusters: equi-join on cluster_id
    cand = (
        F.broadcast(probes)
        .join(assigned, "cluster_id")
        .where(F.col("query_id") != F.col("vec_id"))
        .withColumn("qn", norm(F.col("qemb")))
        .withColumn("cn", norm(F.col("emb")))
    )
    cos = dot(F.col("qemb"), F.col("emb")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        cand.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            cos.alias("cos_raw"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            F.round("cos_raw", 6).alias("cos_sim"),
            "rk",
        )
    )
