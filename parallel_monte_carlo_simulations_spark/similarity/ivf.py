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

#: Broadcast bound for the probe frame (r1 ask #8): each probe row
#: carries a full query embedding (~dim x 8 B), so broadcasting is only
#: safe while |queries| x NPROBE stays small. Above the bound the probe
#: join falls back to a hash-partitioned shuffle join on cluster_id —
#: the same plan shape IVF serving uses for large query batches.
MAX_BROADCAST_PROBES = 10_000


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

    # search only the probed clusters: equi-join on cluster_id. The
    # registered query has N_QUERIES x NPROBE = 20 probe rows -> broadcast;
    # a large query batch would exceed MAX_BROADCAST_PROBES and take the
    # shuffle path instead of OOMing every executor with the broadcast.
    n_probes = N_QUERIES * NPROBE
    probe_side = (
        F.broadcast(probes)
        if n_probes <= MAX_BROADCAST_PROBES
        else probes.repartition("cluster_id")
    )
    cand = (
        probe_side
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
