"""Product quantization (PQ) approximate nearest neighbors — the
memory-bound ANN scale path.

PQ compresses each D-dim vector to ``M_SUB`` small codes: split the
vector into M subvectors, quantize each against a per-subspace codebook
of ``K_CODES`` centroids, and approximate a query's distance as the sum
of per-subspace table lookups (asymmetric distance computation, ADC) —
Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011. At 100 TB this is THE trick that makes vector search fit:
16 code bytes per vector here versus 256 bytes of float32 — the codes
table for a billion vectors fits in cluster memory, the ADC join touches
no raw embeddings, and only the ``RERANK`` survivors per query read the
full vectors again for exact cosine re-ranking.

Codebooks are trained DISTRIBUTED, in DataFrame ops: deterministic
corpus anchors (lowest portable-md5 order — no RNG state) refined by
``LLOYD_ITERS`` k-means steps, where each step is one broadcast
assign-join plus one groupBy mean per subspace. Measured on the test
corpus: refinement + 16 subspaces lifts recall@10 from 0.36 (4
subspaces, raw anchors) to ~0.9.

Vectors are L2-normalized before quantization so squared-L2 ADC order
agrees with the cosine objective of the re-rank and the brute baseline.

Registered rows-only (argmin-over-trained-centroids is not reasonably
SQL-oracle-able); recall vs brute force is property-tested in
tests/test_properties.py like the LSH and IVF paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, dot, norm
from ..registry import register
from ..tables import table

DIM = 64
M_SUB = 16           # subspaces of DIM // M_SUB dims each
SUB_DIM = DIM // M_SUB
K_CODES = 16         # centroids per subspace codebook
LLOYD_ITERS = 2      # distributed k-means refinement steps
RERANK = 50          # exact re-rank depth per query
TOP_K = 10
N_QUERIES = 5


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus with L2-NORMALIZED vectors: after normalization, squared
    L2 distance is ``2 - 2*cos``, so the ADC approximate ordering agrees
    with the cosine objective the re-rank (and the brute baseline)
    optimizes. Quantizing unnormalized vectors would rank by raw L2 —
    a different metric — and quietly cost recall."""
    e = table(spark, sf_dir, "embeddings")
    raw = e.select("vec_id", as_double("embedding").alias("emb_raw"), "label")
    n = norm(F.col("emb_raw"))
    return raw.select(
        "vec_id",
        F.transform(F.col("emb_raw"), lambda x: x / n).alias("emb"),
        "label",
    )


def _l2sq(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _melt(df: DataFrame, vec_col: str, id_cols: list[str]) -> DataFrame:
    """One row per (id, subspace): ``subvec`` is the m-th SUB_DIM slice.
    Single explode of an inline struct array — NOT an M-way union, whose
    M scan branches would be copied into every downstream reference and
    blow up the plan across Lloyd iterations. At scale this M-fold
    fanout is the standard PQ layout; a production encode would fuse
    assignment into one Arrow LUT pass instead."""
    subs = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(F.col(vec_col), m * SUB_DIM + 1, SUB_DIM).alias("subvec"),
            )
            for m in range(M_SUB)
        ]
    )
    return df.select(*id_cols, F.explode(subs).alias("_s")).select(
        *id_cols, F.col("_s.m").alias("m"), F.col("_s.subvec").alias("subvec")
    )


def _assign(melted: DataFrame, codebooks: DataFrame, id_col: str) -> DataFrame:
    """Nearest codebook entry per (id, subspace): broadcast join on the
    subspace, min_by over the K candidate codes. Ties break on the lower
    code id, so assignment is deterministic."""
    d = _l2sq(F.col("subvec"), F.col("anchor_sub"))
    return (
        melted.join(F.broadcast(codebooks), "m")
        .select(id_col, "m", "code", "subvec", d.alias("d"))
        .groupBy(id_col, "m")
        .agg(
            F.min_by("code", F.struct(F.col("d"), F.col("code"))).alias("code"),
            F.first("subvec").alias("subvec"),
        )
    )


def pq_codebooks(corpus: DataFrame) -> DataFrame:
    """(m, code, anchor_sub): per-subspace codebooks — deterministic
    md5-ordered corpus anchors refined with LLOYD_ITERS distributed
    k-means steps (assign join + per-(m, code) element-wise mean)."""
    w = Window.orderBy(F.md5(F.concat_ws(":", F.col("vec_id"), F.lit("pq"))))
    anchors = (
        corpus.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K_CODES)
        .select((F.col("rk") - 1).alias("code"), F.col("emb"))
    )
    codebooks = _melt(anchors, "emb", ["code"]).select(
        "m", "code", F.col("subvec").alias("anchor_sub")
    )
    melted = _melt(corpus, "emb", ["vec_id"]).persist()
    for _ in range(LLOYD_ITERS):
        assigned = _assign(melted, codebooks, "vec_id")
        codebooks = assigned.groupBy("m", "code").agg(
            F.array(*[F.avg(F.col("subvec")[i]) for i in range(SUB_DIM)]).alias(
                "anchor_sub"
            )
        )
        # Materialize each iteration's codebook (M_SUB*K_CODES tiny rows)
        # and CUT the lineage: without this, iteration i+1's plan embeds
        # i's whole training subtree, and the final query replays the
        # entire cascade once per downstream reference — measured as a
        # driver-heap OOM at sf0.1 before truncation.
        codebooks = codebooks.localCheckpoint(eager=True)
    melted.unpersist()
    return codebooks


@register(
    "q_sim_pq_topk",
    oracle=None,  # trained-centroid argmin not SQL-expressible; recall-tested
    description="ANN scale path 3: product quantization (16-byte codes, ADC) + exact re-rank",
    tags=("similarity", "ann", "pq", "quantization"),
)
def q_sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir).persist()
    codebooks = pq_codebooks(corpus).persist()
    # Encode: M_SUB small ints per vector — the only corpus-wide state
    # the ADC search reads. 16 bytes/vector at production dims.
    codes = _assign(_melt(corpus, "emb", ["vec_id"]), codebooks, "vec_id").select(
        "vec_id", "m", "code"
    )

    queries = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    # ADC distance tables: query x subspace x code — N_QUERIES*M_SUB*K_CODES
    # tiny rows, broadcast everywhere. Grows with the query batch, never
    # with the corpus.
    dist_table = (
        _melt(queries, "qemb", ["query_id"])
        .join(F.broadcast(codebooks), "m")
        .select(
            "query_id",
            "m",
            "code",
            _l2sq(F.col("subvec"), F.col("anchor_sub")).alias("dpart"),
        )
    )

    approx = (
        codes.join(F.broadcast(dist_table), ["m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("dpart").alias("approx_d"))
        .filter(F.col("query_id") != F.col("vec_id"))
    )
    wa = Window.partitionBy("query_id").orderBy(F.asc("approx_d"), F.asc("vec_id"))
    survivors = (
        approx.withColumn("ar", F.row_number().over(wa))
        .filter(F.col("ar") <= RERANK)
        .select("query_id", "vec_id")
    )

    # exact cosine re-rank of the survivors only
    cand = (
        survivors.join(corpus, "vec_id")
        .join(queries.select("query_id", "qemb"), "query_id")
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
