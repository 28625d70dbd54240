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

from ..functions.hashing import hash60, sql_hash60
from ..functions.vectors import cosine, dot, norm, sql_cosine
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
       FLOOR((MAX(cos_raw)) * 1e6 + 0.5) / 1e6             AS best_cos
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
        "their cluster (within-cluster pairwise only, never corpus-wide); "
        "design-domain: BOUNDED corpora — fixed K means within-cluster "
        "pair work grows as sum(n_k^2) ~ n^2/K (measured natural x10 = "
        "8.08); the scale path is q_dedup_semantic_adaptive, whose "
        "bucket count grows with n (natural x10 = 3.65, its n*log n)"
    ),
    tags=("dedup", "semantic", "embedding", "clustering", "curation"),
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _semantic_pairs(spark, sf_dir, K_FIXED)


K_FIXED = 16  # == similarity.ivf.K_CLUSTERS: the oracle replays this quantizer
# Measured trade-off (r5 same-JVM A/B, steady-state): target 32 (K=62 at
# sf0.1) made the END-TO-END ratio WORSE than fixed K — at 2000 vectors
# the n x K training cross-join grows faster than the n^2/K pairwise
# join shrinks. Target 64 (K=31 at sf0.1) is the measured optimum here;
# at production corpus sizes the pairwise term dominates and the target
# should shrink toward SemDeDup's regime (K ~ n / a few hundred).
TARGET_CLUSTER_SIZE = 64


def _semantic_pairs(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    cent = det_centroids(corpus, k=k)
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
    # Both sides are corpus-sized derived frames (post-aggregate /
    # post-explode) whose static size estimates stay tiny — pin the
    # spill-safe sort-merge strategy so the planner never broadcasts
    # the corpus (round-8 plan audit; unbounded at 100 TB).
    pairs = a.hint("merge").join(
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
            (F.floor((F.max("cos_raw")) * 1e6 + 0.5) / 1e6).alias("best_cos"),
        )
    )


#: Sign-projection quantizer bounds (adaptive variant below).
MAX_BITS = 10  # <= 1024 buckets; raise with the corpus at real scale

_SEM_SIGN_SQL = (
    "CASE WHEN "
    + sql_hash60("'sem:' || CAST(k.k AS VARCHAR) || ':' || CAST(d.dim AS VARCHAR)")
    + " % 2 = 0 THEN 1 ELSE -1 END"
)

_QSEM_ADAPTIVE_ORACLE = f"""
WITH corpus AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
nb AS (
  SELECT GREATEST(1, LEAST({MAX_BITS},
           CAST(CEIL(LOG2(COUNT(*) / {TARGET_CLUSTER_SIZE}.0)) AS INTEGER)))
         AS b
  FROM embeddings
),
dims AS (
  SELECT e.vec_id, i.i AS dim, CAST(e.embedding[i.i + 1] AS DOUBLE) AS v
  FROM embeddings e,
       LATERAL (SELECT unnest(range(0, len(e.embedding))) AS i) i
),
bits AS (
  SELECT d.vec_id, k.k,
         CASE WHEN SUM(CAST(FLOOR((({_SEM_SIGN_SQL}) * d.v) * 1e9 + 0.5) / 1e9
                            AS DECIMAL(18,9))) >= 0
              THEN 1 ELSE 0 END AS bit
  FROM dims d
  CROSS JOIN (SELECT unnest(range(0, {MAX_BITS})) AS k) k, nb
  WHERE k.k < nb.b
  GROUP BY d.vec_id, k.k
),
buckets AS (
  SELECT vec_id, CAST(SUM(bit * (1 << k)) AS BIGINT) AS bucket_id
  FROM bits GROUP BY vec_id
),
pairs AS (
  SELECT a.vec_id AS keeper, b.vec_id AS dropped, ba.bucket_id,
         {sql_cosine("a.emb", "b.emb")} AS cos_raw
  FROM buckets ba JOIN buckets bb
    ON ba.bucket_id = bb.bucket_id AND ba.vec_id < bb.vec_id
  JOIN corpus a ON a.vec_id = ba.vec_id
  JOIN corpus b ON b.vec_id = bb.vec_id
)
SELECT dropped                            AS vec_id,
       CAST(MIN(keeper) AS BIGINT)        AS keeper_id,
       CAST(ANY_VALUE(bucket_id) AS BIGINT) AS bucket_id,
       CAST(COUNT(*) AS BIGINT)           AS n_dup_neighbors,
       FLOOR((MAX(cos_raw)) * 1e6 + 0.5) / 1e6             AS best_cos
FROM pairs
WHERE cos_raw >= {THRESHOLD}
GROUP BY dropped
"""


@register(
    "q_dedup_semantic_adaptive",
    oracle=_QSEM_ADAPTIVE_ORACLE,
    description=(
        "semantic dedup at the production scale point: TRAINING-FREE "
        "deterministic sign-projection quantizer whose bit count grows "
        f"log2(n/{TARGET_CLUSTER_SIZE}) with the corpus — assignment is "
        "O(n*b*d) linear, within-bucket pairwise stays bounded, no "
        "quadratic Lloyd training term; same drop policy as the k-means "
        "variant, fully oracled"
    ),
    tags=("dedup", "semantic", "embedding", "lsh", "scale"),
)
def q_dedup_semantic_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SemDeDup scale knob, production form. Round-5/6 measurements
    showed the Lloyd-trained adaptive-K variant could not flatten its
    scale curve: growing K with n keeps the within-cluster pairwise join
    linear, but inflates the OTHER quadratic term — the n x K
    training cross-join (x10 ratio stuck at 2.5 vs the <=1.5 target).
    The fix is to not train at all: bucket by the sign pattern of
    ``b = ceil(log2(n / TARGET_CLUSTER_SIZE))`` deterministic hash-sign
    projections (the randproj/LSH discipline — md5 signs, no RNG state,
    decimal-quantized projection sums so the sign bit is cross-engine
    exact). Assignment is a skinny n*d posexplode + n*b partial-agg
    shuffle, linear in n; expected bucket size stays ~TARGET_CLUSTER_SIZE
    so within-bucket pairwise work grows ~linearly. Recall trade-off vs
    k-means clusters (near-dups split across a hyperplane are missed) is
    the standard LSH one; the k-means variant above remains the
    quality-reference oracle row.

    ``n`` (and hence ``b``) is recomputed by each engine from its own
    COUNT(*) — a pure function of the data, so the oracle stays exact.
    """
    import math
    import os

    import pyarrow.dataset as pads

    corpus = _corpus(spark, sf_dir).select("vec_id", "emb")
    # n via pyarrow.dataset so the count matches COUNT(*) for ANY
    # physical layout — a single file OR an engine-written multi-file
    # directory (r7 advice: read_metadata on a hard-coded single path
    # undercounts or fails on directory datasets). Footer-only reads,
    # no Spark job, no data pages touched.
    emb_ds = pads.dataset(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb_ds.count_rows()
    b = max(1, min(MAX_BITS, math.ceil(math.log2(n / TARGET_CLUSTER_SIZE))))

    # All b sign bits in ONE pass over the n*d posexploded rows: b
    # conditional decimal sums in a single map-side-combinable groupBy
    # (no bit-dimension crossJoin, b-fold less shuffle volume than the
    # naive (vec, dim) x (bit) expansion). The bucket id folds out of the
    # same aggregate row — no second shuffle.
    #
    # The +-1 signs depend only on (bit, dim) — 64*b values — so they are
    # precomputed driver-side with the SAME md5 formula hash60 uses and
    # embedded as literal arrays: the hot path does an array lookup per
    # term instead of an md5+base-conversion (measured 2.05 s -> md5-free
    # at sf0.1; the oracle still derives its signs from md5 in SQL, so
    # the values are identical by construction).
    import hashlib

    # Embedding width from the dataset (first fragment's first row —
    # works for multi-file layouts too), cross-checked against the
    # SCHEMA when it carries the width (fixed_size_list) so a ragged
    # corpus fails loudly instead of silently hashing short vectors.
    first_batch = next(
        emb_ds.to_batches(batch_size=1, columns=["embedding"])
    )
    d = len(first_batch.column("embedding")[0])
    emb_type = emb_ds.schema.field("embedding").type
    if hasattr(emb_type, "list_size") and emb_type.list_size is not None:
        assert emb_type.list_size == d, (emb_type.list_size, d)

    def _sign(k: int, dim: int) -> int:
        h = int(
            hashlib.md5(f"sem:{k}:{dim}".encode()).hexdigest()[:15], 16
        )
        return 1 if h % 2 == 0 else -1

    dims = corpus.select("vec_id", F.posexplode("emb").alias("dim", "v"))

    def _bit(k: int):
        sign_k = F.element_at(
            F.array(*[F.lit(_sign(k, i)) for i in range(d)]),
            F.col("dim") + 1,
        )
        return (
            F.sum((F.floor((sign_k * F.col("v")) * 1e9 + 0.5) / 1e9).cast("decimal(18,9)"))
            >= 0
        ).cast("long")

    bucket_expr = sum((_bit(k) * F.lit(1 << k) for k in range(b)), F.lit(0))
    buckets = dims.groupBy("vec_id").agg(
        bucket_expr.cast("long").alias("bucket_id")
    )
    # Precompute each vector's norm ONCE (n rows) so the within-bucket
    # pairs pay only the dot fold, not dot + two norms: identical float64
    # to the oracle's per-pair sqrt(dot(a,a)) — same fold, same values.
    # buckets is a corpus-sized aggregate over posexploded rows — its
    # static size estimate is bogus-small and the planner broadcasts it
    # into BOTH this join and the pair self-join below (round-8 plan
    # audit). Pin spill-safe sort-merge everywhere the corpus appears.
    with_emb = buckets.hint("merge").join(
        corpus.withColumn("nrm", norm(F.col("emb"))), "vec_id"
    )
    a = with_emb.select(
        F.col("vec_id").alias("keeper"),
        F.col("emb").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
        "bucket_id",
    )
    bb = with_emb.hint("merge").select(
        F.col("vec_id").alias("dropped"),
        F.col("emb").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
        F.col("bucket_id").alias("b_bucket"),
    )
    pairs = a.hint("merge").join(
        bb,
        (F.col("bucket_id") == F.col("b_bucket"))
        & (F.col("keeper") < F.col("dropped")),
    ).withColumn(
        "cos_raw",
        dot(F.col("a_emb"), F.col("b_emb"))
        / (F.col("a_nrm") * F.col("b_nrm")),
    )
    return (
        pairs.filter(F.col("cos_raw") >= THRESHOLD)
        .groupBy(F.col("dropped").alias("vec_id"))
        .agg(
            F.min("keeper").cast("long").alias("keeper_id"),
            F.any_value("bucket_id").cast("long").alias("bucket_id"),
            F.count(F.lit(1)).cast("long").alias("n_dup_neighbors"),
            (F.floor((F.max("cos_raw")) * 1e6 + 0.5) / 1e6).alias("best_cos"),
        )
    )
