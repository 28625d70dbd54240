"""Johnson-Lindenstrauss random projection — dimensionality reduction
with measured distance preservation, exactly oracled.

The JL lemma says a random +-1 projection to k dimensions preserves
pairwise distances within (1 +- eps) with high probability — the
workhorse trick for shrinking embedding tables before ANN indexing
(Achlioptas 2003 database-friendly variant). This query:

1. projects every embedding to K=16 dims with a DETERMINISTIC +-1
   matrix (sign = portable md5 hash of (k, dim) — no RNG state, the
   repo's hash-derived-randomness discipline);
2. verifies the lemma on data: for hash-sampled vector pairs, the
   ratio ||p(a)-p(b)||^2 * (d/k) / ||a-b||^2 is reported — clustering
   near 1.0 IS the JL guarantee, measured not assumed.

Exactness: each projection term sign(k,dim) * v[dim] is quantized to
DECIMAL(18,9) before the per-(vector,k) sum, so projections are
order-independent exact decimals; squared distances divide exact
decimals cast to double (IEEE-identical), rounded once.

Scale: the projection is a posexplode + groupBy((vec, k)) — a skinny
shuffle of n_vectors x d rows, map-side combinable; K controls the
output width. The verification joins a bounded hash-sampled pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60, sql_hash60
from ..registry import register
from ..tables import table

K_DIMS = 16
#: pair sample: vec pairs whose combined hash lands below this per-mille.
PAIR_PERMILLE = 2

_SIGN_SQL = (
    "CASE WHEN "
    + sql_hash60("'jl:' || CAST(k AS VARCHAR) || ':' || CAST(dim AS VARCHAR)")
    + " % 2 = 0 THEN 1 ELSE -1 END"
)
_PAIR_HASH = sql_hash60(
    "'jlpair:' || CAST(a.vec_id AS VARCHAR) || ':' || CAST(b.vec_id AS VARCHAR)"
)

_QJL_ORACLE = f"""
WITH dims AS (
  SELECT e.vec_id, i.i AS dim,
         CAST(e.embedding[i.i + 1] AS DOUBLE) AS v,
         len(e.embedding) AS d
  FROM embeddings e,
       LATERAL (SELECT unnest(range(0, len(e.embedding))) AS i) i
),
proj AS (
  SELECT vec_id, ks.k,
         CAST(SUM(CAST(FLOOR((({_SIGN_SQL}) * v) * 1e9 + 0.5) / 1e9 AS DECIMAL(18,9)))
              AS DOUBLE) AS p,
         MAX(d) AS d
  FROM dims CROSS JOIN (SELECT unnest(range(0, {K_DIMS})) AS k) ks
  GROUP BY vec_id, ks.k
),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE {_PAIR_HASH} % 1000 < {PAIR_PERMILLE}
),
orig AS (
  SELECT p.va, p.vb,
         CAST(SUM(CAST(FLOOR(((da.v - db.v) * (da.v - db.v)) * 1e9 + 0.5) / 1e9
                       AS DECIMAL(18,9))) AS DOUBLE) AS dist2
  FROM pairs p
  JOIN dims da ON da.vec_id = p.va
  JOIN dims db ON db.vec_id = p.vb AND db.dim = da.dim
  GROUP BY p.va, p.vb
),
projected AS (
  SELECT p.va, p.vb,
         CAST(SUM(CAST(FLOOR(((pa.p - pb.p) * (pa.p - pb.p)) * 1e9 + 0.5) / 1e9
                       AS DECIMAL(18,9))) AS DOUBLE) AS pdist2
  FROM pairs p
  JOIN proj pa ON pa.vec_id = p.va
  JOIN proj pb ON pb.vec_id = p.vb AND pb.k = pa.k
  GROUP BY p.va, p.vb
)
SELECT o.va AS vec_a, o.vb AS vec_b,
       FLOOR((o.dist2) * 1e6 + 0.5) / 1e6 AS dist2,
       FLOOR((pr.pdist2 / {K_DIMS}.0e0) * 1e6 + 0.5) / 1e6 AS proj_dist2_scaled,
       FLOOR(((pr.pdist2 / {K_DIMS}.0e0) / o.dist2) * 1e4 + 0.5) / 1e4 AS jl_ratio
FROM orig o JOIN projected pr ON pr.va = o.va AND pr.vb = o.vb
WHERE o.dist2 > 0
ORDER BY vec_a, vec_b
"""


@register(
    "q_embedding_random_projection",
    oracle=_QJL_ORACLE,
    description=(
        f"Johnson-Lindenstrauss +-1 projection to {K_DIMS} dims with "
        "measured distance preservation on hash-sampled pairs "
        "(jl_ratio ~ 1.0) — deterministic hash-sign matrix, quantized "
        "projection terms"
    ),
    tags=("similarity", "embedding", "jl", "projection", "llm-pipeline"),
)
def q_embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("dim", "v0"),
    ).select(
        "vec_id", "dim", F.col("v0").cast("double").alias("v")
    )
    ks = spark.range(K_DIMS).select(F.col("id").alias("k"))
    sign = F.when(
        hash60(
            F.concat(
                F.lit("jl:"),
                F.col("k").cast("string"),
                F.lit(":"),
                F.col("dim").cast("string"),
            )
        )
        % 2
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    proj = (
        dims.crossJoin(F.broadcast(ks))
        .select(
            "vec_id",
            "k",
            (F.floor((sign * F.col("v")) * 1e9 + 0.5) / 1e9).cast("decimal(18,9)").alias("t"),
        )
        .groupBy("vec_id", "k")
        .agg(F.sum("t").cast("double").alias("p"))
    )
    a = e.select(F.col("vec_id").alias("va"))
    b = e.select(F.col("vec_id").alias("vb"))
    pairs = (
        a.crossJoin(b)
        .where(F.col("va") < F.col("vb"))
        .where(
            hash60(
                F.concat(
                    F.lit("jlpair:"),
                    F.col("va").cast("string"),
                    F.lit(":"),
                    F.col("vb").cast("string"),
                )
            )
            % 1000
            < PAIR_PERMILLE
        )
    )
    da = dims.select(
        F.col("vec_id").alias("va"), "dim", F.col("v").alias("v_a")
    )
    db = dims.select(
        F.col("vec_id").alias("vb_d"),
        F.col("dim").alias("dim_b"),
        F.col("v").alias("v_b"),
    )
    orig = (
        pairs.join(da, "va")
        .join(
            db,
            (F.col("vb") == F.col("vb_d")) & (F.col("dim") == F.col("dim_b")),
        )
        .groupBy("va", "vb")
        .agg(
            F.sum(
                (F.floor(((F.col("v_a") - F.col("v_b"))
                    * (F.col("v_a") - F.col("v_b"))) * 1e9 + 0.5) / 1e9).cast("decimal(18,9)")
            )
            .cast("double")
            .alias("dist2")
        )
    )
    pa = proj.select(F.col("vec_id").alias("va"), "k", F.col("p").alias("p_a"))
    pb = proj.select(
        F.col("vec_id").alias("vb_p"),
        F.col("k").alias("k_b"),
        F.col("p").alias("p_b"),
    )
    projected = (
        pairs.join(pa, "va")
        .join(
            pb,
            (F.col("vb") == F.col("vb_p")) & (F.col("k") == F.col("k_b")),
        )
        .groupBy("va", "vb")
        .agg(
            F.sum(
                (F.floor(((F.col("p_a") - F.col("p_b"))
                    * (F.col("p_a") - F.col("p_b"))) * 1e9 + 0.5) / 1e9).cast("decimal(18,9)")
            )
            .cast("double")
            .alias("pdist2")
        )
    )
    return (
        orig.join(projected, ["va", "vb"])
        .where(F.col("dist2") > 0)
        .select(
            F.col("va").alias("vec_a"),
            F.col("vb").alias("vec_b"),
            (F.floor((F.col("dist2")) * 1e6 + 0.5) / 1e6).alias("dist2"),
            (F.floor((F.col("pdist2") / K_DIMS) * 1e6 + 0.5) / 1e6).alias("proj_dist2_scaled"),
            (F.floor(((F.col("pdist2") / K_DIMS) / F.col("dist2")) * 1e4 + 0.5) / 1e4).alias(
                "jl_ratio"
            ),
        )
        .orderBy("vec_a", "vec_b")
    )


# --------------------------------------------------------------------------
# Recall of search in the projected space: does 16-dim JL preserve the
# full-dimension L2 top-k?
# --------------------------------------------------------------------------

from .brute import N_QUERIES, TOP_K  # noqa: E402
from .metrics import _topk_oracle, _Q, _C  # noqa: E402
from ..functions.vectors import sql_dist2  # noqa: E402

_JL_TOPK_SQL = f"""
  SELECT query_id, neighbor_id, rk FROM (
    SELECT qp.vec_id AS query_id, cp.vec_id AS neighbor_id,
           CAST(row_number() OVER (
             PARTITION BY qp.vec_id
             ORDER BY SUM(CAST(FLOOR(((qp.p - cp.p) * (qp.p - cp.p)) * 1e9 + 0.5) / 1e9
                               AS DECIMAL(18,9))), cp.vec_id
           ) AS INTEGER) AS rk
    FROM proj qp JOIN proj cp
      ON qp.k = cp.k AND qp.vec_id < {N_QUERIES}
     AND cp.vec_id <> qp.vec_id
    GROUP BY qp.vec_id, cp.vec_id
  ) WHERE rk <= {TOP_K}
"""

_QJL_RECALL_ORACLE = f"""
WITH dims AS (
  SELECT e.vec_id, i.i AS dim,
         CAST(e.embedding[i.i + 1] AS DOUBLE) AS v
  FROM embeddings e,
       LATERAL (SELECT unnest(range(0, len(e.embedding))) AS i) i
),
proj AS (
  SELECT vec_id, ks.k,
         CAST(SUM(CAST(FLOOR((({_SIGN_SQL}) * v) * 1e9 + 0.5) / 1e9 AS DECIMAL(18,9)))
              AS DOUBLE) AS p
  FROM dims CROSS JOIN (SELECT unnest(range(0, {K_DIMS})) AS k) ks
  GROUP BY vec_id, ks.k
),
truth AS ({_topk_oracle(sql_dist2(_Q, _C), "ASC", "l2_sq")}),
approx AS ({_JL_TOPK_SQL}),
matches AS (
  SELECT t.query_id, COUNT(*) AS n_match
  FROM truth t JOIN approx a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
  GROUP BY t.query_id
)
SELECT q.query_id,
       CAST(COALESCE(m.n_match, 0) AS BIGINT) AS n_match,
       FLOOR((COALESCE(m.n_match, 0) / {TOP_K}.0) * 1e4 + 0.5) / 1e4 AS recall_at_k
FROM (SELECT DISTINCT query_id FROM truth) q
LEFT JOIN matches m ON q.query_id = m.query_id
ORDER BY q.query_id
"""


@register(
    "q_ann_recall_eval_jl",
    oracle=_QJL_RECALL_ORACLE,
    description=(
        f"recall@{TOP_K} of L2 search in the {K_DIMS}-dim JL-projected "
        "space vs full-dimension brute force — measures how much of the "
        "neighbourhood survives 4x dimensionality reduction. On this "
        "synthetic near-uniform corpus the neighbour margins are tiny, "
        "so measured recall is honestly low (~0.1-0.3): JL bounds "
        "DISTANCE distortion, and when all distances nearly tie even "
        "small distortion reshuffles top-k — exactly what the harness "
        "is for (clustered real corpora fare far better)"
    ),
    tags=("similarity", "ann", "jl", "evaluation", "composition"),
)
def q_ann_recall_eval_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .metrics import q_sim_l2_topk

    e = table(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("dim", "v0")
    ).select("vec_id", "dim", F.col("v0").cast("double").alias("v"))
    ks = spark.range(K_DIMS).select(F.col("id").alias("k"))
    sign = F.when(
        hash60(
            F.concat(
                F.lit("jl:"),
                F.col("k").cast("string"),
                F.lit(":"),
                F.col("dim").cast("string"),
            )
        )
        % 2
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    proj = (
        dims.crossJoin(F.broadcast(ks))
        .select(
            "vec_id",
            "k",
            (F.floor((sign * F.col("v")) * 1e9 + 0.5) / 1e9).cast("decimal(18,9)").alias("t"),
        )
        .groupBy("vec_id", "k")
        .agg(F.sum("t").cast("double").alias("p"))
    )
    qp = proj.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "k", F.col("p").alias("pq")
    )
    cp = proj.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("k").alias("k_c"),
        F.col("p").alias("pc"),
    )
    from pyspark.sql import Window

    approx = (
        qp.join(
            cp,
            (F.col("k") == F.col("k_c"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(
                (F.floor(((F.col("pq") - F.col("pc")) * (F.col("pq") - F.col("pc"))) * 1e9 + 0.5) / 1e9).cast("decimal(18,9)")
            ).alias("d2")
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
            ),
        )
        .where(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    truth = q_sim_l2_topk(spark, sf_dir).select("query_id", "neighbor_id")
    matches = (
        truth.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    return (
        truth.select("query_id")
        .distinct()
        .join(matches, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_match", F.lit(0)).cast("long").alias("n_match"),
            (F.floor((F.coalesce("n_match", F.lit(0)) / F.lit(float(TOP_K))) * 1e4 + 0.5) / 1e4).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )
