"""Embedding-training data mining: hard-negative mining and
matryoshka (truncated-dimension) retrieval evaluation.

Two compositions an embedding-model training pipeline runs constantly:

- **Hard negatives** (contrastive training): for each query vector, the
  nearest neighbors with a DIFFERENT label — the negatives closest to
  the decision boundary, which drive most of the contrastive gradient
  (InfoNCE/triplet mining). Same broadcast-query brute-force shape as
  :mod:`.brute`, with the label inequality pushed into the join.

- **Matryoshka evaluation** (Kusupati et al. 2022): how much retrieval
  quality survives truncating embeddings to their first ``TRUNC_DIM``
  dimensions (MRL-trained models front-load information; storing and
  searching the prefix is the production memory/latency lever). Recall
  of the truncated-cosine top-k against the full-dimension top-k, per
  query — measured, not assumed.

Scale: both are |queries| x corpus with broadcast queries — the corpus
never shuffles for the join; evaluation cost scales with the query
sample. Truncated search reads the SAME parquet column and slices
in-plan (no second copy of the table), which is how a prefix index
would be served before a dedicated narrow table is materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, dot, norm, sql_cosine
from ..registry import register
from ..tables import table
from .brute import _QBRUTE_ORACLE, N_QUERIES, TOP_K

HARD_K = 5  #: hard negatives reported per query
TRUNC_DIM = 16  #: matryoshka prefix width (of 64)


def _sql_trunc(col: str) -> str:
    return f"list_transform(({col})[1:{TRUNC_DIM}], x -> CAST(x AS DOUBLE))"


_QHARDNEG_ORACLE = f"""
WITH q AS (
  SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (SELECT vec_id, embedding, label FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id,
         c.vec_id AS neighbor_id,
         c.label  AS neighbor_label,
         {sql_cosine("list_transform(q.embedding, x -> CAST(x AS DOUBLE))",
                     "list_transform(c.embedding, x -> CAST(x AS DOUBLE))")}
           AS cos_raw
  FROM q JOIN c ON q.vec_id <> c.vec_id AND q.label <> c.label
)
SELECT query_id, neighbor_id, neighbor_label,
       FLOOR((cos_raw) * 1e6 + 0.5) / 1e6 AS cos_sim, rk
FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
  ) AS INTEGER) AS rk
  FROM scored
)
WHERE rk <= {HARD_K}
"""


@register(
    "q_hard_negative_mining",
    oracle=_QHARDNEG_ORACLE,
    description=(
        f"contrastive hard-negative mining: per query, top-{HARD_K} "
        "nearest DIFFERENT-label vectors (label inequality pushed into "
        "the broadcast join) — the InfoNCE/triplet mining primitive"
    ),
    tags=("similarity", "embedding", "mining", "contrastive", "llm-pipeline"),
)
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        as_double("embedding").alias("qemb"),
        F.col("label").alias("qlabel"),
    ).withColumn("qn", norm(F.col("qemb")))
    corpus = e.select(
        "vec_id", as_double("embedding").alias("emb"), "label"
    ).withColumn("cn", norm(F.col("emb")))
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .where(
            (F.col("query_id") != F.col("vec_id"))
            & (F.col("qlabel") != F.col("label"))
        )
    )
    cos = dot(F.col("qemb"), F.col("emb")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("neighbor_id")
    )
    return (
        scored.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            cos.alias("cos_raw"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= HARD_K)
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            (F.floor((F.col("cos_raw")) * 1e6 + 0.5) / 1e6).alias("cos_sim"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


_QMRL_ORACLE = f"""
WITH truth AS ({_QBRUTE_ORACLE}),
q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id, embedding FROM embeddings),
tscored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {sql_cosine(_sql_trunc("q.embedding"), _sql_trunc("c.embedding"))}
           AS cos_raw
  FROM q JOIN c ON q.vec_id <> c.vec_id
),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
    ) AS rk
    FROM tscored
  ) WHERE rk <= {TOP_K}
),
matches AS (
  SELECT t.query_id, COUNT(*) AS n_match
  FROM truth t JOIN approx a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
  GROUP BY t.query_id
)
SELECT q.query_id,
       CAST(COALESCE(m.n_match, 0) AS BIGINT)       AS n_match,
       FLOOR((COALESCE(m.n_match, 0) / {TOP_K}.0) * 1e4 + 0.5) / 1e4 AS recall_at_k
FROM (SELECT DISTINCT query_id FROM truth) q
LEFT JOIN matches m ON q.query_id = m.query_id
"""


@register(
    "q_ann_recall_matryoshka",
    oracle=_QMRL_ORACLE,
    description=(
        f"matryoshka truncation eval: recall@{TOP_K} of first-"
        f"{TRUNC_DIM}-dim cosine ranking vs the full-dimension ranking "
        "— the measured cost of serving the embedding prefix"
    ),
    tags=("similarity", "embedding", "matryoshka", "evaluation", "llm-pipeline"),
)
def q_ann_recall_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .brute import q_sim_brute_topk

    e = table(spark, sf_dir, "embeddings")
    tq = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.slice(as_double("embedding"), 1, TRUNC_DIM).alias("qemb"),
    ).withColumn("qn", norm(F.col("qemb")))
    tc = e.select(
        "vec_id", F.slice(as_double("embedding"), 1, TRUNC_DIM).alias("emb")
    ).withColumn("cn", norm(F.col("emb")))
    cos = dot(F.col("qemb"), F.col("emb")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("neighbor_id")
    )
    approx = (
        F.broadcast(tq)
        .crossJoin(tc)
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cos_raw"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    truth = q_sim_brute_topk(spark, sf_dir).select("query_id", "neighbor_id")
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
    )
