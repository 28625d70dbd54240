"""kNN classification evaluation over embeddings (round 10).

The standard embedding-quality probe: classify a held-out query sample
by majority label vote among its k nearest neighbours and report
per-class accuracy — the eval loop behind "are these embeddings good
enough for retrieval-augmented labeling?", complementing the recall/
nDCG family (which scores the INDEX) by scoring the SPACE.

Determinism: neighbours come from the exact brute-force cosine top-k
(the verified ``topk_cosine`` shape, rounded-cosine orderings with id
tie-breaks); the vote argmax orders on (count DESC, label ASC), so the
prediction is cross-engine stable even on split votes.

Scale: the query panel is hash-selected AND CAPPED at 50 (vec_id % 25 == 3,
vec_id < 1250); the pairwise stage is the
broadcast-queries-into-corpus-scan plan that never shuffles the big
side. Votes and accuracy are query-sample-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, sql_as_double, sql_cosine
from ..registry import register
from ..tables import table
from .brute import topk_cosine

_K = 5  #: neighbours voting
_MOD, _RES = 25, 3  #: hash spread of the query panel
_MAX_Q = 50  #: panel CAP — vec_id < _MOD * _MAX_Q keeps the panel at
#: <= 50 queries at ANY corpus size, so the brute pairwise stage is
#: 50*n (linear), the recall-family convention; an uncapped %-sample
#: grows with n and turns the stage quadratic (measured 36.7x at the
#: tiled 10x before this cap)

_Q = sql_as_double("q.embedding")
_C = sql_as_double("c.embedding")

_QKNN_ORACLE = f"""
WITH q AS (
  SELECT vec_id, embedding, label FROM embeddings
  WHERE vec_id % {_MOD} = {_RES} AND vec_id < {_MOD * _MAX_Q}
),
c AS (SELECT vec_id, embedding, label FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS true_label,
         c.vec_id AS neighbor_id, c.label AS neighbor_label,
         {sql_cosine(_Q, _C)} AS cos_raw
  FROM q JOIN c ON q.vec_id <> c.vec_id
),
nn AS (
  SELECT query_id, true_label, neighbor_label FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
    ) AS rk
    FROM scored
  ) WHERE rk <= {_K}
),
votes AS (
  SELECT query_id, true_label, neighbor_label AS pred,
         COUNT(*) AS cnt
  FROM nn GROUP BY query_id, true_label, neighbor_label
),
best AS (
  SELECT query_id, true_label, pred FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cnt DESC, pred ASC
    ) AS rk
    FROM votes
  ) WHERE rk = 1
)
SELECT CAST(true_label AS INTEGER) AS true_label,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(COUNT(*) FILTER (WHERE pred = true_label) AS BIGINT)
         AS n_correct,
       FLOOR((CAST(COUNT(*) FILTER (WHERE pred = true_label) AS DOUBLE)
             / COUNT(*)) * 1e4 + 0.5) / 1e4 AS accuracy
FROM best
GROUP BY true_label
ORDER BY true_label
"""


@register(
    "q_ml_knn_eval",
    oracle=_QKNN_ORACLE,
    description=(
        f"kNN (k={_K}) classification eval on embeddings: capped "
        "hash-spread query panel, exact brute-cosine neighbours, majority label vote "
        "(count-desc/label-asc tie break), per-class accuracy — scores "
        "the embedding SPACE the way the recall family scores the index"
    ),
    tags=("ml", "similarity", "knn", "evaluation", "embedding"),
)
def q_ml_knn_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(
        (F.col("vec_id") % _MOD == _RES) & (F.col("vec_id") < _MOD * _MAX_Q)
    ).select(
        F.col("vec_id").alias("query_id"),
        as_double("embedding").alias("qemb"),
        F.col("label").alias("true_label"),
    )
    corpus = e.select(
        "vec_id", as_double("embedding").alias("emb"), "label"
    )
    nn = topk_cosine(
        queries.select("query_id", "qemb"), corpus, _K
    ).select("query_id", F.col("neighbor_label").alias("pred0"))
    votes = nn.groupBy("query_id", "pred0").agg(F.count("*").alias("cnt"))
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("cnt"), F.asc("pred0")
    )
    best = (
        votes.withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") == 1)
        .select("query_id", F.col("pred0").alias("pred"))
    )
    return (
        best.join(queries.select("query_id", "true_label"), "query_id")
        .groupBy(F.col("true_label").cast("int").alias("true_label"))
        .agg(
            F.count("*").cast("long").alias("n_queries"),
            F.count(F.when(F.col("pred") == F.col("true_label"), 1))
            .cast("long")
            .alias("n_correct"),
            (F.floor((F.count(F.when(F.col("pred") == F.col("true_label"), 1))
                .cast("double")
                / F.count("*")) * 1e4 + 0.5) / 1e4).alias("accuracy"),
        )
        .orderBy("true_label")
    )
