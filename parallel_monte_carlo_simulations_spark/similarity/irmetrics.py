"""IR ranking metrics for the ANN index: nDCG@k, MRR, MAP@k.

Recall@k (:mod:`.recall`) says WHETHER the true neighbors were found;
these say WHERE the index put them. nDCG@k weights each hit by
1/log2(rank+1), MRR is the reciprocal rank of the first hit, and MAP@k
averages precision at each hit position — the standard retrieval
triad, computed per query against the brute-force ground truth.

Exactness discipline: the log2 discount weights are precomputed as
INTEGER micro-units (``round(1e6 / log2(i+1))``) at module import and
embedded as identical CASE literals in both engines, so per-query DCG
is an integer sum; the AP precision terms are integer-divided
(``(1e6 * cum_hits) DIV rank``) before summing. One final rounded
division per metric — bit-identical cross-engine.

At 100 TB the shape is :mod:`.recall`'s: ground truth for a query
SAMPLE, a (query_id, neighbor_id) equi-join, per-query windows over at
most k rows each. Evaluation cost scales with the sample, not the
corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from .brute import _QBRUTE_ORACLE, TOP_K, q_sim_brute_topk
from .lsh import _lsh_oracle, q_sim_lsh_topk

#: Integer DCG discount weights in 1e-6 units: weight at rank i is
#: round(1e6 / log2(i + 1)). Literal-embedded in BOTH engines' queries.
_DCG_W = {i: round(1e6 / math.log2(i + 1)) for i in range(1, TOP_K + 1)}
#: Ideal DCG = all TOP_K positions relevant (truth always has TOP_K rows).
_IDCG_W = sum(_DCG_W.values())

_W_CASE = "CASE rk " + " ".join(
    f"WHEN {i} THEN {w}" for i, w in _DCG_W.items()
) + " ELSE 0 END"

_QIRMETRICS_ORACLE = f"""
WITH truth AS ({_QBRUTE_ORACLE}),
approx AS ({_lsh_oracle()}),
flagged AS (
  SELECT a.query_id, a.rk,
         CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS rel
  FROM approx a
  LEFT JOIN truth t
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
),
cum AS (
  SELECT query_id, rk, rel,
         SUM(rel) OVER (PARTITION BY query_id ORDER BY rk) AS cum_rel
  FROM flagged
),
per_query AS (
  SELECT query_id,
         CAST(SUM(rel) AS BIGINT) AS n_rel,
         SUM(rel * ({_W_CASE})) AS dcg_w,
         MIN(CASE WHEN rel = 1 THEN rk END) AS first_rel_rk,
         SUM(CASE WHEN rel = 1
                  THEN (1000000 * cum_rel) // rk ELSE 0 END) AS ap_w
  FROM cum
  GROUP BY query_id
)
SELECT q.query_id,
       CAST(COALESCE(p.n_rel, 0) AS BIGINT) AS n_rel,
       ROUND(CAST(COALESCE(p.dcg_w, 0) AS DOUBLE) / {_IDCG_W}e0, 6)
         AS ndcg_at_k,
       ROUND(COALESCE(CAST(1 AS DOUBLE) / p.first_rel_rk, 0e0), 6) AS mrr,
       ROUND(CAST(COALESCE(p.ap_w, 0) AS DOUBLE) / {TOP_K * 1000000}e0, 6)
         AS map_at_k
FROM (SELECT DISTINCT query_id FROM truth) q
LEFT JOIN per_query p ON q.query_id = p.query_id
"""


@register(
    "q_ann_ndcg_mrr_map",
    oracle=_QIRMETRICS_ORACLE,
    description=(
        f"ANN ranking quality: nDCG@{TOP_K}, MRR and MAP@{TOP_K} of the "
        "sign-LSH index vs brute-force truth, integer-exact log2 "
        "discounts, per query vector"
    ),
    tags=("similarity", "ann", "evaluation", "ranking", "composition"),
)
def q_ann_ndcg_mrr_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = q_sim_brute_topk(spark, sf_dir).select("query_id", "neighbor_id")
    approx = q_sim_lsh_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", "rk"
    )
    flagged = approx.join(
        truth.withColumn("rel", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    ).select(
        "query_id", "rk", F.coalesce("rel", F.lit(0)).alias("rel")
    )
    w = Window.partitionBy("query_id").orderBy("rk")
    cum = flagged.withColumn("cum_rel", F.sum("rel").over(w))
    w_case = F.expr(_W_CASE)
    per_query = cum.groupBy("query_id").agg(
        F.sum("rel").cast("long").alias("n_rel"),
        F.sum(F.col("rel") * w_case).alias("dcg_w"),
        F.min(F.when(F.col("rel") == 1, F.col("rk"))).alias("first_rel_rk"),
        F.sum(
            F.when(
                F.col("rel") == 1,
                F.expr("(1000000 * cum_rel) DIV rk"),
            ).otherwise(F.lit(0))
        ).alias("ap_w"),
    )
    return (
        truth.select("query_id")
        .distinct()
        .join(per_query, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_rel", F.lit(0)).cast("long").alias("n_rel"),
            F.round(
                F.coalesce("dcg_w", F.lit(0)) / F.lit(float(_IDCG_W)), 6
            ).alias("ndcg_at_k"),
            F.round(
                F.coalesce(F.lit(1.0) / F.col("first_rel_rk"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(
                F.coalesce("ap_w", F.lit(0))
                / F.lit(float(TOP_K * 1000000)),
                6,
            ).alias("map_at_k"),
        )
    )
