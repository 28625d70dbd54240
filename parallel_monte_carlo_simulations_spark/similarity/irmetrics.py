"""IR ranking metrics for ALL three ANN indexes: nDCG@k, MRR, MAP@k.

Recall@k (:mod:`.recall`) says WHETHER the true neighbors were found;
these say WHERE the index put them. nDCG@k weights each hit by
1/log2(rank+1), MRR is the reciprocal rank of the first hit, and MAP@k
averages precision at each hit position — the standard retrieval
triad, computed per query against the brute-force ground truth. One
registered query per index variant (sign-LSH, IVF, PQ) completes the
index-quality matrix: recall + ranking for every scale path.

Exactness discipline: the log2 discount weights are precomputed as
INTEGER micro-units (``round(1e6 / log2(i+1))``) at module import and
embedded as identical CASE literals in both engines, so per-query DCG
is an integer sum; the AP precision terms are integer-divided
(``(1e6 * cum_hits) DIV rank``) before summing. One final rounded
division per metric — bit-identical cross-engine.

Ideal DCG is computed from the PER-QUERY truth row count (the integer
prefix-sums of the weight table, again a shared CASE literal), not a
fixed TOP_K constant — a corpus with <= TOP_K+1 vectors yields fewer
than TOP_K true neighbors per query and a fixed-K ideal would
systematically deflate nDCG. MAP@k keeps the fixed-k normalization
(divide by TOP_K, the "AP@k" convention of the MSMARCO/TREC-DL eval
scripts) — deliberate, identical in both engines.

At 100 TB the shape is :mod:`.recall`'s: ground truth for a query
SAMPLE, a (query_id, neighbor_id) equi-join, per-query windows over at
most k rows each. Evaluation cost scales with the sample, not the
corpus.
"""

from __future__ import annotations

import math
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from .brute import _QBRUTE_ORACLE, TOP_K, q_sim_brute_topk
from .ivf import _QIVF_ORACLE, q_sim_ivf_topk
from .lsh import _lsh_oracle, q_sim_lsh_topk
from .pq import _QPQ_ORACLE, q_sim_pq_topk

#: Integer DCG discount weights in 1e-6 units: weight at rank i is
#: round(1e6 / log2(i + 1)). Literal-embedded in BOTH engines' queries.
_DCG_W = {i: round(1e6 / math.log2(i + 1)) for i in range(1, TOP_K + 1)}
#: Prefix sums: ideal DCG when the query has n true neighbors (n <= k).
_CUM_W = {n: sum(_DCG_W[i] for i in range(1, n + 1)) for n in range(1, TOP_K + 1)}

_W_CASE = "CASE rk " + " ".join(
    f"WHEN {i} THEN {w}" for i, w in _DCG_W.items()
) + " ELSE 0 END"
#: Ideal DCG for a query with n_truth relevant items.
_IDCG_CASE = "CASE n_truth " + " ".join(
    f"WHEN {n} THEN {w}" for n, w in _CUM_W.items()
) + " ELSE 0 END"

# 2^53 fence (functions/microunit.py): every micro-unit aggregate here
# is bounded STATICALLY — per-query DCG/AP sums run over at most TOP_K
# ranks of <= 1e6-unit terms, so the worst case is TOP_K * 1e6, five
# orders below the exactly-representable double range. Enforced at
# import so a future TOP_K/unit-scale bump cannot silently reintroduce
# double-rounding in the final /1e6 conversions.
assert TOP_K * 1_000_000 < 2**53, "irmetrics micro-unit sums not double-exact"
assert max(_CUM_W.values()) < 2**53


def _ir_oracle(approx_cte: str) -> str:
    """The shared metric SQL, parameterized by the approx index CTE."""
    return f"""
WITH truth AS ({_QBRUTE_ORACLE}),
approx AS ({approx_cte}),
truth_n AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_truth
  FROM truth GROUP BY query_id
),
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
       FLOOR((CASE WHEN ({_IDCG_CASE}) = 0 THEN 0e0
             ELSE CAST(COALESCE(p.dcg_w, 0) AS DOUBLE) / ({_IDCG_CASE}) END) * 1e6 + 0.5) / 1e6
         AS ndcg_at_k,
       FLOOR((COALESCE(CAST(1 AS DOUBLE) / p.first_rel_rk, 0e0)) * 1e6 + 0.5) / 1e6 AS mrr,
       FLOOR((CAST(COALESCE(p.ap_w, 0) AS DOUBLE) / {TOP_K * 1000000}e0) * 1e6 + 0.5) / 1e6
         AS map_at_k
FROM (SELECT query_id, n_truth FROM truth_n) q
LEFT JOIN per_query p ON q.query_id = p.query_id
"""


def _ir_metrics(
    spark: SparkSession,
    sf_dir: str,
    approx_fn: Callable[[SparkSession, str], DataFrame],
) -> DataFrame:
    truth = q_sim_brute_topk(spark, sf_dir).select("query_id", "neighbor_id")
    truth_n = truth.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_truth")
    )
    approx = approx_fn(spark, sf_dir).select("query_id", "neighbor_id", "rk")
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
    idcg = F.expr(_IDCG_CASE)
    return (
        truth_n.join(per_query, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_rel", F.lit(0)).cast("long").alias("n_rel"),
            (F.floor((F.when(idcg == 0, F.lit(0.0)).otherwise(
                    F.coalesce("dcg_w", F.lit(0)).cast("double") / idcg
                )) * 1e6 + 0.5) / 1e6).alias("ndcg_at_k"),
            (F.floor((F.coalesce(F.lit(1.0) / F.col("first_rel_rk"), F.lit(0.0))) * 1e6 + 0.5) / 1e6).alias("mrr"),
            (F.floor((F.coalesce("ap_w", F.lit(0))
                / F.lit(float(TOP_K * 1000000))) * 1e6 + 0.5) / 1e6).alias("map_at_k"),
        )
    )


@register(
    "q_ann_ndcg_mrr_map",
    oracle=_ir_oracle(_lsh_oracle()),
    description=(
        f"ANN ranking quality: nDCG@{TOP_K}, MRR and MAP@{TOP_K} of the "
        "sign-LSH index vs brute-force truth, integer-exact log2 "
        "discounts, per-query-truth-count ideal DCG"
    ),
    tags=("similarity", "ann", "evaluation", "ranking", "composition"),
)
def q_ann_ndcg_mrr_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ir_metrics(spark, sf_dir, q_sim_lsh_topk)


@register(
    "q_ann_ndcg_ivf",
    oracle=_ir_oracle(_QIVF_ORACLE),
    description=(
        f"ANN ranking quality: nDCG@{TOP_K}, MRR and MAP@{TOP_K} of the "
        "IVF (nprobe-pruned k-means) index vs brute-force truth — same "
        "integer-exact metric join as the LSH variant"
    ),
    tags=("similarity", "ann", "evaluation", "ranking", "ivf"),
)
def q_ann_ndcg_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ir_metrics(spark, sf_dir, q_sim_ivf_topk)


@register(
    "q_ann_ndcg_pq",
    oracle=_ir_oracle(_QPQ_ORACLE),
    description=(
        f"ANN ranking quality: nDCG@{TOP_K}, MRR and MAP@{TOP_K} of the "
        "product-quantization (ADC + re-rank) index vs brute-force "
        "truth — completes the recall+ranking matrix for all three "
        "ANN scale paths"
    ),
    tags=("similarity", "ann", "evaluation", "ranking", "pq"),
)
def q_ann_ndcg_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ir_metrics(spark, sf_dir, q_sim_pq_topk)
