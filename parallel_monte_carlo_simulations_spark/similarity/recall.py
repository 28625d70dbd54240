"""ANN quality evaluation: recall@k of the LSH index against brute force.

Any production ANN deployment ships with a recall harness — the index
is only as good as its measured recall on the actual corpus. This query
IS that harness as a first-class engine query: per query vector,
``recall@k = |lsh_topk ∩ brute_topk| / k``. Both inputs are existing
fully-oracled queries (:mod:`.brute`, :mod:`.lsh`), so the oracle
composes their oracle SQLs as CTEs and replays the identical set
intersection — the evaluation itself is hash-verified cross-engine, not
just the indexes under evaluation.

At 100 TB the same shape holds: ground truth is computed for a small
query SAMPLE (brute force over the corpus is one broadcast-join scan
per sample batch), the index answers the same sample, and the join
below is on (query_id, neighbor_id) — trivially small. Recall
monitoring cost scales with the sample, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .brute import _QBRUTE_ORACLE, TOP_K, q_sim_brute_topk
from .lsh import _lsh_oracle, q_sim_lsh_topk

_QRECALL_ORACLE = f"""
WITH truth AS ({_QBRUTE_ORACLE}),
approx AS ({_lsh_oracle()}),
matches AS (
  SELECT t.query_id, COUNT(*) AS n_match
  FROM truth t JOIN approx a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
  GROUP BY t.query_id
)
SELECT q.query_id,
       CAST(COALESCE(m.n_match, 0) AS BIGINT)          AS n_match,
       FLOOR((COALESCE(m.n_match, 0) / {TOP_K}.0) * 1e4 + 0.5) / 1e4    AS recall_at_k
FROM (SELECT DISTINCT query_id FROM truth) q
LEFT JOIN matches m ON q.query_id = m.query_id
"""


@register(
    "q_ann_recall_eval",
    oracle=_QRECALL_ORACLE,
    description=(
        f"ANN eval harness: recall@{TOP_K} of the sign-LSH index vs the "
        "brute-force ground truth, per query vector"
    ),
    tags=("similarity", "ann", "evaluation", "composition"),
)
def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = q_sim_brute_topk(spark, sf_dir).select("query_id", "neighbor_id")
    approx = q_sim_lsh_topk(spark, sf_dir).select("query_id", "neighbor_id")
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


from .ivf import _QIVF_ORACLE, q_sim_ivf_topk  # noqa: E402

_QIVF_RECALL_ORACLE = f"""
WITH truth AS ({_QBRUTE_ORACLE}),
approx AS ({_QIVF_ORACLE}),
matches AS (
  SELECT t.query_id, COUNT(*) AS n_match
  FROM truth t JOIN approx a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
  GROUP BY t.query_id
)
SELECT q.query_id,
       CAST(COALESCE(m.n_match, 0) AS BIGINT)          AS n_match,
       FLOOR((COALESCE(m.n_match, 0) / {TOP_K}.0) * 1e4 + 0.5) / 1e4    AS recall_at_k
FROM (SELECT DISTINCT query_id FROM truth) q
LEFT JOIN matches m ON q.query_id = m.query_id
"""


@register(
    "q_ann_recall_eval_ivf",
    oracle=_QIVF_RECALL_ORACLE,
    description=(
        f"ANN eval harness over the IVF index: recall@{TOP_K} vs the "
        "brute-force ground truth per query vector (completes the "
        "recall loop across both ANN scale paths)"
    ),
    tags=("similarity", "ann", "evaluation", "ivf", "composition"),
)
def q_ann_recall_eval_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = q_sim_brute_topk(spark, sf_dir).select("query_id", "neighbor_id")
    approx = q_sim_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
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


from .pq import _QPQ_ORACLE, q_sim_pq_topk  # noqa: E402

_QPQ_RECALL_ORACLE = f"""
WITH truth AS ({_QBRUTE_ORACLE}),
approx AS ({_QPQ_ORACLE}),
matches AS (
  SELECT t.query_id, COUNT(*) AS n_match
  FROM truth t JOIN approx a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
  GROUP BY t.query_id
)
SELECT q.query_id,
       CAST(COALESCE(m.n_match, 0) AS BIGINT)          AS n_match,
       FLOOR((COALESCE(m.n_match, 0) / {TOP_K}.0) * 1e4 + 0.5) / 1e4    AS recall_at_k
FROM (SELECT DISTINCT query_id FROM truth) q
LEFT JOIN matches m ON q.query_id = m.query_id
"""


@register(
    "q_ann_recall_eval_pq",
    oracle=_QPQ_RECALL_ORACLE,
    description=(
        f"ANN eval harness over the PQ index: recall@{TOP_K} vs the "
        "brute-force ground truth per query vector — with the nDCG/MRR/"
        "MAP rows this completes the recall+ranking matrix for all "
        "three ANN scale paths"
    ),
    tags=("similarity", "ann", "evaluation", "pq", "composition"),
)
def q_ann_recall_eval_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = q_sim_brute_topk(spark, sf_dir).select("query_id", "neighbor_id")
    approx = q_sim_pq_topk(spark, sf_dir).select("query_id", "neighbor_id")
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
