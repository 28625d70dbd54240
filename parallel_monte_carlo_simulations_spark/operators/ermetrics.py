"""Entity-resolution blocking quality metrics (round 10).

Before trusting a blocking scheme, measure it: REDUCTION RATIO (how
much of the all-pairs space the blocking prunes) and PAIR COMPLETENESS
(what share of the true duplicate pairs survive into the candidate
set) — the standard Christen blocking-evaluation pair. Evaluates the
exact sorted-neighborhood blocking ``q_er_pipeline`` uses (same
p_name block key, same window B), against the same-name ground truth,
with everything derived from per-block COUNTS — the truth-pair and
candidate-pair totals are closed forms over block sizes, so the audit
never materializes a single pair: it is strictly cheaper than the
blocking it evaluates, at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.microunit import rdiv_halfup_duck, rdiv_halfup_expr
from ..registry import register
from ..tables import table
from .erpipeline import WINDOW_B

_QBLOCKQ_ORACLE = f"""
WITH blocks AS (
  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS g
  FROM part GROUP BY p_name
),
per_block AS (
  SELECT g,
         g * (g - 1) // 2 AS truth_pairs,
         CASE WHEN g - 1 <= {WINDOW_B}
              THEN g * (g - 1) // 2
              ELSE {WINDOW_B} * g - ({WINDOW_B} * ({WINDOW_B} + 1)) // 2
         END AS cand_pairs
  FROM blocks
),
tot AS (
  SELECT CAST(SUM(g) AS BIGINT) AS n_recs,
         CAST(SUM(truth_pairs) AS BIGINT) AS n_truth,
         CAST(SUM(cand_pairs) AS BIGINT) AS n_cand,
         CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(MAX(g) AS BIGINT) AS max_block
  FROM per_block
)
SELECT n_recs, n_blocks, max_block, n_truth AS truth_pairs,
       n_cand AS candidate_pairs,
       {rdiv_halfup_duck("n_cand", "n_truth", 6)} AS pair_completeness,
       {rdiv_halfup_duck(
           "n_recs * (n_recs - 1) - 2 * n_cand",
           "n_recs * (n_recs - 1)", 6)}
         AS reduction_ratio
FROM tot
"""


@register(
    "q_er_blocking_quality",
    oracle=_QBLOCKQ_ORACLE,
    description=(
        "blocking-scheme evaluation (Christen metrics) for the "
        f"sorted-neighborhood blocking of q_er_pipeline (window B="
        f"{WINDOW_B}, p_name blocks): pair completeness vs the "
        "same-name ground truth and reduction ratio vs the all-pairs "
        "space — closed forms over block sizes, no pair ever "
        "materializes"
    ),
    tags=("dedup", "entity-resolution", "evaluation", "aggregate"),
)
def q_er_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within a block of size g the window-B sorted neighborhood emits
    Σ_{i=1..g-1} min(B, g-i) = B*g - B(B+1)/2 pairs (or all C(g,2) when
    g-1 <= B), so both totals reduce to one groupBy + one row."""
    p = table(spark, sf_dir, "part")
    blocks = p.groupBy("p_name").agg(F.count(F.lit(1)).cast("long").alias("g"))
    g = F.col("g")
    truth = (g * (g - 1) / 2).cast("long")
    cand = F.when(g - 1 <= WINDOW_B, truth).otherwise(
        (WINDOW_B * g - WINDOW_B * (WINDOW_B + 1) / 2).cast("long")
    )
    per_block = blocks.select(
        "g", truth.alias("truth_pairs"), cand.alias("cand_pairs")
    )
    tot = per_block.agg(
        F.sum("g").cast("long").alias("n_recs"),
        F.sum("truth_pairs").cast("long").alias("n_truth"),
        F.sum("cand_pairs").cast("long").alias("n_cand"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.max("g").cast("long").alias("max_block"),
    )
    return tot.select(
        "n_recs",
        "n_blocks",
        "max_block",
        F.col("n_truth").alias("truth_pairs"),
        F.col("n_cand").alias("candidate_pairs"),
        rdiv_halfup_expr("n_cand", "n_truth", 6).alias(
            "pair_completeness"
        ),
        rdiv_halfup_expr(
            "n_recs * (n_recs - 1) - 2 * n_cand",
            "n_recs * (n_recs - 1)",
            6,
        ).alias("reduction_ratio"),
    )
