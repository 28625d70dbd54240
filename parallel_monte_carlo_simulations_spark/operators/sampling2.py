"""Weighted reservoir sampling (Efraimidis–Spirakis) — deterministic.

Weighted sampling without replacement at scale: assign each row the key
``ln(u) / w`` (u uniform, w the weight) and keep the k LARGEST keys —
the distributed formulation of the classic A-ES reservoir, and the plan
is a ``TakeOrderedAndProject``: every partition keeps its local top-k,
only k rows per partition cross the wire, no full sort, no shuffle of
the table. High-weight rows get keys near zero and win proportionally —
the estimator's inclusion probabilities follow the weights.

Determinism: u derives from the portable md5 hash (``functions.hashing``)
— ``(h + 1) / 2^60`` with h a 60-bit integer, so the BIGINT→DOUBLE
rounding and the power-of-two division are identical in both engines —
and the single ``ln``/divide per row is rounded to 12 decimals before
ranking (ties then break on the row id), so the selected SET matches the
DuckDB oracle exactly. No RNG state anywhere: re-running, retrying, or
re-partitioning cannot change the sample — the property that makes
hash-derived sampling the right design for reproducible 100 TB data
curation (same reasoning as the MC seed discipline in ``mc/seeds.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60, sql_hash60
from ..functions.microunit import rdiv_halfup_duck, rdiv_halfup_expr
from ..registry import register
from ..tables import table

K = 50
_TWO60 = float(1 << 60)

_QWRS_ORACLE = f"""
WITH keyed AS (
  SELECT o_orderkey,
         o_totalprice AS weight,
         FLOOR((ln((CAST({sql_hash60("CAST(o_orderkey AS VARCHAR)")} + 1 AS DOUBLE))
                  / {_TWO60!r}) / o_totalprice) * 1e12 + 0.5) / 1e12 AS kk
  FROM orders
)
SELECT o_orderkey, FLOOR((weight) * 1e2 + 0.5) / 1e2 AS weight, kk,
       CAST(ROW_NUMBER() OVER (ORDER BY kk DESC, o_orderkey) AS INTEGER) AS rk
FROM keyed
ORDER BY kk DESC, o_orderkey
LIMIT {K}
"""


@register(
    "q_sample_weighted_reservoir",
    oracle=_QWRS_ORACLE,
    description=(
        "Efraimidis-Spirakis weighted reservoir sample (k=50) of orders by "
        "totalprice via hash-derived keys; deterministic, no RNG state"
    ),
    tags=("sampling", "weighted", "reservoir", "curation", "scale"),
)
def q_sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    u = (hash60(F.col("o_orderkey").cast("string")) + 1).cast("double") / F.lit(
        _TWO60
    )
    kk = (F.floor((F.log(u) / F.col("o_totalprice")) * 1e12 + 0.5) / 1e12)
    keyed = o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("weight"),
        kk.alias("kk"),
    )
    from pyspark.sql import Window

    return (
        keyed.orderBy(F.col("kk").desc(), "o_orderkey")
        .limit(K)
        .withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.col("kk").desc(), "o_orderkey"))
            .cast("int"),
        )
        .select("o_orderkey", (F.floor((F.col("weight")) * 1e2 + 0.5) / 1e2).alias("weight"), "kk", "rk")
    )


#: Stratified sampling rate as an exact integer threshold: keep a row
#: iff its 60-bit hash < 2^60 / 50 (= 2%). Pure integer compare — no
#: float rate anywhere, so both engines select the identical set.
_STRATA_T = (1 << 60) // 50

_QSTRAT_ORACLE = f"""
WITH keyed AS (
  SELECT c_mktsegment,
         {sql_hash60("CAST(c_custkey AS VARCHAR)")} AS h
  FROM customer
)
SELECT c_mktsegment AS stratum,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN h < {_STRATA_T} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sampled,
       {rdiv_halfup_duck(
           f"SUM(CASE WHEN h < {_STRATA_T} THEN 1 ELSE 0 END)",
           "COUNT(*)", 6)} AS achieved_rate,
       {rdiv_halfup_duck(
           f"ABS(50 * SUM(CASE WHEN h < {_STRATA_T} THEN 1 ELSE 0 END)"
           f" - COUNT(*))",
           "50 * COUNT(*)", 6)} AS abs_rate_err
FROM keyed
GROUP BY c_mktsegment
ORDER BY stratum
"""


@register(
    "q_sample_stratified_hash",
    oracle=_QSTRAT_ORACLE,
    description=(
        "deterministic 2% stratified sample audit by market segment: "
        "per-stratum hash-Bernoulli selection via an exact integer "
        "threshold (2^60/50) with achieved-rate error — reproducible "
        "under retries/repartitioning, the sampling design a 100 TB "
        "curation pipeline can re-run byte-identically"
    ),
    tags=("sampling", "stratified", "curation", "deterministic"),
)
def q_sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum Bernoulli selection from the row key's portable
    60-bit hash: membership is h < 2^60/50, an integer compare, so the
    selected set — not just its size — is identical across engines,
    retries, and partitionings. One scan, one grouped aggregate; the
    per-stratum achieved rate converges to 2% by hash uniformity
    (the audit columns make the convergence visible)."""
    c = table(spark, sf_dir, "customer")
    keyed = c.select(
        "c_mktsegment",
        hash60(F.col("c_custkey").cast("string")).alias("h"),
    )
    sampled = F.sum(
        F.when(F.col("h") < F.lit(_STRATA_T), 1).otherwise(0)
    )
    return (
        keyed.groupBy(F.col("c_mktsegment").alias("stratum"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            sampled.cast("long").alias("n_sampled"),
        )
        .select(
            "stratum",
            "n_rows",
            "n_sampled",
            rdiv_halfup_expr("n_sampled", "n_rows", 6).alias(
                "achieved_rate"
            ),
            # |rate - 0.02| as the exact rational |50*k - n| / (50*n)
            rdiv_halfup_expr(
                "abs(50 * n_sampled - n_rows)", "50 * n_rows", 6
            ).alias("abs_rate_err"),
        )
        .orderBy("stratum")
    )
