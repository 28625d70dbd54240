"""Neyman optimal allocation — the variance-optimal stratified design.

Given a fixed sample budget B, Neyman allocation (Neyman 1934) assigns
each stratum a share proportional to N_s * sigma_s: bigger and noisier
strata get more samples, which minimizes the variance of the stratified
mean. The missing half of :func:`misc.q_sample_stratified` (which
implements proportional allocation): this computes the DESIGN.

Exactness discipline: per-stratum sigma comes from exact cent-integer
moments (one double sqrt — correctly-rounded IEEE, identical
cross-engine) and is floor-quantized to an integer weight; the
apportionment is the largest-remainder method on pure integers
(floor shares + ranked remainders), so the allocation is bit-exact and
always sums to exactly B.

Scale: one groupBy for the moments; the apportionment runs on the
stratum table (one row per stratum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Total sample budget to apportion.
BUDGET = 600

_QNEYMAN_ORACLE = f"""
WITH strata AS (
  SELECT c.c_mktsegment AS segment,
         CAST(COUNT(*) AS BIGINT) AS n_s,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) // 100)
              AS BIGINT) AS sx_d,
         CAST(SUM((CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) // 100)
                  * (CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) // 100))
              AS BIGINT) AS sxx_d
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment
),
weights AS (
  -- sigma in whole dollars from exact dollar-integer moments of the SAME
  -- floored-dollar series (so n*sxx - sx^2 >= 0 by Cauchy-Schwarz, even
  -- for a constant stratum); weight w_s = floor(N_s * sigma), integerized
  SELECT segment, n_s,
         CAST(floor(sqrt((CAST(n_s AS DOUBLE) * CAST(sxx_d AS DOUBLE)
                          - CAST(sx_d AS DOUBLE) * CAST(sx_d AS DOUBLE))
                         / (CAST(n_s AS DOUBLE)
                            * (CAST(n_s AS DOUBLE) - 1e0)))) AS BIGINT)
           AS sigma_d
  FROM strata
),
w2 AS (
  SELECT segment, n_s, sigma_d, n_s * sigma_d AS w,
         SUM(n_s * sigma_d) OVER () AS w_tot
  FROM weights
),
base AS (
  SELECT segment, n_s, sigma_d, w, w_tot,
         ({BUDGET} * w) // w_tot AS floor_share,
         ({BUDGET} * w) % w_tot AS remainder
  FROM w2
),
leftover AS (
  SELECT *, {BUDGET} - SUM(floor_share) OVER () AS extra,
         ROW_NUMBER() OVER (ORDER BY remainder DESC, segment) AS rk
  FROM base
)
SELECT segment, n_s, sigma_d,
       CAST(floor_share + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM leftover
ORDER BY segment
"""


@register(
    "q_sample_neyman_allocation",
    oracle=_QNEYMAN_ORACLE,
    description=(
        f"Neyman optimal allocation of a {BUDGET}-row sample budget: "
        "N_s*sigma_s integer weights + largest-remainder apportionment "
        "— variance-optimal stratified design, sums exactly to budget"
    ),
    tags=("sampling", "stratified", "neyman", "statistics", "design"),
)
def q_sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    dollars = F.expr(
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) DIV 100"
    )
    strata = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).groupBy(
        F.col("c_mktsegment").alias("segment")
    ).agg(
        F.count("*").alias("n_s"),
        F.sum(dollars).alias("sx_d"),
        F.sum(dollars * dollars).alias("sxx_d"),
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    # moments of the same floored-dollar series: radicand >= 0 always
    sigma_d = F.floor(
        F.sqrt(
            (d("n_s") * d("sxx_d") - d("sx_d") * d("sx_d"))
            / (d("n_s") * (d("n_s") - F.lit(1.0)))
        )
    ).cast("long")
    weights = strata.select("segment", "n_s", sigma_d.alias("sigma_d"))
    wall = Window.partitionBy()
    w2 = weights.select(
        "segment",
        "n_s",
        "sigma_d",
        (F.col("n_s") * F.col("sigma_d")).alias("w"),
        F.sum(F.col("n_s") * F.col("sigma_d")).over(wall).alias("w_tot"),
    )
    base = w2.select(
        "segment",
        "n_s",
        "sigma_d",
        F.expr(f"({BUDGET} * w) DIV w_tot").alias("floor_share"),
        ((F.lit(BUDGET) * F.col("w")) % F.col("w_tot")).alias("remainder"),
    )
    leftover = base.select(
        "*",
        (F.lit(BUDGET) - F.sum("floor_share").over(wall)).alias("extra"),
        F.row_number()
        .over(Window.orderBy(F.desc("remainder"), "segment"))
        .alias("rk"),
    )
    return leftover.select(
        "segment",
        "n_s",
        "sigma_d",
        (
            F.col("floor_share")
            + F.when(F.col("rk") <= F.col("extra"), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("alloc"),
    ).orderBy("segment")
