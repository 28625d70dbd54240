"""Experimentation-stack estimators: ratio metrics with delta-method
standard errors, and Wilson score intervals for rates.

The two formulas every A/B platform hard-codes:

- **Ratio metric + delta method**: business metrics are usually ratios
  of per-unit sums (revenue per order, items per session) whose SE is
  NOT the naive one — the delta method gives
  ``var(Y/X) ~ (1/mx^2)(vy - 2 r cov + r^2 vx)/n``. All moments here
  are exact integer sums (cents, counts); the SE is one mirrored double
  expression, so it oracles exactly.
- **Wilson score interval**: the right CI for a binomial rate (never
  leaves [0,1], behaves at small n — Brown/Cai/DasGupta 2001
  recommendation). Closed form over exact counts with one IEEE sqrt.

Per market segment, both estimators in one pass: ratio = revenue per
order, rate = share of high-priority orders. Scale: one groupBy over
the join; every statistic is a constant-width aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: z for 95% intervals, pinned as an exact literal both engines share.
Z95 = 1.959964

_QAB_ORACLE = f"""
WITH per_cust AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey AS cust,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           // 100 AS y,
         CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS hi
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_custkey
),
mom AS (
  SELECT segment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(hi) AS BIGINT) AS shi
  FROM per_cust
  GROUP BY segment
),
stats AS (
  SELECT segment, n, sx, sy, shi,
         CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) AS ratio,
         (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1e0)) AS vx,
         (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1e0)) AS vy,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1e0)) AS cxy,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx
  FROM mom
),
delta AS (
  SELECT segment, n, sx, shi, ratio,
         SQRT((vy - 2e0 * ratio * cxy + ratio * ratio * vx)
              / (mx * mx) / CAST(n AS DOUBLE)) AS se
  FROM stats
),
wilson AS (
  SELECT segment, n, sx, shi, ratio, se,
         CAST(shi AS DOUBLE) / CAST(sx AS DOUBLE) AS p,
         CAST(sx AS DOUBLE) AS nn
  FROM delta
)
SELECT segment,
       n AS n_customers,
       sx AS n_orders,
       FLOOR((ratio) * 1e4 + 0.5) / 1e4 AS revenue_per_order,
       FLOOR((se) * 1e4 + 0.5) / 1e4 AS ratio_se_delta,
       FLOOR((p) * 1e6 + 0.5) / 1e6 AS hi_rate,
       FLOOR(((p + {Z95}e0 * {Z95}e0 / (2e0 * nn)
              - {Z95}e0 * SQRT((p * (1e0 - p)
                                + {Z95}e0 * {Z95}e0 / (4e0 * nn)) / nn))
             / (1e0 + {Z95}e0 * {Z95}e0 / nn)) * 1e6 + 0.5) / 1e6 AS wilson_lo,
       FLOOR(((p + {Z95}e0 * {Z95}e0 / (2e0 * nn)
              + {Z95}e0 * SQRT((p * (1e0 - p)
                                + {Z95}e0 * {Z95}e0 / (4e0 * nn)) / nn))
             / (1e0 + {Z95}e0 * {Z95}e0 / nn)) * 1e6 + 0.5) / 1e6 AS wilson_hi
FROM wilson
ORDER BY segment
"""


@register(
    "q_ab_ratio_delta_wilson",
    oracle=_QAB_ORACLE,
    description=(
        "experimentation estimators per segment: revenue-per-order "
        "ratio with delta-method SE (exact integer moments) and Wilson "
        "95% interval for the high-priority rate"
    ),
    tags=("ab-testing", "statistics", "delta-method", "wilson", "aggregate"),
)
def q_ab_ratio_delta_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    per_cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey").alias("cust"),
        )
        .agg(
            F.count("*").alias("x"),
            F.expr(
                "CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) "
                "AS BIGINT) DIV 100"
            ).alias("y"),
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0)
            ).alias("hi"),
        )
    )
    mom = per_cust.groupBy("segment").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum("hi").alias("shi"),
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    nD = d("n")
    ratio = d("sy") / d("sx")
    vx = (nD * d("sxx") - d("sx") * d("sx")) / (nD * (nD - 1.0))
    vy = (nD * d("syy") - d("sy") * d("sy")) / (nD * (nD - 1.0))
    cxy = (nD * d("sxy") - d("sx") * d("sy")) / (nD * (nD - 1.0))
    mx = d("sx") / nD
    se = F.sqrt(
        (vy - F.lit(2.0) * ratio * cxy + ratio * ratio * vx)
        / (mx * mx)
        / nD
    )
    p = d("shi") / d("sx")
    nn = d("sx")
    z = F.lit(Z95)
    center = p + z * z / (F.lit(2.0) * nn)
    margin = z * F.sqrt((p * (F.lit(1.0) - p) + z * z / (F.lit(4.0) * nn)) / nn)
    denom = F.lit(1.0) + z * z / nn
    return mom.select(
        "segment",
        F.col("n").alias("n_customers"),
        F.col("sx").alias("n_orders"),
        (F.floor((ratio) * 1e4 + 0.5) / 1e4).alias("revenue_per_order"),
        (F.floor((se) * 1e4 + 0.5) / 1e4).alias("ratio_se_delta"),
        (F.floor((p) * 1e6 + 0.5) / 1e6).alias("hi_rate"),
        (F.floor(((center - margin) / denom) * 1e6 + 0.5) / 1e6).alias("wilson_lo"),
        (F.floor(((center + margin) / denom) * 1e6 + 0.5) / 1e6).alias("wilson_hi"),
    ).orderBy("segment")
