"""Exact weighted percentiles via cumulative-weight windows.

Survey/metrics pipelines weight observations (sampling weights, revenue
weights); the weighted median/percentile is then the smallest value
whose CUMULATIVE weight reaches p of the total — not a built-in
aggregate in either engine, but exactly expressible as one sort-window
pass: cumulative sum of weights per group, filter the first row at or
past the threshold. One shuffle on the group key; the window carries a
single running sum — the same cost as any ranked window at scale.

Weighted median of lineitem prices weighted by quantity, per return
flag: "the price point at which half the shipped QUANTITY is cheaper".
Both engines run the identical definition (ties: the first row in
(value, tie-break) order at or past the threshold), so the result is
exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

# p as exact fractions num/den: the threshold test is integer-scaled
# (cum * den >= num * total) so both engines evaluate one exact product
# of integral-valued doubles — never `cum >= 0.9 * total`, whose 0.9
# literal DuckDB types as DECIMAL while Spark multiplies in DOUBLE,
# letting a cumulative weight that lands exactly on the boundary pick
# different rows per engine.
PCTS = ((25, 1, 4), (50, 1, 2), (90, 9, 10))

_CASES = ", ".join(
    f"""FLOOR(MIN(CASE WHEN cum * {den} >= {num} * total
               THEN l_extendedprice END)
      * 100 + 0.5e0) / 100 AS wp{pct}"""
    for pct, num, den in PCTS
)

_QWMED_ORACLE = f"""
WITH w AS (
  SELECT l_returnflag, l_extendedprice, l_quantity,
         SUM(l_quantity) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS total
  FROM lineitem
)
SELECT l_returnflag, {_CASES},
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM w
GROUP BY l_returnflag
"""


@register(
    "q_weighted_percentiles",
    oracle=_QWMED_ORACLE,
    description=(
        "exact weighted percentiles (25/50/90) of price weighted by "
        "quantity per return flag, via one cumulative-weight window pass"
    ),
    tags=("window", "statistics", "weighted", "percentile"),
)
def q_weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    order = [F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")]
    cum = F.sum("l_quantity").over(
        Window.partitionBy("l_returnflag")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum("l_quantity").over(Window.partitionBy("l_returnflag"))
    w = li.select(
        "l_returnflag",
        "l_extendedprice",
        cum.alias("cum"),
        total.alias("total"),
    )
    aggs = [
        (
            F.floor(
                F.min(
                    F.when(
                        F.col("cum") * den >= F.lit(num) * F.col("total"),
                        F.col("l_extendedprice"),
                    )
                )
                * 100
                + 0.5
            )
            / 100
        ).alias(f"wp{pct}")
        for pct, num, den in PCTS
    ]
    return w.groupBy("l_returnflag").agg(
        *aggs, F.count(F.lit(1)).cast("long").alias("n_rows")
    )
