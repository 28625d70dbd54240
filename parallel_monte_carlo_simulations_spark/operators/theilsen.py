"""Theil-Sen robust trend estimation (median of pairwise slopes).

The non-parametric trend line of choice for noisy business series: the
slope estimate is the MEDIAN of all pairwise slopes
(y_j - y_i)/(x_j - x_i), i < j — a 29%-breakdown estimator immune to
the outlier days that wreck OLS — and the intercept is the median of
the per-point residual intercepts y_i - slope * x_i. Computed per
order priority over two years of daily revenue.

Scale design: the O(n^2) pair stage runs on the *aggregated* daily
series — the orders scan collapses to |priority| x |days| rows first,
so the pair join emits ~days^2/2 slopes per priority REGARDLESS of
fact-table scale (the calendar, not the data volume, bounds it). The
median is Spark's exact ``percentile`` aggregate (per-priority groups —
each group's slope multiset sorts within its own partition; priorities
parallelize). At a larger calendar span, swap in the classical
O(n log n) Theil-Sen refinement or sample pairs; the join shape is
unchanged.

Exactness: slopes are one double division of exact integers (identical
cross-engine); the median of an even count interpolates as the exact
midpoint in both engines (Spark ``percentile`` and DuckDB
``quantile_cont`` both land on (a+b)/2 — verified convention); the
intercept pass reuses the engine-identical slope double. Output rounds
to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Two calendar years bound the pair count at ~730^2/2 per priority.
DATE_LO = "1994-01-01"
DATE_HI = "1996-01-01"

_QTHEILSEN_ORACLE = f"""
WITH daily AS (
  SELECT o_orderpriority AS priority,
         CAST(date_diff('day', DATE '{DATE_LO}', CAST(o_orderdate AS DATE))
              AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS y
  FROM orders
  WHERE o_orderdate >= DATE '{DATE_LO}' AND o_orderdate < DATE '{DATE_HI}'
  GROUP BY priority, x
),
slopes AS (
  SELECT a.priority,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
  FROM daily a JOIN daily b
    ON a.priority = b.priority AND a.x < b.x
),
sen AS (
  SELECT priority,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         quantile_cont(slope, 0.5) AS sen_slope
  FROM slopes GROUP BY priority
),
intercepts AS (
  SELECT d.priority,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         quantile_cont(CAST(d.y AS DOUBLE) - s.sen_slope * CAST(d.x AS DOUBLE),
                       0.5) AS intercept
  FROM daily d JOIN sen s ON s.priority = d.priority
  GROUP BY d.priority
)
SELECT s.priority,
       i.n_days,
       s.n_pairs,
       FLOOR((s.sen_slope / 100.0) * 1e6 + 0.5) / 1e6 AS slope_per_day,
       FLOOR((i.intercept / 100.0) * 1e4 + 0.5) / 1e4 AS intercept_revenue
FROM sen s JOIN intercepts i ON i.priority = s.priority
ORDER BY s.priority
"""


@register(
    "q_stat_theil_sen",
    oracle=_QTHEILSEN_ORACLE,
    description=(
        "Theil-Sen robust trend per order priority over two years of "
        "daily revenue: median of all pairwise slopes (exact percentile "
        "over the calendar-bounded pair join) + median residual "
        "intercept, mirrored double arithmetic"
    ),
    tags=("statistics", "regression", "robust", "median", "join"),
)
def q_stat_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = (
        o.filter(
            (F.col("o_orderdate") >= F.lit(DATE_LO))
            & (F.col("o_orderdate") < F.lit(DATE_HI))
        )
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit(DATE_LO))
            .cast("long")
            .alias("x"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("y")
        )
    )

    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.priority") == F.col("b.priority"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.priority").alias("priority"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope"),
    )
    sen = slopes.groupBy("priority").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("sen_slope"),
    )

    intercepts = (
        daily.join(F.broadcast(sen.select("priority", "sen_slope")), "priority")
        .select(
            "priority",
            (
                F.col("y").cast("double")
                - F.col("sen_slope") * F.col("x").cast("double")
            ).alias("b0"),
        )
        .groupBy("priority")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.expr("percentile(b0, 0.5)").alias("intercept"),
        )
    )

    return (
        sen.join(intercepts, "priority")
        .select(
            "priority",
            "n_days",
            "n_pairs",
            (F.floor((F.col("sen_slope") / 100.0) * 1e6 + 0.5) / 1e6).alias("slope_per_day"),
            (F.floor((F.col("intercept") / 100.0) * 1e4 + 0.5) / 1e4).alias("intercept_revenue"),
        )
        .orderBy("priority")
    )
