"""Offline changepoint detection: CUSUM (Page) over per-type daily
series, integer-exact.

The first step of every binary-segmentation changepoint pipeline: for
each series, the cumulative sum of deviations from the series mean,
C_i = sum_{j<=i} (x_j - mean), peaks in absolute value at the most
likely single changepoint. Event values are exact cents, so the whole
statistic stays in integer arithmetic via the standard scaling trick:

    n * C_i = n * prefix_i - i * total        (all BIGINT)

— no float drift, identical in both engines; the reported statistic is
one final rounded division back to value units. The changepoint is the
day with the maximum |n * C_i| (earliest day on ties, deterministic),
excluding the final day (C_n == 0 by construction carries no signal).
Pre/post-split means are exact cent sums divided once.

Scale: one groupBy to days (map-side combinable), one prefix-sum window
per type (narrow, partition = series), one argmax window — state is
O(days per series), never O(events). This is the shape that holds when
each series has years of days and there are millions of series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.microunit import rdiv_halfup_duck, rdiv_halfup_expr
from ..registry import register
from ..tables import table

_QCUSUM_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events
  GROUP BY event_type, date_trunc('day', ts)
),
series AS (
  SELECT event_type, day, cents,
         SUM(cents) OVER (PARTITION BY event_type ORDER BY day) AS prefix,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i,
         SUM(cents) OVER (PARTITION BY event_type) AS total,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
scored AS (
  SELECT event_type, day, i, n, prefix, total,
         n * prefix - i * total AS c_scaled
  FROM series
  WHERE i < n AND n >= 2
),
best AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY ABS(c_scaled) DESC, day ASC
    ) AS rk
    FROM scored
  ) WHERE rk = 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       strftime(day, '%Y-%m-%d') AS cp_day,
       {rdiv_halfup_duck("ABS(c_scaled)", "n * 100")} AS cusum_stat,
       {rdiv_halfup_duck("prefix", "i * 100")} AS mean_before,
       {rdiv_halfup_duck("total - prefix", "(n - i) * 100")} AS mean_after
FROM best
ORDER BY event_type
"""


@register(
    "q_changepoint_cusum",
    oracle=_QCUSUM_ORACLE,
    description=(
        "offline CUSUM changepoint per event-type daily series: "
        "integer-exact n*C_i = n*prefix - i*total statistic, earliest "
        "argmax day, pre/post means — O(days) state per series"
    ),
    tags=("timeseries", "changepoint", "cusum", "statistics", "window"),
)
def q_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    wp = Window.partitionBy("event_type").orderBy("day")
    wt = Window.partitionBy("event_type")
    series = daily.select(
        "event_type",
        "day",
        F.sum("cents").over(wp).alias("prefix"),
        F.row_number().over(wp).alias("i"),
        F.sum("cents").over(wt).alias("total"),
        F.count("*").over(wt).alias("n"),
    )
    scored = series.filter(
        (F.col("i") < F.col("n")) & (F.col("n") >= 2)
    ).withColumn(
        "c_scaled",
        F.col("n") * F.col("prefix") - F.col("i") * F.col("total"),
    )
    wbest = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("c_scaled")).desc(), F.col("day").asc()
    )
    best = scored.withColumn("rk", F.row_number().over(wbest)).filter(
        F.col("rk") == 1
    )
    # Final divisions rounded half-up in PURE INTEGER arithmetic
    # (quotients can tie exactly at the 5th decimal, where double ROUND
    # and the engines' decimal-division scales both disagree —
    # observed: 3031.9388 vs .9387), then ONE correctly-rounded
    # string->double cast (rdiv_halfup_expr / rdiv_halfup_duck — see
    # functions/microunit.py for the full history: the r8 split form
    # double(whole)+double(frac)/1e4 was one ulp off the Decimal
    # contract near half-ulp boundaries, Hypothesis falsifier
    # 85612902/9281852; the string form is exact at any magnitude).
    staged = best.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.date_format("day", "yyyy-MM-dd").alias("cp_day"),
        F.abs("c_scaled").alias("num_c"),
        (F.col("n") * 100).cast("long").alias("den_c"),
        F.col("prefix").alias("num_b"),
        (F.col("i") * 100).cast("long").alias("den_b"),
        (F.col("total") - F.col("prefix")).alias("num_a"),
        ((F.col("n") - F.col("i")) * 100).cast("long").alias("den_a"),
    )

    _rdiv = rdiv_halfup_expr

    return staged.select(
        "event_type",
        "n_days",
        "cp_day",
        _rdiv("num_c", "den_c").alias("cusum_stat"),
        _rdiv("num_b", "den_b").alias("mean_before"),
        _rdiv("num_a", "den_a").alias("mean_after"),
    ).orderBy("event_type")
