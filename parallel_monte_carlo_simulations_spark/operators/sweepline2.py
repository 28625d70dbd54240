"""Interval analytics, round-10 addition: per-user union coverage.

``q_interval_concurrency`` (sweepline.py) sweeps GLOBAL concurrency;
this answers the per-entity complement: of each user's active span,
how much wall-clock is actually covered by the union of their session
intervals, in how many disjoint islands, with how much gap — the SLA /
utilization / billing-coverage computation. Same gaps-and-islands
window (one user-keyed shuffle, no interval self-join): an interval
starts a new island iff its start exceeds the running max end of all
prior intervals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.microunit import rdiv_halfup_duck, rdiv_halfup_expr
from ..registry import register
from ..tables import table

#: Same half-open session interval the sweepline family uses: 10 min.
_SESSION_US = 600_000_000

_QCOVER_ORACLE = f"""
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + {_SESSION_US} AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              OR MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
merged AS (
  SELECT user_id, island, MIN(s) AS s, MAX(e) AS e
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT)                    AS n_islands,
       CAST(SUM(e - s) AS BIGINT)                  AS covered_us,
       CAST(MAX(e) - MIN(s) AS BIGINT)             AS span_us,
       CAST(MAX(e) - MIN(s) - SUM(e - s) AS BIGINT) AS gap_us,
       {rdiv_halfup_duck("SUM(e - s)", "MAX(e) - MIN(s)", 6)}
         AS coverage_ratio
FROM merged GROUP BY user_id
"""


@register(
    "q_interval_union_coverage",
    oracle=_QCOVER_ORACLE,
    description=(
        "interval union coverage: per user, merge overlapping 10-min "
        "session intervals (gaps-and-islands window, no self-join) and "
        "report island count, covered microseconds, active span, gap "
        "total, and coverage ratio — the utilization/SLA computation"
    ),
    tags=("interval", "sweepline", "window", "timeseries", "analytics"),
)
def q_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear in events per user: one (user, start) sort inside a single
    user-keyed shuffle, then a per-user aggregate over merged islands —
    all integers (microseconds), so the coverage arithmetic is exact on
    both engines."""
    e = table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + _SESSION_US).alias("e"),
    )
    prior = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    max_prior_e = F.max("e").over(prior)
    flagged = iv.withColumn(
        "new_island",
        F.when(
            max_prior_e.isNull() | (F.col("s") > max_prior_e), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(run))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    covered = F.sum(F.col("e") - F.col("s"))
    span = F.max("e") - F.min("s")
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            covered.cast("long").alias("covered_us"),
            span.cast("long").alias("span_us"),
            (span - covered).cast("long").alias("gap_us"),
        )
        .select(
            "user_id",
            "n_islands",
            "covered_us",
            "span_us",
            "gap_us",
            rdiv_halfup_expr("covered_us", "span_us", 6).alias(
                "coverage_ratio"
            ),
        )
    )
