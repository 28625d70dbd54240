"""Holt linear-trend exponential smoothing (double exponential).

The classical short-horizon forecaster for trending business series:
level and trend recurrences

    l_t = a*y_t + (1-a)*(l_{t-1} + b_{t-1})
    b_t = g*(l_t - l_{t-1}) + (1-g)*b_{t-1}

with the simple initialization l_1 = y_1, b_1 = 0 (stated convention,
mirrored in both engines), and the h-step forecast l_n + h*b_n.

A sequential recurrence looks Spark-hostile, but the right scale shape
is: the fact scan collapses to |event_type| x |days| rows FIRST, the
per-series fold then runs over a calendar-bounded array (hundreds of
elements) — ``F.aggregate`` over ``sort_array(collect_list(...))``,
one fold per series key, all series in parallel. 100 TB of events still
aggregates to the same |days|-long series per type; only the
pre-aggregation scales, and it is a plain partial+final hash aggregate.

Cross-engine exactness: the recurrence is pure double arithmetic, so
instead of exact integers the discipline is IDENTICAL OPERATION ORDER —
the Spark lambda and the DuckDB recursive-CTE step spell the same
multiply/add association (a*y + (1-a)*(l+b); g*(l_new - l) + (1-g)*b),
and IEEE-754 doubles are deterministic given the op sequence, so both
engines produce bit-identical folds before the final mirrored unscale
and ROUND. Inputs enter the fold as exact scaled-integer cents cast to
double (identical in both engines). Smoothing weights are dyadic
rationals (a=0.5, g=0.25) so every multiply is an exponent shift —
exact, no representation error in the coefficients themselves.

Reference scope: forecasting is part of the required analytics surface
(SURVEY.md §2.B timeseries rows); the recurrence composition mirrors
``q_ewma_trailing`` (single smoothing) one order higher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Dyadic smoothing weights: level a = 1/2, trend g = 1/4.
ALPHA = 0.5
GAMMA = 0.25

#: Forecast horizon (days ahead of the last observation).
HORIZON = 7

_QHOLT_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 10000, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY event_type, day
),
series AS (
  SELECT event_type, CAST(v AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
  FROM daily
),
n AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM series
  GROUP BY event_type
),
rec AS (
  SELECT event_type, t, y AS l, CAST(0.0 AS DOUBLE) AS b
  FROM series WHERE t = 1
  UNION ALL
  SELECT s.event_type, s.t,
         {ALPHA} * s.y + {1 - ALPHA} * (r.l + r.b),
         {GAMMA} * (({ALPHA} * s.y + {1 - ALPHA} * (r.l + r.b)) - r.l)
           + {1 - GAMMA} * r.b
  FROM rec r JOIN series s
    ON s.event_type = r.event_type AND s.t = r.t + 1
),
last AS (
  SELECT r.event_type, r.l, r.b
  FROM rec r JOIN n ON n.event_type = r.event_type AND r.t = n.n_days
)
SELECT l.event_type,
       n.n_days,
       FLOOR((l.l / 10000.0) * 1e4 + 0.5) / 1e4 AS level,
       FLOOR((l.b / 10000.0) * 1e4 + 0.5) / 1e4 AS trend,
       FLOOR(((l.l + {HORIZON} * l.b) / 10000.0) * 1e4 + 0.5) / 1e4 AS forecast_{HORIZON}d
FROM last l JOIN n ON n.event_type = l.event_type
ORDER BY l.event_type
"""


@register(
    "q_ts_holt_linear",
    oracle=_QHOLT_ORACLE,
    description=(
        "Holt double exponential smoothing (level+trend, a=1/2 g=1/4) "
        "per event type over the aggregated daily value series, with a "
        f"{HORIZON}-day-ahead forecast; Spark folds with F.aggregate "
        "over the sorted series array, the oracle replays the identical "
        "IEEE op sequence in a recursive CTE"
    ),
    tags=("timeseries", "forecast", "smoothing", "higher-order", "aggregation"),
)
def q_ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 10000, 0).cast("long"))
        .cast("long")
        .alias("v")
    )

    series = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "v"))),
            lambda s: s["v"].cast("double"),
        ).alias("ys")
    )

    init = F.struct(
        F.lit(0).alias("i"),
        F.lit(0.0).alias("l"),
        F.lit(0.0).alias("b"),
    )

    def _step(acc, y):
        # l_new is spelled twice (for l and inside b) so both the level
        # and the trend see the exact same double — same as the oracle,
        # which also inlines the expression in the recursive select.
        l_new = ALPHA * y + (1 - ALPHA) * (acc["l"] + acc["b"])
        return F.struct(
            (acc["i"] + 1).alias("i"),
            F.when(acc["i"] == 0, y).otherwise(l_new).alias("l"),
            F.when(acc["i"] == 0, F.lit(0.0))
            .otherwise(
                GAMMA * (l_new - acc["l"]) + (1 - GAMMA) * acc["b"]
            )
            .alias("b"),
        )

    fitted = series.select(
        "event_type",
        F.size("ys").cast("long").alias("n_days"),
        F.aggregate(F.col("ys"), init, _step).alias("fit"),
    )
    return (
        fitted.select(
            "event_type",
            "n_days",
            (F.floor((F.col("fit.l") / 10000.0) * 1e4 + 0.5) / 1e4).alias("level"),
            (F.floor((F.col("fit.b") / 10000.0) * 1e4 + 0.5) / 1e4).alias("trend"),
            (F.floor(((F.col("fit.l") + HORIZON * F.col("fit.b")) / 10000.0) * 1e4 + 0.5) / 1e4).alias(f"forecast_{HORIZON}d"),
        )
        .orderBy("event_type")
    )
