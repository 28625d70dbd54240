"""Classical seasonal decomposition (trend / seasonal / residual) as
windowed aggregation — the moving-average method of STL's ancestor
(Macaulay 1931; the "classical decomposition" of every forecasting
text).

Daily revenue y_d splits into:

- **trend**: centered 7-day moving average, emitted only where the
  window is complete (3 days either side) — exact cent-integer sum
  divided once, rounded once.
- **seasonal**: per-weekday mean of the detrended series. Weekday is
  ``datediff(anchor, day) % 7`` — pure integer arithmetic (engine
  dayofweek() conventions differ: Spark is 1=Sunday, DuckDB 0=Sunday,
  so neither is used). Detrended terms are quantized to DECIMAL before
  the cross-week mean so summation order cannot matter.
- **residual check**: the decomposition's self-consistency — the mean
  seasonal component across the 7 weekdays, which classical
  decomposition forces toward 0 (reported, not assumed).

Scale: the daily series is an exact groupBy reduction of the fact
table (100 TB -> ~thousands of rows); the moving average is a range
window over that bounded series. Nothing downstream touches raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Anchor for weekday arithmetic: 1995-01-01 (a Sunday).
ANCHOR = "1995-01-01"

_QSEAS_ORACLE = f"""
WITH daily AS (
  SELECT datediff('day', TIMESTAMP '{ANCHOR}', o_orderdate) AS day_no,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  GROUP BY day_no
),
trended AS (
  SELECT day_no, cents,
         CAST(COUNT(*) OVER w AS BIGINT) AS win_n,
         CAST(SUM(cents) OVER w AS BIGINT) AS win_cents
  FROM daily
  WINDOW w AS (ORDER BY day_no RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detrended AS (
  SELECT day_no % 7 AS weekday,
         CAST(FLOOR((CAST(cents AS DOUBLE) / 100.0e0
                    - CAST(win_cents AS DOUBLE) / (100.0e0 * win_n)) * 1e4 + 0.5) / 1e4
              AS DECIMAL(18,4)) AS dev
  FROM trended
  WHERE win_n = 7
),
seasonal AS (
  SELECT weekday,
         CAST(COUNT(*) AS BIGINT) AS n_weeks,
         FLOOR((CAST(SUM(dev) AS DOUBLE) / COUNT(*)) * 1e4 + 0.5) / 1e4 AS seasonal_dev
  FROM detrended
  GROUP BY weekday
),
balance AS (
  SELECT FLOOR((CAST(SUM(CAST(FLOOR((seasonal_dev) * 1e4 + 0.5) / 1e4 AS DECIMAL(18,4)))
                    AS DOUBLE) / 7.0e0) * 1e4 + 0.5) / 1e4 AS mean_seasonal
  FROM seasonal
)
SELECT s.weekday, s.n_weeks, s.seasonal_dev, b.mean_seasonal
FROM seasonal s CROSS JOIN balance b
ORDER BY s.weekday
"""


@register(
    "q_ts_seasonal_decompose",
    oracle=_QSEAS_ORACLE,
    description=(
        "classical seasonal decomposition of daily revenue: centered "
        "7-day moving-average trend, per-weekday seasonal indices from "
        "quantized detrended terms, seasonal-balance check"
    ),
    tags=("timeseries", "seasonal", "decomposition", "window", "forecasting"),
)
def q_ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit(ANCHOR).cast("timestamp")).alias(
            "day_no"
        )
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "cents"
        )
    )
    w = (
        Window.orderBy("day_no").rangeBetween(-3, 3)
    )
    trended = daily.select(
        "day_no",
        "cents",
        F.count("*").over(w).alias("win_n"),
        F.sum("cents").over(w).alias("win_cents"),
    )
    detrended = trended.where(F.col("win_n") == 7).select(
        (F.col("day_no") % 7).alias("weekday"),
        (F.floor((F.col("cents").cast("double") / 100.0
            - F.col("win_cents").cast("double")
            / (F.lit(100.0) * F.col("win_n"))) * 1e4 + 0.5) / 1e4)
        .cast("decimal(18,4)")
        .alias("dev"),
    )
    seasonal = detrended.groupBy("weekday").agg(
        F.count("*").alias("n_weeks"),
        (F.floor((F.sum("dev").cast("double") / F.count("*")) * 1e4 + 0.5) / 1e4).alias(
            "seasonal_dev"
        ),
    )
    balance = seasonal.agg(
        (F.floor((F.sum((F.floor((F.col("seasonal_dev")) * 1e4 + 0.5) / 1e4).cast("decimal(18,4)"))
            .cast("double")
            / F.lit(7.0)) * 1e4 + 0.5) / 1e4).alias("mean_seasonal")
    )
    return (
        seasonal.crossJoin(F.broadcast(balance))
        .select("weekday", "n_weeks", "seasonal_dev", "mean_seasonal")
        .orderBy("weekday")
    )


# --------------------------------------------------------------------------
# Forecast evaluation: seasonal-naive vs naive baselines, exact
# integer error arithmetic (MAE / MASE).
# --------------------------------------------------------------------------

_QFCEVAL_ORACLE = f"""
WITH daily AS (
  SELECT datediff('day', TIMESTAMP '{ANCHOR}', o_orderdate) AS day_no,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  GROUP BY day_no
),
lagged AS (
  SELECT day_no, cents,
         LAG(cents, 1) OVER (ORDER BY day_no) AS naive_prev,
         LAG(cents, 7) OVER (ORDER BY day_no) AS snaive_prev
  FROM daily
),
scored AS (
  SELECT day_no, cents,
         ABS(cents - naive_prev) AS e_naive,
         ABS(cents - snaive_prev) AS e_snaive
  FROM lagged
  WHERE naive_prev IS NOT NULL AND snaive_prev IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       FLOOR((CAST(SUM(e_naive) AS DOUBLE) / (100.0e0 * COUNT(*))) * 1e2 + 0.5) / 1e2
         AS mae_naive,
       FLOOR((CAST(SUM(e_snaive) AS DOUBLE) / (100.0e0 * COUNT(*))) * 1e2 + 0.5) / 1e2
         AS mae_seasonal_naive,
       FLOOR((CAST(SUM(e_snaive) AS DOUBLE) / CAST(SUM(e_naive) AS DOUBLE)) * 1e6 + 0.5) / 1e6
         AS mase
FROM scored
"""


@register(
    "q_ts_forecast_eval",
    oracle=_QFCEVAL_ORACLE,
    description=(
        "forecast-accuracy evaluation: seasonal-naive (t-7) vs naive "
        "(t-1) daily-revenue baselines — exact integer MAE and the MASE "
        "ratio (< 1 means weekly seasonality carries signal)"
    ),
    tags=("timeseries", "forecasting", "evaluation", "window", "mase"),
)
def q_ts_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit(ANCHOR).cast("timestamp")).alias(
            "day_no"
        )
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "cents"
        )
    )
    w = Window.orderBy("day_no")
    lagged = daily.select(
        "day_no",
        "cents",
        F.lag("cents", 1).over(w).alias("naive_prev"),
        F.lag("cents", 7).over(w).alias("snaive_prev"),
    )
    scored = lagged.where(
        F.col("naive_prev").isNotNull() & F.col("snaive_prev").isNotNull()
    ).select(
        F.abs(F.col("cents") - F.col("naive_prev")).alias("e_naive"),
        F.abs(F.col("cents") - F.col("snaive_prev")).alias("e_snaive"),
    )
    return scored.agg(
        F.count("*").alias("n_days"),
        (F.floor((F.sum("e_naive").cast("double") / (F.lit(100.0) * F.count("*"))) * 1e2 + 0.5) / 1e2).alias("mae_naive"),
        (F.floor((F.sum("e_snaive").cast("double") / (F.lit(100.0) * F.count("*"))) * 1e2 + 0.5) / 1e2).alias("mae_seasonal_naive"),
        (F.floor((F.sum("e_snaive").cast("double") / F.sum("e_naive").cast("double")) * 1e6 + 0.5) / 1e6).alias("mase"),
    )
