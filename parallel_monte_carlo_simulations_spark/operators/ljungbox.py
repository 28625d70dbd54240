"""Ljung-Box autocorrelation test on hourly event volume (round 10).

The portmanteau whiteness test: autocorrelations r_1..r_L of the
hourly count series (ZERO-FILLED over the full hour grid — a missing
hour is a real zero observation, unlike the periodogram where zero
terms vanish) and the cumulative Ljung-Box Q statistic per lag.

Exactness: with S = Σx and n hours, the scaled deviations
D_t = n·x_t − S are exact integers, so every lag's autocovariance
numerator Σ D_t·D_{t+k} and the denominator Σ D_t² are exact — r_k is
one double division. The per-lag Q contributions quantize to DECIMAL
before the cumulative window sum. Everything after the first groupBy
is hour-span-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_LAGS = 10

_QLB_ORACLE = f"""
WITH counts AS (
  SELECT epoch_us(ts) // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
bounds AS (
  SELECT MIN(h) AS h0, MAX(h) AS h1,
         MAX(h) - MIN(h) + 1 AS n, CAST(SUM(x) AS BIGINT) AS s
  FROM counts
),
hours AS (
  SELECT g.rn, b.h0, b.n, b.s
  FROM bounds b, LATERAL (SELECT unnest(range(0, b.n)) AS rn) g
),
grid AS (
  SELECT hr.rn, COALESCE(c.x, 0) AS x, hr.n, hr.s
  FROM hours hr LEFT JOIN counts c ON c.h = hr.rn + hr.h0
),
dev AS (SELECT rn, n, n * x - s AS d FROM grid),
den AS (SELECT CAST(SUM(d * d) AS DOUBLE) AS d2, ANY_VALUE(n) AS n FROM dev),
lags AS (SELECT unnest(range(1, {_LAGS} + 1)) AS k),
num AS (
  SELECT l.k, CAST(SUM(a.d * b.d) AS DOUBLE) AS nk
  FROM lags l
  JOIN dev a ON TRUE
  JOIN dev b ON b.rn = a.rn + l.k
  GROUP BY l.k
),
acf AS (
  SELECT n2.k, d.n,
         n2.nk / d.d2 AS r,
         CAST(FLOOR(((n2.nk / d.d2) * (n2.nk / d.d2)
                    / (d.n - n2.k)) * 1e12 + 0.5) / 1e12 AS DECIMAL(24,12)) AS term_q
  FROM num n2 CROSS JOIN den d
)
SELECT k,
       FLOOR((r) * 1e6 + 0.5) / 1e6 AS acf,
       FLOOR((CAST(n AS DOUBLE) * (n + 2)
             * CAST(SUM(term_q) OVER (ORDER BY k
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS ljung_box_q
FROM acf
ORDER BY k
"""


@register(
    "q_ts_ljung_box",
    oracle=_QLB_ORACLE,
    description=(
        f"Ljung-Box portmanteau test on zero-filled hourly event counts: "
        f"autocorrelations r_1..r_{_LAGS} from exact integer-scaled "
        "deviations and the cumulative Q statistic per lag — the "
        "whiteness test companion to the periodogram/Hurst family"
    ),
    tags=("timeseries", "autocorrelation", "hypothesis-test", "aggregate"),
)
def q_ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    counts = e.groupBy(
        F.expr("unix_micros(ts) DIV 3600000000").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    bounds = counts.agg(
        F.min("h").alias("h0"),
        (F.max("h") - F.min("h") + 1).alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    # Zero-fill: explode the full hour grid from the 1-row bounds frame
    # (span-sized), left join the observed counts back.
    grid = (
        bounds.select(
            "h0",
            "n",
            "s",
            F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("rn"),
        )
        .join(
            counts.select((F.col("h")).alias("hh"), "x").hint("merge"),
            F.col("hh") == F.col("rn") + F.col("h0"),
            "left",
        )
        .select(
            "rn", "n", "s", F.coalesce(F.col("x"), F.lit(0)).alias("x")
        )
    )
    dev = grid.select(
        "rn", "n", (F.col("n") * F.col("x") - F.col("s")).alias("d")
    )
    den = dev.agg(
        F.sum(F.col("d") * F.col("d")).cast("double").alias("d2"),
        F.any_value("n").alias("n"),
    )
    lags = spark.range(1, _LAGS + 1).select(F.col("id").alias("k"))
    a = dev.select(F.col("rn").alias("ra"), F.col("d").alias("da"))
    b = dev.select(F.col("rn").alias("rb"), F.col("d").alias("db"))
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(b.hint("merge"), F.col("rb") == F.col("ra") + F.col("k"))
        .groupBy("k")
        .agg(F.sum(F.col("da") * F.col("db")).cast("double").alias("nk"))
    )
    r = F.col("nk") / F.col("d2")
    acf = num.crossJoin(F.broadcast(den)).select(
        "k",
        "n",
        r.alias("r"),
        (F.floor((r * r / (F.col("n") - F.col("k"))) * 1e12 + 0.5) / 1e12)
        .cast("decimal(24,12)")
        .alias("term_q"),
    )
    wcum = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return acf.select(
        "k",
        (F.floor((F.col("r")) * 1e6 + 0.5) / 1e6).alias("acf"),
        (F.floor((F.col("n").cast("double")
            * (F.col("n") + 2)
            * F.sum("term_q").over(wcum).cast("double")) * 1e4 + 0.5) / 1e4).alias("ljung_box_q"),
    )
