"""Series diagnostics: autocorrelation and CUSUM changepoint detection.

Classical time-series screens over warehouse aggregates: the sample
autocorrelation function says whether a daily series is momentum- or
mean-reversion-shaped (and whether forecast features should include
lags); the CUSUM statistic locates the most likely level-shift point.

Both run on the *aggregated* daily series — the fact scan collapses to
|days| (or |type| x |days|) rows before any window touches it, so the
window state is thousands of rows regardless of fact-table scale.

Exactness discipline: with ``n`` days, total ``S`` and daily value
``v_t`` (integer cents), the centered series scaled by ``n`` is
``c_t = n·v_t - S`` — exact integers. ACF and CUSUM are ratios of sums
of products of ``c_t``, so numerator and denominator are exact
DECIMAL/HUGEINT sums and the single double division is mirrored-
association identical across engines (the ``n`` scaling cancels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QACF_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY day
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s
  FROM daily
),
centered AS (
  SELECT d.day,
         CAST((t.n * d.v) - t.s AS HUGEINT) AS c,
         t.n
  FROM daily d CROSS JOIN tot t
),
lagged AS (
  SELECT c, n,
         LEAD(c, 1) OVER (ORDER BY day) AS c1,
         LEAD(c, 2) OVER (ORDER BY day) AS c2,
         LEAD(c, 3) OVER (ORDER BY day) AS c3
  FROM centered
),
sums AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n_days,
         CAST(SUM(c * c) AS HUGEINT) AS den,
         CAST(SUM(CASE WHEN c1 IS NULL THEN 0 ELSE c * c1 END) AS HUGEINT)
           AS num1,
         CAST(SUM(CASE WHEN c2 IS NULL THEN 0 ELSE c * c2 END) AS HUGEINT)
           AS num2,
         CAST(SUM(CASE WHEN c3 IS NULL THEN 0 ELSE c * c3 END) AS HUGEINT)
           AS num3
  FROM lagged
)
SELECT lag, n_days,
       FLOOR((CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS acf
FROM (
  SELECT 1 AS lag, n_days, num1 AS num, den FROM sums
  UNION ALL
  SELECT 2 AS lag, n_days, num2 AS num, den FROM sums
  UNION ALL
  SELECT 3 AS lag, n_days, num3 AS num, den FROM sums
)
ORDER BY lag
"""


@register(
    "q_stat_autocorrelation",
    oracle=_QACF_ORACLE,
    description=(
        "sample autocorrelation (lags 1-3) of the daily order-revenue "
        "series via exact n-scaled centered integers: one daily "
        "aggregation, one lead window over |days| rows"
    ),
    tags=("timeseries", "statistics", "autocorrelation", "window"),
)
def q_stat_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF_k = sum(c_t c_{t+k}) / sum(c_t^2) over the n-scaled centered
    series c_t = n v_t - S (the n^2 factor cancels in the ratio, so
    no float mean ever enters). Products reach ~1e25 at sf0.1, so they
    multiply and sum in DECIMAL(38,0) (oracle: HUGEINT) — exact —
    before one mirrored double division per lag.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("v")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
    )
    centered = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        ((F.col("n") * F.col("v")) - F.col("s"))
        .cast("decimal(25,0)")
        .alias("c"),
        "n",
    )
    w = Window.orderBy("day")
    lagged = centered.select(
        "c",
        "n",
        F.lead("c", 1).over(w).alias("c1"),
        F.lead("c", 2).over(w).alias("c2"),
        F.lead("c", 3).over(w).alias("c3"),
    )

    def _num(ck: str):
        return F.sum(
            F.when(F.col(ck).isNull(), F.lit(0).cast("decimal(25,0)"))
            .otherwise(F.col("c") * F.col(ck))
        ).alias(f"num{ck[-1]}")

    sums = lagged.agg(
        F.max("n").cast("long").alias("n_days"),
        F.sum(F.col("c") * F.col("c")).alias("den"),
        _num("c1"),
        _num("c2"),
        _num("c3"),
    )
    out = sums.selectExpr(
        "stack(3, 1, num1, 2, num2, 3, num3) AS (lag, num)",
        "n_days",
        "den",
    )
    return out.select(
        "lag",
        "n_days",
        (F.floor((F.col("num").cast("double") / F.col("den").cast("double")) * 1e6 + 0.5) / 1e6).alias("acf"),
    ).orderBy("lag")


_QCUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 10000, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY event_type, day
),
tot AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s
  FROM daily GROUP BY event_type
),
cusum AS (
  SELECT d.event_type, d.day, t.n,
         CAST(SUM((t.n * d.v) - t.s) OVER (
           PARTITION BY d.event_type ORDER BY d.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS HUGEINT) AS s_t
  FROM daily d JOIN tot t ON t.event_type = d.event_type
),
ranked AS (
  SELECT event_type, day, n, abs(s_t) AS abs_s,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY abs(s_t) DESC, day
         ) AS rn
  FROM cusum
)
SELECT event_type,
       strftime(day, '%Y-%m-%d') AS change_day,
       n AS n_days,
       FLOOR((CAST(abs_s AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0e0)) * 1e4 + 0.5) / 1e4
         AS max_dev_value
FROM ranked WHERE rn = 1
ORDER BY event_type
"""


@register(
    "q_cusum_changepoint",
    oracle=_QCUSUM_ORACLE,
    description=(
        "CUSUM level-shift detection per event type: argmax |running sum "
        "of n-scaled centered daily values|, exact integers, earliest-day "
        "tiebreak"
    ),
    tags=("timeseries", "statistics", "changepoint", "cusum", "window"),
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM: S_t = sum_{i<=t} (v_i - mean); the most likely single
    changepoint is argmax |S_t|. Scaling by n (c_i = n v_i - s) keeps
    every partial sum an exact integer; |S_t| in original units is
    recovered as abs_s / (n * 10000) in one mirrored double step. The
    argmax row is picked by (|S_t| DESC, day ASC) row_number — exact
    integer ordering, deterministic across engines.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 10000, 0).cast("long"))
        .cast("long")
        .alias("v")
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = (
        daily.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "day",
            "n",
            ((F.col("n") * F.col("v")) - F.col("s"))
            .cast("decimal(25,0)")
            .alias("c"),
        )
        .select(
            "event_type",
            "day",
            "n",
            F.sum("c").over(w_cum).alias("s_t"),
        )
    )
    ranked = cusum.select(
        "event_type",
        "day",
        "n",
        F.abs(F.col("s_t")).alias("abs_s"),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.col("abs_s").desc(), F.col("day")
            )
        ),
    )
    return (
        ranked.where(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("change_day"),
            F.col("n").alias("n_days"),
            (F.floor((F.col("abs_s").cast("double")
                / (F.col("n").cast("double") * 10000.0)) * 1e4 + 0.5) / 1e4).alias("max_dev_value"),
        )
        .orderBy("event_type")
    )
