"""Lagged cross-correlation between two event streams (round 10).

The lead-lag detector: for daily volumes of two event types x and y,
the normalized cross-correlation at lag k,

    r_xy(k) = sum_t dx_t * dy_{t+k} / sqrt(sum dx^2 * sum dy^2),

answers "does x move BEFORE y?" (peak at k > 0 means x leads y by k
days) — the companion to q_stat_autocorrelation / q_ts_ljung_box, which
only see one series. Marketing-funnel use: clicks should lead purchases.

Exactness (the ljungbox.py discipline): both series are ZERO-FILLED
over the shared day grid (a missing day is a real zero), and with
S = sum(x) over n days the scaled deviations dx_t = n*x_t - Sx are
exact BIGINTs, so every lag's numerator and both denominators are exact
integer sums; r is one mirrored double expression (sqrt of a product of
exact integers), rounded once.

Scale: everything after the first groupBy is day-span-sized. The lag
join is a 15-row lag dim broadcast against the span frame, then a
merge join on the shifted day index — no data-sized shuffle beyond the
initial daily rollup, which combines map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: The two series: does TYPE_X lead TYPE_Y?
TYPE_X = "click"
TYPE_Y = "purchase"
#: Max lag (days) in each direction.
MAX_LAG = 7

_QXCORR_ORACLE = f"""
WITH counts AS (
  SELECT epoch_us(ts) // 86400000000 AS d,
         CAST(COUNT(*) FILTER (WHERE event_type = '{TYPE_X}') AS BIGINT) AS x,
         CAST(COUNT(*) FILTER (WHERE event_type = '{TYPE_Y}') AS BIGINT) AS y
  FROM events
  WHERE event_type IN ('{TYPE_X}', '{TYPE_Y}')
  GROUP BY 1
),
bounds AS (
  SELECT MIN(d) AS d0, MAX(d) - MIN(d) + 1 AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy
  FROM counts
),
days AS (
  SELECT g.rn, b.d0, b.n, b.sx, b.sy
  FROM bounds b, LATERAL (SELECT unnest(range(0, b.n)) AS rn) g
),
grid AS (
  SELECT dy.rn, dy.n,
         dy.n * COALESCE(c.x, 0) - dy.sx AS dx,
         dy.n * COALESCE(c.y, 0) - dy.sy AS dy
  FROM days dy LEFT JOIN counts c ON c.d = dy.rn + dy.d0
),
den AS (
  SELECT CAST(SUM(dx * dx) AS DOUBLE) AS dxx,
         CAST(SUM(dy * dy) AS DOUBLE) AS dyy,
         ANY_VALUE(n) AS n
  FROM grid
),
lags AS (SELECT unnest(range(-{MAX_LAG}, {MAX_LAG} + 1)) AS k),
num AS (
  SELECT l.k, CAST(SUM(a.dx * b.dy) AS BIGINT) AS nk
  FROM lags l
  JOIN grid a ON TRUE
  JOIN grid b ON b.rn = a.rn + l.k
  GROUP BY l.k
)
SELECT CAST(num.k AS BIGINT) AS lag_days,
       CAST(den.n - ABS(num.k) AS BIGINT) AS n_overlap,
       FLOOR((CAST(nk AS DOUBLE) / SQRT(den.dxx * den.dyy)) * 1e6 + 0.5) / 1e6 AS xcorr
FROM num CROSS JOIN den
ORDER BY lag_days
"""


@register(
    "q_ts_cross_correlation",
    oracle=_QXCORR_ORACLE,
    description=(
        f"lagged cross-correlation of daily {TYPE_X!r} vs {TYPE_Y!r} "
        f"volumes (lags -{MAX_LAG}..{MAX_LAG}): zero-filled day grid, "
        "exact integer-scaled deviations, one mirrored sqrt expression "
        "— the lead-lag detector completing the autocorrelation family"
    ),
    tags=("timeseries", "cross-correlation", "lead-lag", "aggregate"),
)
def q_ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    counts = (
        e.filter(F.col("event_type").isin(TYPE_X, TYPE_Y))
        .groupBy(F.expr("unix_micros(ts) DIV 86400000000").alias("d"))
        .agg(
            F.count(F.when(F.col("event_type") == TYPE_X, 1))
            .cast("long")
            .alias("x"),
            F.count(F.when(F.col("event_type") == TYPE_Y, 1))
            .cast("long")
            .alias("y"),
        )
    )
    bounds = counts.agg(
        F.min("d").alias("d0"),
        (F.max("d") - F.min("d") + 1).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
    )
    # Zero-fill the day grid from the 1-row bounds frame (span-sized).
    grid = (
        bounds.select(
            "d0",
            "n",
            "sx",
            "sy",
            F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("rn"),
        )
        .join(
            counts.select(F.col("d").alias("dd"), "x", "y").hint("merge"),
            F.col("dd") == F.col("rn") + F.col("d0"),
            "left",
        )
        .select(
            "rn",
            "n",
            (F.col("n") * F.coalesce(F.col("x"), F.lit(0)) - F.col("sx")).alias("dx"),
            (F.col("n") * F.coalesce(F.col("y"), F.lit(0)) - F.col("sy")).alias("dy"),
        )
    )
    den = grid.agg(
        F.sum(F.col("dx") * F.col("dx")).cast("double").alias("dxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("double").alias("dyy"),
        F.any_value("n").alias("n"),
    )
    lags = spark.range(-MAX_LAG, MAX_LAG + 1).select(F.col("id").alias("k"))
    a = grid.select(F.col("rn").alias("ra"), F.col("dx").alias("dxa"))
    b = grid.select(F.col("rn").alias("rb"), F.col("dy").alias("dyb"))
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(b.hint("merge"), F.col("rb") == F.col("ra") + F.col("k"))
        .groupBy("k")
        .agg(F.sum(F.col("dxa") * F.col("dyb")).cast("long").alias("nk"))
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            F.col("k").cast("long").alias("lag_days"),
            (F.col("n") - F.abs(F.col("k"))).cast("long").alias("n_overlap"),
            (F.floor((F.col("nk").cast("double")
                / F.sqrt(F.col("dxx") * F.col("dyy"))) * 1e6 + 0.5) / 1e6).alias("xcorr"),
        )
        .orderBy("lag_days")
    )
