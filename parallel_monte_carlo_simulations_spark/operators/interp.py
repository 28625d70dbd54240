"""Time-series regularization: spine densification + linear interpolation.

Sensor/metric pipelines need gap-free regular series before windowed
models run. This operator builds the dense (series x hour) spine with
``sequence``+``explode`` (no driver loop, no collect), left-joins the
observed hourly aggregates, and fills gaps by LINEAR interpolation
between the nearest observed neighbors (edge gaps take the nearest
single neighbor) using ignore-nulls window frames — one window pass per
direction, a single shuffle on the series key at any scale.

Parity discipline: observed hourly means are quantized to 6 decimals
BEFORE interpolation in both engines (aggregate summation order is not
bit-stable across engines) and the output to 4. Quantization is the
explicit ``floor(x*10^n + 0.5)/10^n`` in BOTH engines, not ROUND():
interpolation fractions are exact small rationals over 6-decimal
inputs, so results land exactly on 4th-decimal .5 ties where Spark's
BigDecimal HALF_UP and DuckDB's multiply-based ROUND disagree; the
floor form is a single IEEE op chain that both engines evaluate
bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

N_SERIES = 32

_QINTERP_ORACLE = f"""
WITH base AS (
  SELECT user_id % {N_SERIES} AS series,
         date_trunc('hour', ts) AS hour,
         floor(AVG(value) * 1000000 + 0.5) / 1000000 AS v
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT min(date_trunc('hour', ts)) AS h0,
         max(date_trunc('hour', ts)) AS h1
  FROM events
),
spine AS (
  SELECT s.series, g.hour
  FROM (SELECT DISTINCT series FROM base) s,
       bounds,
       LATERAL (
         SELECT unnest(generate_series(bounds.h0, bounds.h1,
                                       INTERVAL 1 HOUR)) AS hour
       ) g
),
j AS (
  SELECT sp.series, sp.hour, b.v
  FROM spine sp LEFT JOIN base b USING (series, hour)
),
w AS (
  SELECT series, hour, v,
    last_value(v IGNORE NULLS) OVER (
      PARTITION BY series ORDER BY hour
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS) OVER (
      PARTITION BY series ORDER BY hour
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
    first_value(v IGNORE NULLS) OVER (
      PARTITION BY series ORDER BY hour
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS) OVER (
      PARTITION BY series ORDER BY hour
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM j
)
SELECT CAST(series AS INTEGER) AS series,
       hour,
       floor((CASE
         WHEN v IS NOT NULL THEN v
         WHEN pv IS NULL THEN nv
         WHEN nv IS NULL THEN pv
         -- parenthesized ratio: must associate as mul(sub, div) exactly
         -- like the Spark expression — a*b/c groups (a*b)/c and lands on
         -- the other side of the .5 quantization boundary
         ELSE pv + (nv - pv) * ((epoch(hour) - epoch(ph))
                                / (epoch(nh) - epoch(ph)))
       END) * 10000 + 0.5) / 10000 AS value_filled,
       v IS NOT NULL AS is_observed
FROM w
"""


@register(
    "q_timeseries_interpolate",
    oracle=_QINTERP_ORACLE,
    description=(
        "dense hourly spine + linear interpolation of missing per-series "
        "values between nearest observed neighbors (ignore-nulls windows)"
    ),
    tags=("timeseries", "window", "interpolation", "gapfill"),
)
def q_timeseries_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    base = (
        e.groupBy(
            (F.col("user_id") % N_SERIES).alias("series"),
            F.date_trunc("hour", "ts").alias("hour"),
        )
        .agg((F.floor(F.avg("value") * 1000000 + 0.5) / 1000000).alias("v"))
    )
    bounds = e.agg(
        F.min(F.date_trunc("hour", "ts")).alias("h0"),
        F.max(F.date_trunc("hour", "ts")).alias("h1"),
    )
    spine = (
        base.select("series")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "series",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    j = spine.join(base, ["series", "hour"], "left")
    back = Window.partitionBy("series").orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fwd = Window.partitionBy("series").orderBy("hour").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    known_h = F.when(F.col("v").isNotNull(), F.col("hour"))
    w = j.select(
        "series",
        "hour",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(known_h, ignorenulls=True).over(back).alias("ph"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(known_h, ignorenulls=True).over(fwd).alias("nh"),
    )
    frac = (
        (F.unix_timestamp("hour") - F.unix_timestamp("ph"))
        / (F.unix_timestamp("nh") - F.unix_timestamp("ph"))
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return w.select(
        F.col("series").cast("int").alias("series"),
        "hour",
        (F.floor(filled * 10000 + 0.5) / 10000).alias("value_filled"),
        F.col("v").isNotNull().alias("is_observed"),
    )
