"""Hurst exponent via rescaled-range (R/S) analysis (round 10).

Long-range dependence diagnostic for the event stream: chop the hourly
count series into blocks of w in {8,16,32,64} hours, compute each
block's rescaled range R/S, average per block size, and fit the
log-log slope — the Hurst exponent (0.5 = memoryless, >0.5 =
persistent). Joins the periodogram/Haar family as the third spectral
lens on the same hourly series.

Exactness: with integer hourly counts x and block sum s, the SCALED
deviations D_t = w*x_t - s are exact integers, their cumulative sums
and range R' = w*R are exact, and ΣD² = w³S² is exact — so
R/S = R'·sqrt(w)/sqrt(ΣD²) is a fixed-order double expression over
exact integers on both engines (sqrt is IEEE-correctly-rounded).
Zero-variance blocks (ΣD² = 0) are dropped, the standard practice.
Everything is hour-span-sized, never event-sized, like the
periodogram: the only event-sized stage is the first groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_SIZES = (8, 16, 32, 64)

_QHURST_ORACLE = f"""
WITH hours AS (
  SELECT epoch_us(ts) // 3600000000 AS hb, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY hb
),
idx AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY hb) AS rn FROM hours
),
sized AS (
  SELECT s.w, ((i.rn - 1) // s.w) AS blk, i.rn, i.x
  FROM idx i CROSS JOIN (SELECT unnest({list(_SIZES)!r}) AS w) s
),
blocks AS (
  SELECT w, blk, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
  FROM sized GROUP BY w, blk
  HAVING COUNT(*) = w
),
dev AS (
  SELECT sd.w, sd.blk, sd.rn,
         sd.w * sd.x - b.s AS d
  FROM sized sd JOIN blocks b ON b.w = sd.w AND b.blk = sd.blk
),
cum AS (
  SELECT w, blk, d,
         SUM(d) OVER (PARTITION BY w, blk ORDER BY rn
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS z
  FROM dev
),
per_block AS (
  SELECT w, blk,
         CAST(MAX(z) - MIN(z) AS BIGINT) AS rprime,
         CAST(SUM(d * d) AS BIGINT)      AS sumd2
  FROM cum GROUP BY w, blk
  HAVING SUM(d * d) > 0
),
rs AS (
  SELECT w,
         CAST(FLOOR((rprime * SQRT(CAST(w AS DOUBLE))
                    / SQRT(CAST(sumd2 AS DOUBLE))) * 1e10 + 0.5) / 1e10
              AS DECIMAL(24,10)) AS rs_q
  FROM per_block
),
per_size AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(rs_q) AS DOUBLE) / COUNT(*) AS avg_rs
  FROM rs GROUP BY w
),
pts AS (
  SELECT w, n_blocks, avg_rs,
         LN(CAST(w AS DOUBLE)) AS lx, LN(avg_rs) AS ly
  FROM per_size
),
fit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(FLOOR((lx) * 1e12 + 0.5) / 1e12 AS DECIMAL(24,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(FLOOR((ly) * 1e12 + 0.5) / 1e12 AS DECIMAL(24,12))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(FLOOR((lx * lx) * 1e12 + 0.5) / 1e12 AS DECIMAL(24,12))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(FLOOR((lx * ly) * 1e12 + 0.5) / 1e12 AS DECIMAL(24,12))) AS DOUBLE) AS sxy
  FROM pts
)
SELECT p.w, p.n_blocks,
       FLOOR((p.avg_rs) * 1e6 + 0.5) / 1e6 AS avg_rs,
       FLOOR(((f.k * f.sxy - f.sx * f.sy)
             / (f.k * f.sxx - f.sx * f.sx)) * 1e6 + 0.5) / 1e6 AS hurst_exponent
FROM pts p CROSS JOIN fit f
"""


@register(
    "q_ts_hurst_rs",
    oracle=_QHURST_ORACLE,
    description=(
        "Hurst exponent via rescaled-range analysis of hourly event "
        "counts: per block size w in (8,16,32,64) the mean R/S over "
        "complete blocks (integer-scaled deviations keep R and S exact) "
        "and the log-log OLS slope — the long-range-dependence "
        "diagnostic; hour-span-sized beyond the first groupBy"
    ),
    tags=("timeseries", "spectral", "hurst", "statistics", "aggregate"),
)
def q_ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hours = e.groupBy(
        F.expr("unix_micros(ts) DIV 3600000000").alias("hb")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    idx = hours.select(
        "x", F.row_number().over(Window.orderBy("hb")).alias("rn")
    )
    sizes = spark.createDataFrame([(w,) for w in _SIZES], "w long")
    sized = idx.crossJoin(F.broadcast(sizes)).select(
        "w", ((F.col("rn") - 1) / F.col("w")).cast("long").alias("blk"),
        "rn", "x",
    )
    blocks = (
        sized.groupBy("w", "blk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("s"),
        )
        .filter(F.col("n") == F.col("w"))
    )
    dev = sized.join(blocks, ["w", "blk"]).select(
        "w", "blk", "rn", (F.col("w") * F.col("x") - F.col("s")).alias("d")
    )
    wcum = (
        Window.partitionBy("w", "blk")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dev.select("w", "blk", "d", F.sum("d").over(wcum).alias("z"))
    per_block = (
        cum.groupBy("w", "blk")
        .agg(
            (F.max("z") - F.min("z")).cast("long").alias("rprime"),
            F.sum(F.col("d") * F.col("d")).cast("long").alias("sumd2"),
        )
        .filter(F.col("sumd2") > 0)
    )
    rs = per_block.select(
        "w",
        (F.floor((F.col("rprime")
            * F.sqrt(F.col("w").cast("double"))
            / F.sqrt(F.col("sumd2").cast("double"))) * 1e10 + 0.5) / 1e10)
        .cast("decimal(24,10)")
        .alias("rs_q"),
    )
    per_size = rs.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        (F.sum("rs_q").cast("double") / F.count(F.lit(1))).alias("avg_rs"),
    )
    pts = per_size.select(
        "w",
        "n_blocks",
        "avg_rs",
        F.log(F.col("w").cast("double")).alias("lx"),
        F.log("avg_rs").alias("ly"),
    )
    dq = lambda c: F.sum((F.floor((c) * 1e12 + 0.5) / 1e12).cast("decimal(24,12)")).cast(  # noqa: E731
        "double"
    )
    fit = pts.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        dq(F.col("lx")).alias("sx"),
        dq(F.col("ly")).alias("sy"),
        dq(F.col("lx") * F.col("lx")).alias("sxx"),
        dq(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return pts.crossJoin(F.broadcast(fit)).select(
        "w",
        "n_blocks",
        (F.floor((F.col("avg_rs")) * 1e6 + 0.5) / 1e6).alias("avg_rs"),
        (F.floor((slope) * 1e6 + 0.5) / 1e6).alias("hurst_exponent"),
    )
