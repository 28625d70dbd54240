"""Haar wavelet decomposition of event series — multi-resolution change
detection.

The periodogram (``spectral.py``) answers "what repeats globally"; the
Haar transform answers "where does the level change, and at what time
scale" — the unnormalized Haar detail coefficient for level ``l``,
block ``j`` over an hourly count series is

    d(l, j) = sum(x_t, t in left half of block j) -
              sum(x_t, t in right half of block j),      block size 2^l

a pure integer over event counts, so the whole transform oracles
EXACTLY with zero float discipline needed (the usual 2^(l/2)
normalization is irrational for odd l and adds nothing to ranking).
Large |d| at small l = sharp spikes; at large l = sustained level
shifts — the triage view for incident windows and regime changes.

Spark-first shape: one hourly rollup (the only data-sized shuffle),
then a broadcast 9-row level dimension and ONE grouped aggregate keyed
(level, block) — each hour contributes to 9 (level, block) cells with a
+-1 sign computed arithmetically from its offset. Top-k by |d| with
deterministic tie-breaks via distributed TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_LEVELS = 9          #: block sizes 2 .. 512 hours
_N = 1 << _LEVELS    #: series length: first 512 hours of the corpus
_TOP_K = 15

_QHAAR_ORACLE = f"""
WITH counts AS (
  SELECT (epoch_us(ts) // 3600000000) AS h, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
lo AS (SELECT MIN(h) AS h0 FROM counts),
series AS (
  SELECT c.h - l.h0 AS t, c.x
  FROM counts c CROSS JOIN lo l
  WHERE c.h - l.h0 < {_N}
),
lv AS (SELECT UNNEST(generate_series(1, {_LEVELS})) AS level),
cells AS (
  SELECT lv.level,
         CAST(s.t // (1 << lv.level) AS BIGINT) AS block,
         SUM(CASE WHEN (s.t % (1 << lv.level)) < (1 << (lv.level - 1))
                  THEN s.x ELSE -s.x END) AS d
  FROM series s CROSS JOIN lv
  GROUP BY lv.level, CAST(s.t // (1 << lv.level) AS BIGINT)
)
SELECT CAST(level AS INTEGER) AS level,
       CAST((1 << level) AS BIGINT) AS scale_hours,
       block,
       CAST(block * (1 << level) AS BIGINT) AS start_hour,
       CAST(d AS BIGINT) AS detail
FROM cells
ORDER BY ABS(d) DESC, level, block
LIMIT {_TOP_K}
"""


@register(
    "q_ts_haar_transform",
    oracle=_QHAAR_ORACLE,
    description=(
        f"Haar wavelet detail coefficients over hourly event volume "
        f"(levels 1..{_LEVELS}, first {_N} hours): top-{_TOP_K} "
        f"unnormalized |left-half sum - right-half sum| with level, "
        f"scale and start hour — time-LOCALIZED change detection at "
        f"every dyadic scale, the complement of the global periodogram"
    ),
    tags=("timeseries", "wavelet", "spectral", "anomaly", "aggregate"),
)
def q_ts_haar_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup -> broadcast level dim -> one (level, block)
    aggregate. Every coefficient is an exact BIGINT over counts; the
    expansion is (hours x levels), bounded by the series span, never by
    the event count — at 100 TB the rollup output is the small side."""
    e = table(spark, sf_dir, "events")
    counts = (
        e.select(F.expr("unix_micros(ts) DIV 3600000000").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    lo = counts.agg(F.min("h").alias("h0"))
    series = (
        counts.crossJoin(F.broadcast(lo))
        .select((F.col("h") - F.col("h0")).alias("t"), "x")
        .where(F.col("t") < _N)
    )
    lv = spark.range(1, _LEVELS + 1).select(F.col("id").cast("int").alias("level"))
    blk = F.expr("cast(shiftleft(1, level) as bigint)")
    half = F.expr("cast(shiftleft(1, level - 1) as bigint)")
    cells = (
        series.crossJoin(F.broadcast(lv))
        .groupBy(
            "level",
            F.expr("t div cast(shiftleft(1, level) as bigint)").alias("block"),
        )
        .agg(
            F.sum(
                F.when((F.col("t") % blk) < half, F.col("x")).otherwise(
                    -F.col("x")
                )
            )
            .cast("long")
            .alias("d")
        )
    )
    return (
        cells.select(
            "level",
            blk.cast("long").alias("scale_hours"),
            "block",
            (F.col("block") * blk).cast("long").alias("start_hour"),
            F.col("d").alias("detail"),
        )
        .orderBy(F.abs(F.col("detail")).desc(), "level", "block")
        .limit(_TOP_K)
    )
