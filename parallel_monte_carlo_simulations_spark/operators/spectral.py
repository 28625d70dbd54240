"""Spectral analysis: discrete-Fourier periodogram over event series.

Detecting periodicity (daily traffic cycles, batch-job cadences, bot
heartbeats) is the frequency-domain complement of the time-domain
autocorrelation screen (`q_stat_autocorrelation`). The classic tool is
the periodogram: power at frequency k over an n-sample series is

    P(k) = ( sum_t x_t * cos(2*pi*k*t/n) )^2
         + ( sum_t x_t * sin(2*pi*k*t/n) )^2

Spark-first shape: the series is the hourly event-count aggregate (one
shuffle keyed on the hour bucket), and the DFT is a broadcast cross
join of the counts against a tiny frequency dimension (K rows) followed
by one grouped aggregate keyed on k — two narrow passes over n*K rows,
no collect, no UDF. Absent hours contribute x_t = 0 terms, so skipping
them is exact, and at 100 TB the hourly rollup is already tiny relative
to the raw events scan.

Cross-engine float discipline: the angle is computed from exact
integers via (k*t) mod n first, with one literal-pi double expression
mirrored token-for-token in the oracle, so both engines evaluate
cos/sin at bit-identical arguments (libm may still differ by ~1 ulp);
sums stay in doubles (association noise ~1e-8 relative) and the power
is normalized by the exact total count before rounding to 5 dp —
~60x error headroom measured against the worst-case term analysis.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.microunit import rdiv_halfup_duck, rdiv_halfup_expr
from ..registry import register
from ..tables import table

#: Frequencies 1..K over the hourly series; K=24 reaches the daily
#: harmonic family on a multi-week window while keeping the frequency
#: dimension broadcast-trivially bounded.
_K = 24

_TWO_PI = 2.0 * math.pi

_QPERIODOGRAM_ORACLE = f"""
WITH counts AS (
  SELECT epoch_us(ts) // 3600000000 AS h,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
bounds AS (
  SELECT MIN(h) AS h0, MAX(h) - MIN(h) + 1 AS n,
         CAST(SUM(x) AS BIGINT) AS tot
  FROM counts
),
ks AS (SELECT UNNEST(generate_series(1, {_K})) AS k),
terms AS (
  SELECT ks.k, b.n, b.tot,
         CAST(c.x AS DOUBLE)
           * COS(((2 * 3.141592653589793)
                  * CAST((ks.k * (c.h - b.h0)) % b.n AS DOUBLE))
                 / CAST(b.n AS DOUBLE)) AS tc,
         CAST(c.x AS DOUBLE)
           * SIN(((2 * 3.141592653589793)
                  * CAST((ks.k * (c.h - b.h0)) % b.n AS DOUBLE))
                 / CAST(b.n AS DOUBLE)) AS ts
  FROM counts c CROSS JOIN bounds b CROSS JOIN ks
),
spec AS (
  SELECT k, ANY_VALUE(n) AS n, ANY_VALUE(tot) AS tot,
         SUM(tc) AS sc, SUM(ts) AS ss
  FROM terms GROUP BY k
)
SELECT k,
       CAST(n AS BIGINT) AS n_hours,
       {rdiv_halfup_duck("n", "k", 2)} AS period_hours,
       FLOOR((POW(sc / CAST(tot AS DOUBLE), 2)
             + POW(ss / CAST(tot AS DOUBLE), 2)) * 1e5 + 0.5) / 1e5 AS power_norm
FROM spec
ORDER BY k
"""


@register(
    "q_ts_periodogram",
    oracle=_QPERIODOGRAM_ORACLE,
    description=(
        "discrete-Fourier periodogram of hourly event volume: "
        "normalized spectral power at frequencies 1..24 with implied "
        "period lengths — the frequency-domain periodicity screen "
        "(daily cycles, batch cadences, bot heartbeats) complementing "
        "the autocorrelation query"
    ),
    tags=("timeseries", "spectral", "periodogram", "aggregate", "join"),
)
def q_ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup -> broadcast x K frequency rows -> one grouped
    aggregate per frequency. The n*K expansion is bounded by the hour
    count (n ~ corpus span / 3600 s), never by the raw event count, so
    the DFT stage's input is tiny at any SF; zero-count hours are
    exact zero terms and need no gap fill."""
    e = table(spark, sf_dir, "events")
    counts = (
        e.select(F.expr("unix_micros(ts) DIV 3600000000").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    bounds = counts.agg(
        F.min("h").alias("h0"),
        (F.max("h") - F.min("h") + 1).alias("n"),
        F.sum("x").cast("long").alias("tot"),
    )
    ks = spark.range(1, _K + 1).select(F.col("id").alias("k"))
    angle = (
        (F.lit(_TWO_PI) * ((F.col("k") * (F.col("h") - F.col("h0"))) % F.col("n")).cast("double"))
        / F.col("n").cast("double")
    )
    terms = (
        counts.crossJoin(F.broadcast(bounds))
        .crossJoin(F.broadcast(ks))
        .select(
            "k",
            "n",
            "tot",
            (F.col("x").cast("double") * F.cos(angle)).alias("tc"),
            (F.col("x").cast("double") * F.sin(angle)).alias("ts"),
        )
    )
    spec = terms.groupBy("k").agg(
        F.any_value("n").alias("n"),
        F.any_value("tot").alias("tot"),
        F.sum("tc").alias("sc"),
        F.sum("ts").alias("ss"),
    )
    return spec.select(
        "k",
        F.col("n").cast("long").alias("n_hours"),
        rdiv_halfup_expr("n", "k", 2).alias("period_hours"),
        (F.floor((F.pow(F.col("sc") / F.col("tot").cast("double"), 2)
            + F.pow(F.col("ss") / F.col("tot").cast("double"), 2)) * 1e5 + 0.5) / 1e5).alias("power_norm"),
    ).orderBy("k")


# --------------------------------------------------------------------------
# Spectral entropy: how concentrated is the spectrum? (round 10)
# --------------------------------------------------------------------------

_QSPECENT_ORACLE = f"""
WITH counts AS (
  SELECT epoch_us(ts) // 3600000000 AS h,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
bounds AS (
  SELECT MIN(h) AS h0, MAX(h) - MIN(h) + 1 AS n,
         CAST(SUM(x) AS BIGINT) AS tot
  FROM counts
),
ks AS (SELECT UNNEST(generate_series(1, {_K})) AS k),
terms AS (
  SELECT ks.k,
         CAST(c.x AS DOUBLE)
           * COS(((2 * 3.141592653589793)
                  * CAST((ks.k * (c.h - b.h0)) % b.n AS DOUBLE))
                 / CAST(b.n AS DOUBLE)) AS tc,
         CAST(c.x AS DOUBLE)
           * SIN(((2 * 3.141592653589793)
                  * CAST((ks.k * (c.h - b.h0)) % b.n AS DOUBLE))
                 / CAST(b.n AS DOUBLE)) AS ts,
         b.tot
  FROM counts c CROSS JOIN bounds b CROSS JOIN ks
),
spec AS (
  SELECT k,
         CAST(FLOOR((POW(SUM(tc) / CAST(ANY_VALUE(tot) AS DOUBLE), 2)
                    + POW(SUM(ts) / CAST(ANY_VALUE(tot) AS DOUBLE), 2)) * 1e5 + 0.5) / 1e5
              AS DECIMAL(24,5)) AS pw
  FROM terms GROUP BY k
),
norm AS (SELECT CAST(SUM(pw) AS DOUBLE) AS z FROM spec),
ent_terms AS (
  SELECT CAST(FLOOR((CASE WHEN CAST(pw AS DOUBLE) > 0
                THEN (CAST(pw AS DOUBLE) / n.z)
                     * LN(n.z / CAST(pw AS DOUBLE))
                ELSE 0 END) * 1e10 + 0.5) / 1e10 AS DECIMAL(24,10)) AS tq,
         CAST(pw AS DOUBLE) / n.z AS p
  FROM spec CROSS JOIN norm n
)
SELECT CAST({_K} AS BIGINT)                          AS n_freqs,
       FLOOR((CAST(SUM(tq) AS DOUBLE)) * 1e6 + 0.5) / 1e6             AS spectral_entropy,
       FLOOR((CAST(SUM(tq) AS DOUBLE) / LN({_K}.0)) * 1e6 + 0.5) / 1e6 AS entropy_normalized,
       FLOOR((MAX(p)) * 1e6 + 0.5) / 1e6                              AS peak_share
FROM ent_terms
"""


@register(
    "q_ts_spectral_entropy",
    oracle=_QSPECENT_ORACLE,
    description=(
        "spectral entropy of the hourly-volume periodogram (frequencies "
        f"1..{_K}): Shannon entropy of the normalized power distribution "
        "plus the peak frequency's share — low entropy = strongly "
        "periodic traffic, high = broadband noise; entropy terms are "
        "computed from the ROUNDED powers both engines agree on and "
        "quantized to DECIMAL before the sum"
    ),
    tags=("timeseries", "spectral", "entropy", "aggregate"),
)
def q_ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same span-bounded DFT pipeline as q_ts_periodogram; the entropy
    stage is a K-row reduction."""
    e = table(spark, sf_dir, "events")
    counts = (
        e.select(F.expr("unix_micros(ts) DIV 3600000000").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    bounds = counts.agg(
        F.min("h").alias("h0"),
        (F.max("h") - F.min("h") + 1).alias("n"),
        F.sum("x").cast("long").alias("tot"),
    )
    ks = spark.range(1, _K + 1).select(F.col("id").alias("k"))
    angle = (
        F.lit(_TWO_PI)
        * ((F.col("k") * (F.col("h") - F.col("h0"))) % F.col("n")).cast("double")
    ) / F.col("n").cast("double")
    terms = (
        counts.crossJoin(F.broadcast(bounds))
        .crossJoin(F.broadcast(ks))
        .select(
            "k",
            "tot",
            (F.col("x").cast("double") * F.cos(angle)).alias("tc"),
            (F.col("x").cast("double") * F.sin(angle)).alias("ts"),
        )
    )
    spec = terms.groupBy("k").agg(
        (F.floor((F.pow(F.sum("tc") / F.any_value("tot").cast("double"), 2)
            + F.pow(F.sum("ts") / F.any_value("tot").cast("double"), 2)) * 1e5 + 0.5) / 1e5)
        .cast("decimal(24,5)")
        .alias("pw")
    )
    norm = spec.agg(F.sum("pw").cast("double").alias("z"))
    p = F.col("pw").cast("double") / F.col("z")
    ent_terms = spec.crossJoin(F.broadcast(norm)).select(
        (F.floor((F.when(
                F.col("pw").cast("double") > 0,
                p * F.log(F.col("z") / F.col("pw").cast("double")),
            ).otherwise(0.0)) * 1e10 + 0.5) / 1e10)
        .cast("decimal(24,10)")
        .alias("tq"),
        p.alias("p"),
    )
    import math as _math

    return ent_terms.agg(
        F.lit(_K).cast("long").alias("n_freqs"),
        (F.floor((F.sum("tq").cast("double")) * 1e6 + 0.5) / 1e6).alias("spectral_entropy"),
        (F.floor((F.sum("tq").cast("double") / _math.log(_K)) * 1e6 + 0.5) / 1e6).alias("entropy_normalized"),
        (F.floor((F.max("p")) * 1e6 + 0.5) / 1e6).alias("peak_share"),
    )
