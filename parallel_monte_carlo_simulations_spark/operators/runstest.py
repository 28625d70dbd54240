"""Wald-Wolfowitz runs test on daily revenue movements (round 10).

The nonparametric randomness screen missing from the hypothesis-test
battery (KS, Mann-Whitney, chi-square, ANOVA, Jarque-Bera, Ljung-Box):
is the SEQUENCE of up/down moves random, or does it streak (momentum)
or alternate (mean reversion)? Per event type, the day-over-day sign
sequence of zero-filled daily cent totals gives n1 ups, n2 downs and R
runs; under randomness

    mu    = 1 + 2*n1*n2 / n
    sigma2 = 2*n1*n2*(2*n1*n2 - n) / (n^2 * (n - 1)),   n = n1 + n2

and z = (R - mu) / sigma — negative z = streaky, positive =
alternating. Zero diffs are excluded (the standard treatment).

Exactness: the sign sequence, run boundaries, n1/n2/R are all integer
(window lag + conditional count); mu/sigma/z is one mirrored double
expression over exact integers, rounded once.

Scale: one daily rollup, then everything is day-span-sized per type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QRUNS_ORACLE = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(d) AS d0, MAX(d) - MIN(d) + 1 AS n
  FROM daily GROUP BY event_type
),
spine AS (
  SELECT b.event_type, b.d0, g.rn
  FROM bounds b, LATERAL (SELECT unnest(range(0, b.n)) AS rn) g
),
grid AS (
  SELECT sp.event_type, sp.rn, COALESCE(dl.cents, 0) AS cents
  FROM spine sp
  LEFT JOIN daily dl
    ON dl.event_type = sp.event_type AND dl.d = sp.rn + sp.d0
),
diffs AS (
  SELECT event_type, rn,
         cents - LAG(cents) OVER (PARTITION BY event_type ORDER BY rn)
           AS dv
  FROM grid
),
signs AS (
  SELECT event_type, rn, (dv > 0) AS up
  FROM diffs WHERE dv IS NOT NULL AND dv <> 0
),
runs AS (
  SELECT event_type, up,
         CASE WHEN LAG(up) OVER (PARTITION BY event_type ORDER BY rn)
                   IS DISTINCT FROM up THEN 1 ELSE 0 END AS boundary
  FROM signs
),
stats AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN up THEN 0 ELSE 1 END) AS BIGINT) AS n2,
         CAST(SUM(boundary) AS BIGINT) AS n_runs
  FROM runs GROUP BY event_type
)
SELECT event_type, n1 AS n_up, n2 AS n_down, n_runs,
       -- sigma is 0 whenever 2*n1*n2 <= n1+n2 (all moves one sign, or
       -- n1=n2=1): emit NULL from BOTH engines instead of diverging
       -- NaN-vs-NULL on degenerate series (ADVICE r10).
       CASE WHEN 2 * n1 * n2 > n1 + n2 THEN
       FLOOR(((CAST(n_runs AS DOUBLE)
              - (1.0e0 + 2.0e0 * n1 * n2 / (n1 + n2)))
             / SQRT(2.0e0 * n1 * n2 * (2.0e0 * n1 * n2 - (n1 + n2))
                    / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                       * (n1 + n2 - 1)))) * 1e6 + 0.5) / 1e6 END AS z_score
FROM stats
ORDER BY event_type
"""


@register(
    "q_stat_runs_test",
    oracle=_QRUNS_ORACLE,
    description=(
        "Wald-Wolfowitz runs test on day-over-day revenue moves per "
        "event type: integer sign sequence / run boundaries / n1-n2 "
        "counts, one mirrored z expression — the sequence-randomness "
        "screen (streaky vs alternating) completing the nonparametric "
        "battery"
    ),
    tags=("statistics", "hypothesis-test", "runs-test", "timeseries"),
)
def q_stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.expr("unix_micros(ts) DIV 86400000000").alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("d").alias("d0"), (F.max("d") - F.min("d") + 1).alias("n")
    )
    grid = (
        bounds.select(
            "event_type",
            "d0",
            F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("rn"),
        )
        .join(
            daily.select(
                F.col("event_type").alias("et"),
                F.col("d").alias("dd"),
                "cents",
            ).hint("merge"),
            (F.col("et") == F.col("event_type"))
            & (F.col("dd") == F.col("rn") + F.col("d0")),
            "left",
        )
        .select(
            "event_type",
            "rn",
            F.coalesce(F.col("cents"), F.lit(0)).alias("cents"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("rn")
    diffs = grid.select(
        "event_type",
        "rn",
        (F.col("cents") - F.lag("cents").over(w)).alias("dv"),
    )
    signs = diffs.filter(
        F.col("dv").isNotNull() & (F.col("dv") != 0)
    ).select("event_type", "rn", (F.col("dv") > 0).alias("up"))
    runs = signs.select(
        "event_type",
        "up",
        F.when(
            ~F.lag("up").over(w).eqNullSafe(F.col("up")), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("boundary"),
    )
    stats = runs.groupBy("event_type").agg(
        F.sum(F.when(F.col("up"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("up"), 0).otherwise(1)).cast("long").alias("n2"),
        F.sum("boundary").cast("long").alias("n_runs"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n = F.col("n1") + F.col("n2")
    mu = F.lit(1.0) + F.lit(2.0) * F.col("n1") * F.col("n2") / n
    sigma = F.sqrt(
        F.lit(2.0)
        * F.col("n1")
        * F.col("n2")
        * (F.lit(2.0) * F.col("n1") * F.col("n2") - n)
        / (n.cast("double") * n * (n - 1))
    )
    # sigma degenerates to 0 when 2*n1*n2 <= n (one-signed series or
    # n1=n2=1): mirrored NULL guard in both engines (ADVICE r10).
    nondegenerate = (F.lit(2) * F.col("n1") * F.col("n2")) > (
        F.col("n1") + F.col("n2")
    )
    return stats.select(
        "event_type",
        F.col("n1").alias("n_up"),
        F.col("n2").alias("n_down"),
        "n_runs",
        F.when(nondegenerate, (F.floor(((d("n_runs") - mu) / sigma) * 1e6 + 0.5) / 1e6))
        .otherwise(F.lit(None).cast("double"))
        .alias("z_score"),
    ).orderBy("event_type")
