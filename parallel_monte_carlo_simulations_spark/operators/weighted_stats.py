"""Exact weighted percentiles via cumulative-weight windows.

Survey/metrics pipelines weight observations (sampling weights, revenue
weights); the weighted median/percentile is then the smallest value
whose CUMULATIVE weight reaches p of the total — not a built-in
aggregate in either engine, but exactly expressible as one sort-window
pass: cumulative sum of weights per group, filter the first row at or
past the threshold. One shuffle on the group key; the window carries a
single running sum — the same cost as any ranked window at scale.

Weighted median of lineitem prices weighted by quantity, per return
flag: "the price point at which half the shipped QUANTITY is cheaper".
Both engines run the identical definition (ties: the first row in
(value, tie-break) order at or past the threshold), so the result is
exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

# p as exact fractions num/den: the threshold test is integer-scaled
# (cum * den >= num * total) so both engines evaluate one exact product
# of integral-valued doubles — never `cum >= 0.9 * total`, whose 0.9
# literal DuckDB types as DECIMAL while Spark multiplies in DOUBLE,
# letting a cumulative weight that lands exactly on the boundary pick
# different rows per engine.
PCTS = ((25, 1, 4), (50, 1, 2), (90, 9, 10))

_CASES = ", ".join(
    f"""FLOOR(MIN(CASE WHEN cum * {den} >= {num} * total
               THEN l_extendedprice END)
      * 100 + 0.5e0) / 100 AS wp{pct}"""
    for pct, num, den in PCTS
)

_QWMED_ORACLE = f"""
WITH w AS (
  SELECT l_returnflag, l_extendedprice, l_quantity,
         SUM(l_quantity) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum,
         SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS total
  FROM lineitem
)
SELECT l_returnflag, {_CASES},
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM w
GROUP BY l_returnflag
"""


@register(
    "q_weighted_percentiles",
    oracle=_QWMED_ORACLE,
    description=(
        "exact weighted percentiles (25/50/90) of price weighted by "
        "quantity per return flag — bucketed cumulative weights over "
        "distinct values (group-end threshold equivalence, no K-partition window)"
    ),
    tags=("window", "statistics", "weighted", "percentile"),
)
def q_weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # The oracle's per-row cumulative-weight walk satisfies
    # "exists row at value v with cum*den >= num*total" iff the
    # GROUP-END cumulative at v does (cum is monotone within a tie
    # group), so the distinct-value frame + the range-bucketed kernel
    # yields identical percentile edges with no 3-partition window.
    from .rankstats import bucketed_running

    byval = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.sum("l_quantity").alias("qty")
    )
    totals = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_rows_flag"),
    )
    w = bucketed_running(
        byval,
        axis="l_extendedprice",
        order=[F.col("l_extendedprice").asc()],
        cums={"cum": F.col("qty")},
        partition_by=("l_returnflag",),
    ).join(F.broadcast(totals), "l_returnflag")
    aggs = [
        (
            F.floor(
                F.min(
                    F.when(
                        F.col("cum") * den >= F.lit(num) * F.col("total"),
                        F.col("l_extendedprice"),
                    )
                )
                * 100
                + 0.5
            )
            / 100
        ).alias(f"wp{pct}")
        for pct, num, den in PCTS
    ]
    # n_rows is the per-flag LINEITEM count (w now has one row per
    # distinct value, so it comes from the totals frame, not count(*)).
    return w.groupBy("l_returnflag").agg(
        *aggs, F.max("n_rows_flag").cast("long").alias("n_rows")
    )


_QMAD_ORACLE = """
WITH v AS (
  SELECT event_type, event_id, value,
         SUM(1) OVER (PARTITION BY event_type ORDER BY value, event_id
                      ROWS UNBOUNDED PRECEDING) AS cum,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type, MIN(CASE WHEN cum * 2 >= n THEN value END) AS med
  FROM v GROUP BY event_type
),
d AS (
  SELECT e.event_type, e.event_id, e.value, m.med,
         ABS(e.value - m.med) AS adiff
  FROM events e JOIN med m ON m.event_type = e.event_type
),
dc AS (
  SELECT event_type, event_id, med, adiff,
         SUM(1) OVER (PARTITION BY event_type ORDER BY adiff, event_id
                      ROWS UNBOUNDED PRECEDING) AS cum,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
mad AS (
  SELECT event_type, MIN(CASE WHEN cum * 2 >= n THEN adiff END) AS mad
  FROM dc GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       FLOOR((MIN(d.med)) * 1e4 + 0.5) / 1e4 AS median_value,
       FLOOR((MIN(mad.mad)) * 1e4 + 0.5) / 1e4 AS mad_value,
       CAST(SUM(CASE WHEN d.adiff > (3.0e0 * 1.4826e0) * mad.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM d JOIN mad ON mad.event_type = d.event_type
GROUP BY d.event_type
ORDER BY d.event_type
"""


@register(
    "q_mad_outliers",
    oracle=_QMAD_ORACLE,
    description=(
        "robust outlier detection per event type: exact median + MAD via "
        "two bucketed cumulative-count passes, 3-sigma-equivalent threshold"
    ),
    tags=("statistics", "robust", "outliers", "median", "window"),
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD are the robust location/scale pair — immune to the very
    outliers being hunted, unlike mean/stddev z-scores (the rolling
    z-score in operators/timeseries is the non-robust sibling). Exact
    medians use the same integer-scaled cumulative-count selection as the
    weighted percentiles above: the threshold test is cum*2 >= n (never a
    float fraction), ties break on event_id, and the final outlier
    comparison runs on bit-identical doubles in both engines, so the
    outlier COUNT — a knife-edge boundary in float terms — still matches
    exactly. Cost: two event_type-partitioned window passes plus one
    broadcast-size join per pass — the same envelope as any ranked
    window at 100 TB."""
    from ..tables import table as _t

    ev = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    # Both median selections use the group-end cumulative equivalence
    # (cum*2 >= n is monotone in cum within a tie group), so each pass
    # is a distinct-value rollup + the range-bucketed kernel — no
    # |event_type|-partition window over raw events.
    from .rankstats import bucketed_running

    ntot = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )

    def _exact_median(df: DataFrame, col: str) -> DataFrame:
        byval = df.groupBy("event_type", col).agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        cum = bucketed_running(
            byval,
            axis=col,
            order=[F.col(col).asc()],
            cums={"cum": F.col("cnt")},
            partition_by=("event_type",),
        ).join(F.broadcast(ntot), "event_type")
        return cum.groupBy("event_type").agg(
            F.min(
                F.when(F.col("cum") * 2 >= F.col("n"), F.col(col))
            ).alias(f"med_{col}")
        )

    med = _exact_median(ev, "value").withColumnRenamed("med_value", "med")
    d = ev.join(F.broadcast(med), on="event_type").select(
        "event_type",
        "event_id",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adiff"),
    )
    mad = _exact_median(d, "adiff").withColumnRenamed("med_adiff", "mad")
    return (
        d.join(F.broadcast(mad), on="event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.floor((F.min("med")) * 1e4 + 0.5) / 1e4).alias("median_value"),
            (F.floor((F.min("mad")) * 1e4 + 0.5) / 1e4).alias("mad_value"),
            F.sum(
                F.when(
                    F.col("adiff") > (F.lit(3.0) * F.lit(1.4826)) * F.col("mad"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


_QWINSOR_ORACLE = """
WITH cents AS (
  SELECT l_returnflag AS rf, l_orderkey, l_linenumber,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v
  FROM lineitem
),
cum AS (
  SELECT rf, v,
         SUM(1) OVER (PARTITION BY rf ORDER BY v, l_orderkey, l_linenumber
                      ROWS UNBOUNDED PRECEDING) AS c,
         COUNT(*) OVER (PARTITION BY rf) AS n
  FROM cents
),
thr AS (
  SELECT rf,
         MIN(CASE WHEN c * 20 >= n THEN v END) AS p05,
         MIN(CASE WHEN c * 20 >= 19 * n THEN v END) AS p95
  FROM cum GROUP BY rf
),
w AS (
  SELECT c.rf, c.v, t.p05, t.p95,
         CASE WHEN c.v < t.p05 THEN t.p05
              WHEN c.v > t.p95 THEN t.p95
              ELSE c.v END AS wv
  FROM cents c JOIN thr t ON t.rf = c.rf
)
SELECT rf AS l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       FLOOR((MIN(p05) / 100.0e0) * 1e2 + 0.5) / 1e2 AS p05,
       FLOOR((MIN(p95) / 100.0e0) * 1e2 + 0.5) / 1e2 AS p95,
       FLOOR(((CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / 100.0e0) * 1e4 + 0.5) / 1e4
         AS mean_raw,
       FLOOR(((CAST(SUM(wv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / 100.0e0) * 1e4 + 0.5) / 1e4
         AS mean_winsorized,
       FLOOR(((CAST(SUM(CASE WHEN v >= p05 AND v <= p95 THEN v END) AS DOUBLE)
              / CAST(SUM(CASE WHEN v >= p05 AND v <= p95 THEN 1 END) AS DOUBLE))
             / 100.0e0) * 1e4 + 0.5) / 1e4 AS mean_trimmed
FROM w
GROUP BY rf
ORDER BY rf
"""


@register(
    "q_winsorized_means",
    oracle=_QWINSOR_ORACLE,
    description=(
        "5/95 winsorized and trimmed means of price per return flag — "
        "exact integer-cent sums, thresholds from the exact-percentile "
        "window machinery"
    ),
    tags=("statistics", "robust", "winsorize", "percentile", "window"),
)
def q_winsorized_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The robust-mean pair to q_mad_outliers: winsorizing clamps the
    tails to the exact 5th/95th percentile values, trimming drops them.
    Everything before the final division is integer cents — sums exact
    and order-independent in both engines — and the percentile
    thresholds reuse the integer-scaled cumulative test, so tail
    membership (v < p05, a knife-edge comparison) is decided on
    identical integers. One ranked window + one broadcast threshold
    join + one aggregation."""
    li = table(spark, sf_dir, "lineitem")
    cents = li.select(
        F.col("l_returnflag").alias("rf"),
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("v"),
    )
    # exact 5/95 percentile thresholds from the distinct-value rollup +
    # range-bucketed kernel (group-end cumulative equivalence; round 11)
    from .rankstats import bucketed_running

    byval = cents.groupBy("rf", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    ntot = cents.groupBy("rf").agg(F.count(F.lit(1)).cast("long").alias("n"))
    cum = bucketed_running(
        byval,
        axis="v",
        order=[F.col("v").asc()],
        cums={"c": F.col("cnt")},
        partition_by=("rf",),
    ).join(F.broadcast(ntot), "rf")
    thr = cum.groupBy("rf").agg(
        F.min(F.when(F.col("c") * 20 >= F.col("n"), F.col("v"))).alias("p05"),
        F.min(F.when(F.col("c") * 20 >= 19 * F.col("n"), F.col("v"))).alias("p95"),
    )
    w = cents.join(F.broadcast(thr), on="rf").select(
        "rf",
        "v",
        "p05",
        "p95",
        F.when(F.col("v") < F.col("p05"), F.col("p05"))
        .when(F.col("v") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("v"))
        .alias("wv"),
    )
    in_band = (F.col("v") >= F.col("p05")) & (F.col("v") <= F.col("p95"))
    return (
        w.groupBy("rf")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.floor((F.min("p05") / 100.0) * 1e2 + 0.5) / 1e2).alias("p05"),
            (F.floor((F.min("p95") / 100.0) * 1e2 + 0.5) / 1e2).alias("p95"),
            (F.floor(((F.sum("v").cast("double") / F.count(F.lit(1)).cast("double"))
                / 100.0) * 1e4 + 0.5) / 1e4).alias("mean_raw"),
            (F.floor(((F.sum("wv").cast("double") / F.count(F.lit(1)).cast("double"))
                / 100.0) * 1e4 + 0.5) / 1e4).alias("mean_winsorized"),
            (F.floor(((
                    F.sum(F.when(in_band, F.col("v"))).cast("double")
                    / F.sum(F.when(in_band, 1)).cast("double")
                )
                / 100.0) * 1e4 + 0.5) / 1e4).alias("mean_trimmed"),
        )
        .select(
            F.col("rf").alias("l_returnflag"),
            "n_rows",
            "p05",
            "p95",
            "mean_raw",
            "mean_winsorized",
            "mean_trimmed",
        )
        .orderBy("l_returnflag")
    )
