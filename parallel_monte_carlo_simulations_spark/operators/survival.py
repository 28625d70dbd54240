"""Survival analysis: Kaplan-Meier estimator as one sorted aggregation.

Time-to-event analytics (churn, conversion latency, hardware failure)
is a standard warehouse workload that reduces entirely to exact counts
plus one ordered product — no per-subject iteration:

1. Per subject (user), derive a duration and an observed/censored flag:
   start = first event, event = first high-value event (``value > 200``,
   a conversion proxy), censored at the subject's last event otherwise.
2. Risk table at each distinct duration t: d_t (events), c_t
   (censored), n_t (at risk = subjects with duration >= t) — all exact
   integers, so they oracle bit-for-bit.
3. KM survival S(t) = prod_{s<=t} (n_s - d_s)/n_s. SQL folds products
   via exp-sum-log; the cross-engine float discipline is the repo-wide
   quantized-log pattern (see functions/text.py TF-IDF): each per-row
   ln term is rounded to DECIMAL(18,9) BEFORE the cumulative sum, so
   the sum is order-independent and identical in both engines, and the
   final exp is rounded once.

Scale: stage 1 is a groupBy on the subject key (one shuffle, map-side
partial agg); stages 2-3 operate on the risk table, whose size is the
number of DISTINCT durations (days) — a few thousand rows regardless of
subject count, so the single-partition ordered window is safe at 100 TB
(the reduction to distinct-duration granularity happens first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60, sql_hash60
from ..functions.microunit import guard_abs_lt
from ..registry import register
from ..tables import table

#: Conversion proxy: the first event with value above this threshold.
EVENT_VALUE_THRESHOLD = 200

_QKM_ORACLE = f"""
WITH subjects AS (
  SELECT user_id,
         MIN(ts) AS start_ts,
         MIN(CASE WHEN value > {EVENT_VALUE_THRESHOLD} THEN ts END) AS event_ts,
         MAX(ts) AS last_ts
  FROM events
  GROUP BY user_id
),
durations AS (
  SELECT user_id,
         CASE WHEN event_ts IS NOT NULL
              THEN datediff('day', start_ts, event_ts)
              ELSE datediff('day', start_ts, last_ts) END AS t,
         CASE WHEN event_ts IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM subjects
),
risk AS (
  SELECT t,
         CAST(SUM(observed) AS BIGINT) AS d_events,
         CAST(SUM(1 - observed) AS BIGINT) AS c_censored
  FROM durations
  GROUP BY t
),
atrisk AS (
  SELECT t, d_events, c_censored,
         SUM(d_events + c_censored)
           OVER (ORDER BY t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at_risk
  FROM risk
),
terms AS (
  SELECT t, d_events, c_censored, CAST(n_at_risk AS BIGINT) AS n_at_risk,
         CASE WHEN d_events > 0 AND n_at_risk > d_events
              THEN CAST(FLOOR((ln(CAST(n_at_risk - d_events AS DOUBLE)
                                 / CAST(n_at_risk AS DOUBLE))) * 1e9 + 0.5) / 1e9
                        AS DECIMAL(18,9))
              ELSE CAST(0 AS DECIMAL(18,9)) END AS lnterm,
         CASE WHEN d_events > 0 AND n_at_risk = d_events THEN 1 ELSE 0 END
           AS hits_zero
  FROM atrisk
)
SELECT t, d_events, c_censored, n_at_risk,
       CASE WHEN SUM(hits_zero) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0
            THEN 0.0e0
            ELSE FLOOR((exp(CAST(SUM(lnterm) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE))) * 1e6 + 0.5) / 1e6 END AS survival
FROM terms
ORDER BY t
"""


@register(
    "q_survival_kaplan_meier",
    oracle=_QKM_ORACLE,
    description=(
        "Kaplan-Meier survival curve: time from first event to first "
        "high-value event per user (censored at last event), exact "
        "integer risk table + quantized-log product for S(t)"
    ),
    tags=("survival", "statistics", "window", "timeseries", "analytics"),
)
def q_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    subjects = e.groupBy("user_id").agg(
        F.min("ts").alias("start_ts"),
        F.min(
            F.when(F.col("value") > EVENT_VALUE_THRESHOLD, F.col("ts"))
        ).alias("event_ts"),
        F.max("ts").alias("last_ts"),
    )
    durations = subjects.select(
        F.when(
            F.col("event_ts").isNotNull(),
            F.datediff("event_ts", "start_ts"),
        )
        .otherwise(F.datediff("last_ts", "start_ts"))
        .alias("t"),
        F.when(F.col("event_ts").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("observed"),
    )
    risk = durations.groupBy("t").agg(
        F.sum("observed").alias("d_events"),
        F.sum(F.lit(1) - F.col("observed")).alias("c_censored"),
    )
    # n at risk = suffix sum over descending t. The window runs on the
    # risk table (distinct durations only) — bounded rows, single
    # partition is deliberate and safe.
    w_desc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    atrisk = risk.withColumn(
        "n_at_risk",
        F.sum(F.col("d_events") + F.col("c_censored")).over(w_desc),
    )
    lnterm = F.when(
        (F.col("d_events") > 0) & (F.col("n_at_risk") > F.col("d_events")),
        (F.floor((F.log(
                (F.col("n_at_risk") - F.col("d_events")).cast("double")
                / F.col("n_at_risk").cast("double")
            )) * 1e9 + 0.5) / 1e9).cast("decimal(18,9)"),
    ).otherwise(F.lit(0).cast("decimal(18,9)"))
    hits_zero = F.when(
        (F.col("d_events") > 0) & (F.col("n_at_risk") == F.col("d_events")),
        F.lit(1),
    ).otherwise(F.lit(0))
    terms = atrisk.select(
        "t",
        "d_events",
        "c_censored",
        "n_at_risk",
        lnterm.alias("lnterm"),
        hits_zero.alias("hits_zero"),
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # The cumulative DECIMAL(_,9) log-sum is exact as a decimal; its one
    # cast to double is correctly rounded only while |sum|*1e9 < 2^53
    # (|sum| < ~9.0e6 — risk tables are thousands of rows with |ln| <=
    # ~20, so the headroom is ~4 orders). Fence it (functions/microunit)
    # so growth past the exact range fails loudly, never silently.
    lnsum = guard_abs_lt(
        F.sum("lnterm").over(w_asc), 9.0e6, "survival.km_lnsum"
    )
    survival = F.when(F.sum("hits_zero").over(w_asc) > 0, F.lit(0.0)).otherwise(
        (F.floor((F.exp(lnsum.cast("double"))) * 1e6 + 0.5) / 1e6)
    )
    return terms.select(
        "t",
        "d_events",
        "c_censored",
        "n_at_risk",
        survival.alias("survival"),
    ).orderBy("t")


# --------------------------------------------------------------------------
# Log-rank test: do two cohorts share a survival curve? (Mantel 1966)
# --------------------------------------------------------------------------

_GRP_HASH_SQL = sql_hash60("'lrk:' || CAST(user_id AS VARCHAR)")

_QLOGRANK_ORACLE = f"""
WITH subjects AS (
  SELECT user_id,
         {_GRP_HASH_SQL} % 2 AS grp,
         MIN(ts) AS start_ts,
         MIN(CASE WHEN value > {EVENT_VALUE_THRESHOLD} THEN ts END) AS event_ts,
         MAX(ts) AS last_ts
  FROM events
  GROUP BY user_id
),
durations AS (
  SELECT grp,
         CASE WHEN event_ts IS NOT NULL
              THEN datediff('day', start_ts, event_ts)
              ELSE datediff('day', start_ts, last_ts) END AS t,
         CASE WHEN event_ts IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM subjects
),
risk AS (
  SELECT t,
         CAST(SUM(CASE WHEN grp = 0 THEN observed ELSE 0 END) AS BIGINT) AS d1,
         CAST(SUM(CASE WHEN grp = 1 THEN observed ELSE 0 END) AS BIGINT) AS d2,
         CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM durations GROUP BY t
),
atrisk AS (
  SELECT t, d1, d2,
         CAST(SUM(c1) OVER (ORDER BY t DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n1,
         CAST(SUM(c2) OVER (ORDER BY t DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n2
  FROM risk
),
terms AS (
  SELECT t, d1, d2, n1, n2, (n1 + n2) AS n, (d1 + d2) AS d,
         CAST(FLOOR((CAST((d1 + d2) * n1 AS DOUBLE)
                    / CAST(n1 + n2 AS DOUBLE)) * 1e9 + 0.5) / 1e9 AS DECIMAL(18,9)) AS e1,
         CASE WHEN (n1 + n2) > 1 THEN
           CAST(FLOOR((CAST((d1 + d2) * n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                      * CAST((n1 + n2) - (d1 + d2) AS DOUBLE)
                      / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                         * CAST((n1 + n2) - 1 AS DOUBLE))) * 1e9 + 0.5) / 1e9
                AS DECIMAL(18,9))
         ELSE CAST(0 AS DECIMAL(18,9)) END AS v1
  FROM atrisk
  WHERE (d1 + d2) > 0
),
agg AS (
  SELECT CAST(SUM(d1) AS BIGINT) AS o1,
         CAST(SUM(e1) AS DOUBLE) AS e1,
         CAST(SUM(v1) AS DOUBLE) AS v1
  FROM terms
)
SELECT o1,
       FLOOR((e1) * 1e4 + 0.5) / 1e4 AS e1,
       FLOOR(((CAST(o1 AS DOUBLE) - e1) * (CAST(o1 AS DOUBLE) - e1) / v1) * 1e4 + 0.5) / 1e4
         AS chi2
FROM agg
"""


@register(
    "q_survival_logrank",
    oracle=_QLOGRANK_ORACLE,
    description=(
        "log-rank test between two hash-split user cohorts: exact "
        "integer risk tables, quantized hypergeometric E/V terms, "
        "chi-square statistic"
    ),
    tags=("survival", "statistics", "logrank", "ab-testing", "window"),
)
def q_survival_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel log-rank: at each event time, the observed group-0
    events d1 vs their hypergeometric expectation d*n1/n, variance
    d*n1*n2*(n-d)/(n^2*(n-1)); chi2 = (O-E)^2/V. Term-quantized to
    DECIMAL(18,9) before the cross-time sums so both engines agree
    bit-for-bit."""
    e = table(spark, sf_dir, "events")
    subjects = e.groupBy("user_id").agg(
        F.min("ts").alias("start_ts"),
        F.min(
            F.when(F.col("value") > EVENT_VALUE_THRESHOLD, F.col("ts"))
        ).alias("event_ts"),
        F.max("ts").alias("last_ts"),
    ).select(
        (
            hash60(F.concat(F.lit("lrk:"), F.col("user_id").cast("string")))
            % 2
        ).alias("grp"),
        "start_ts",
        "event_ts",
        "last_ts",
    )
    durations = subjects.select(
        "grp",
        F.when(
            F.col("event_ts").isNotNull(), F.datediff("event_ts", "start_ts")
        )
        .otherwise(F.datediff("last_ts", "start_ts"))
        .alias("t"),
        F.when(F.col("event_ts").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("observed"),
    )
    risk = durations.groupBy("t").agg(
        F.sum(F.when(F.col("grp") == 0, F.col("observed")).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("grp") == 1, F.col("observed")).otherwise(0)).alias("d2"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c2"),
    )
    w_desc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    atrisk = risk.select(
        "t",
        "d1",
        "d2",
        F.sum("c1").over(w_desc).alias("n1"),
        F.sum("c2").over(w_desc).alias("n2"),
    )
    d = F.col("d1") + F.col("d2")
    n = F.col("n1") + F.col("n2")
    e1 = (F.floor(((d * F.col("n1")).cast("double") / n.cast("double")) * 1e9 + 0.5) / 1e9).cast("decimal(18,9)")
    v1 = F.when(
        n > 1,
        (F.floor(((d * F.col("n1")).cast("double")
            * F.col("n2").cast("double")
            * (n - d).cast("double")
            / (n.cast("double") * n.cast("double") * (n - 1).cast("double"))) * 1e9 + 0.5) / 1e9).cast("decimal(18,9)"),
    ).otherwise(F.lit(0).cast("decimal(18,9)"))
    terms = atrisk.where(d > 0).select(
        F.col("d1"), e1.alias("e1"), v1.alias("v1")
    )
    agg = terms.agg(
        F.sum("d1").alias("o1"),
        F.sum("e1").cast("double").alias("e1"),
        F.sum("v1").cast("double").alias("v1"),
    )
    return agg.select(
        "o1",
        (F.floor((F.col("e1")) * 1e4 + 0.5) / 1e4).alias("e1"),
        (F.floor(((F.col("o1").cast("double") - F.col("e1"))
            * (F.col("o1").cast("double") - F.col("e1"))
            / F.col("v1")) * 1e4 + 0.5) / 1e4).alias("chi2"),
    )
