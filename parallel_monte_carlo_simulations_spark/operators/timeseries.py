"""Time-series & product analytics over the events table: hourly
gap-fill with forward fill, funnel stage analysis, cohort retention.

These are the batch analytics a streaming events pipeline lands in; all
are pure DataFrame ops. Scale notes: the gap-fill grid is
|event_types| x |hours| — tiny relative to the events themselves, and
the forward-fill window partitions by event_type so each partition's
state is one running value. Funnel/cohort shuffle on user_id only after
a per-user aggregate has collapsed the fact table.

The reference has no time/event surface at all (§2.A — its only data
are simulation traces); this file belongs to the §2.B capability sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.microunit import (
    qround_col,
    qround_duck,
    rdiv_halfup_duck,
    rdiv_halfup_expr,
    units_col,
    units_sql,
)
from ..registry import register
from ..tables import table

# --------------------------------------------------------------------------
# Hourly resample + forward fill: regularize an irregular event stream
# onto a complete hour grid, filling silent hours from the last value.
# --------------------------------------------------------------------------

_QGAPFILL_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         {rdiv_halfup_duck(f"SUM({units_sql('value', 2)})", "100", 2)} AS v
  FROM events GROUP BY event_type, hr
),
bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
),
grid AS (
  SELECT t.event_type, u.hr
  FROM (SELECT DISTINCT event_type FROM events) t,
       bounds, LATERAL (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr) u
)
SELECT g.event_type, g.hr,
       last_value(h.v IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.hr
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff,
       h.v IS NULL AS was_gap
FROM grid g
LEFT JOIN hourly h ON h.event_type = g.event_type AND h.hr = g.hr
"""


@register(
    "q_gapfill_forward_fill",
    oracle=_QGAPFILL_ORACLE,
    description="hourly resample onto a sequence() grid + forward fill (last ignoreNulls)",
    tags=("timeseries", "gapfill", "window", "sequence"),
)
def q_gapfill_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.sum(units_col(F.col("value"), 2)).alias("v_u2")
    ).select(
        "event_type", "hr", rdiv_halfup_expr("v_u2", "100", 2).alias("v")
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    types = e.select("event_type").distinct()
    # the grid is dims-only (types x hours): broadcast-sized by design
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    )
    joined = grid.join(hourly, ["event_type", "hr"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "hr",
        F.last("v", ignorenulls=True).over(w).alias("value_ff"),
        F.col("v").isNull().alias("was_gap"),
    )


# --------------------------------------------------------------------------
# Funnel: users progressing view -> click (after view) -> purchase
# (after click). Strictly ordered timestamps, first occurrence each.
# --------------------------------------------------------------------------

_QFUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 'stage1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
UNION ALL
SELECT 'stage2_click', CAST(COUNT(*) AS BIGINT) FROM c
UNION ALL
SELECT 'stage3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
"""


@register(
    "q_funnel_stages",
    oracle=_QFUNNEL_ORACLE,
    description="ordered funnel view->click->purchase: users per stage",
    tags=("timeseries", "funnel", "join", "aggregate"),
)
def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_after(prev: DataFrame, etype: str, tcol: str, prev_t: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(tcol))
        )

    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = first_after(v, "click", "t2", "t1")
    p = first_after(c, "purchase", "t3", "t2")

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"), F.count("*").alias("n_users")
        )

    return (
        stage(v, "stage1_view")
        .unionByName(stage(c, "stage2_click"))
        .unionByName(stage(p, "stage3_purchase"))
    )


# --------------------------------------------------------------------------
# Cohort retention: users grouped by first-activity week; how many are
# still active k weeks later.
# --------------------------------------------------------------------------

_QCOHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         CAST(FLOOR(datediff('day', TIMESTAMP '2024-01-01', MIN(ts)) / 7.0)
              AS INTEGER) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(datediff('day', TIMESTAMP '2024-01-01', ts) / 7.0)
              AS INTEGER) AS week
  FROM events
)
SELECT f.cohort_week,
       a.week - f.cohort_week AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS active_users
FROM activity a JOIN firsts f ON a.user_id = f.user_id
GROUP BY f.cohort_week, week_offset
"""


@register(
    "q_cohort_retention",
    oracle=_QCOHORT_ORACLE,
    description="weekly cohort retention matrix (cohort_week x week_offset)",
    tags=("timeseries", "cohort", "retention", "aggregate"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("timestamp")) / 7.0
    ).cast("int")
    firsts = (
        e.groupBy("user_id").agg(F.min("ts").alias("first_ts")).select(
            "user_id",
            F.floor(
                F.datediff(F.col("first_ts"), F.lit("2024-01-01").cast("timestamp"))
                / 7.0
            )
            .cast("int")
            .alias("cohort_week"),
        )
    )
    activity = e.select("user_id", week.alias("week")).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )


# --------------------------------------------------------------------------
# Batch sessionization: lag + gap flag + running sum = session ids.
# The batch twin of streaming session_window (q_stream_session_10m) —
# same 10-minute gap rule, expressed as windows over history.
# --------------------------------------------------------------------------

_QSESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
         event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 600000000 OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS duration_us
FROM sess
GROUP BY user_id, session_id
"""


@register(
    "q_sessionize_batch",
    oracle=_QSESSIONIZE_ORACLE,
    description="batch sessionization: 10-min-gap sessions via lag + running sum",
    tags=("timeseries", "session", "window"),
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    # event_id tie-break makes lag deterministic under equal timestamps;
    # microsecond epoch on both engines — second-floor truncation would
    # classify near-600s gaps differently than the oracle.
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    prev = F.lag(us).over(wo)
    gap = prev.isNull() | (us - prev > 600_000_000)
    flagged = e.select(
        "user_id", "ts", "event_id", gap.cast("int").alias("new_session")
    )
    # The running sum uses the SAME (ts, event_id) tie-break as the lag
    # window above: ordering one window by ts alone would make the
    # session assignment nondeterministic under duplicate timestamps.
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.select(
        "user_id", "ts", F.sum("new_session").over(ws).alias("session_id")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
        .alias("duration_us"),
    )


# --------------------------------------------------------------------------
# EWMA: exponentially weighted moving average over a bounded trailing
# window (the smoothing primitive behind monitoring dashboards).
# --------------------------------------------------------------------------

_EWMA_ALPHA = 0.9
_EWMA_ROWS = 10

_QEWMA_ORACLE = f"""
WITH w AS (
  SELECT user_id, event_id,
         list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {_EWMA_ROWS - 1} PRECEDING AND CURRENT ROW
         ) AS vals
  FROM events
)
SELECT user_id, event_id,
       {qround_duck(
           f'''list_reduce(list_concat([0.0], list_transform(
           range(1, len(vals) + 1),
           i -> vals[i] * pow({_EWMA_ALPHA}, len(vals) - i)
         )), (acc, v) -> acc + v)
         /
         list_reduce(list_concat([0.0], list_transform(
           range(1, len(vals) + 1),
           i -> pow({_EWMA_ALPHA}, len(vals) - i)
         )), (acc, v) -> acc + v)''',
           4,
       )} AS ewma
FROM w
"""


@register(
    "q_ewma_trailing",
    oracle=_QEWMA_ORACLE,
    description=(
        f"EWMA (alpha={_EWMA_ALPHA}) over a trailing {_EWMA_ROWS}-row "
        "window per user (deterministic index-ordered fold)"
    ),
    tags=("timeseries", "window", "ewma", "smoothing"),
)
def q_ewma_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average with a bounded trailing
    frame: the window collects the frame's values IN FRAME ORDER on
    both engines, and the weighted sum folds index-first, so the float
    result is bit-comparable after rounding. The (ts, event_id) window
    order keeps frames deterministic under duplicate timestamps. One
    window shuffle on user_id; the fold is per-row JVM-side — no
    quadratic self-join formulation."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_ROWS - 1), 0)
    )
    vals = F.collect_list("value").over(w)
    n = F.size(F.col("vals"))
    wsum = F.aggregate(
        F.transform(
            F.col("vals"),
            lambda v, i: v * F.pow(F.lit(_EWMA_ALPHA), n - 1 - i),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = F.aggregate(
        F.transform(
            F.col("vals"),
            lambda _v, i: F.pow(F.lit(_EWMA_ALPHA), n - 1 - i),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        e.select("user_id", "event_id", vals.alias("vals"))
        # shared floor-form quantization (qround): both engines evaluate
        # the identical IEEE ops on the identical quotient, so the
        # 4-digit result is bit-equal by construction — the raw ROUND
        # would differ between engines on boundary-adjacent doubles.
        .select(
            "user_id", "event_id", qround_col(wsum / norm, 4).alias("ewma")
        )
    )


_QZSCORE_ORACLE = """
WITH w AS (
  SELECT user_id, ts, value,
         AVG(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING) AS mu,
         STDDEV_SAMP(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING) AS sd,
         COUNT(*) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING) AS n_hist
  FROM events
)
SELECT CAST(user_id AS BIGINT)  AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(SUM(CASE WHEN abs(value - mu) > 3 * sd THEN 1 ELSE 0 END)
            AS BIGINT)          AS n_anomalies
FROM w
WHERE n_hist >= 5 AND sd > 0
GROUP BY user_id
HAVING SUM(CASE WHEN abs(value - mu) > 3 * sd THEN 1 ELSE 0 END) > 0
"""


@register(
    "q_anomaly_rolling_zscore",
    oracle=_QZSCORE_ORACLE,
    description=(
        "rolling z-score anomaly detection: each event scored against "
        "the trailing-20 window of ITS OWN user (history excludes the "
        "current row); users with |z| > 3 hits"
    ),
    tags=("timeseries", "window", "anomaly", "statistics"),
)
def q_anomaly_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming-monitoring classic in batch form: a trailing
    window (19 PRECEDING .. 1 PRECEDING — the current value must not
    contaminate its own baseline) provides mean/std per user, events
    beyond 3 sigma count as anomalies. One user-keyed shuffle; the
    frame carries running moments only. Warm-up rows (history < 5) and
    zero-variance windows are excluded identically in both engines."""
    e = table(spark, sf_dir, "events")
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, -1)
    )
    w = e.select(
        "user_id",
        "value",
        F.avg("value").over(frame).alias("mu"),
        F.stddev_samp("value").over(frame).alias("sd"),
        F.count(F.lit(1)).over(frame).alias("n_hist"),
    ).filter((F.col("n_hist") >= 5) & (F.col("sd") > 0))
    hit = F.when(
        F.abs(F.col("value") - F.col("mu")) > 3 * F.col("sd"), 1
    ).otherwise(0)
    return (
        w.groupBy(F.col("user_id").cast("long").alias("user_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored"),
            F.sum(hit).cast("long").alias("n_anomalies"),
        )
        .filter(F.col("n_anomalies") > 0)
    )


# --------------------------------------------------------------------------
# Round 5: sequence analytics — Markov transition matrix + last-touch
# attribution. Both are one-window-pass shapes over the per-user ordered
# stream (shuffle on user_id once), the standard journey-analytics plans.
# --------------------------------------------------------------------------

_QMARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS from_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS to_type
  FROM events
),
pairs AS (SELECT from_type, to_type FROM seq WHERE to_type IS NOT NULL),
counts AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM pairs GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
       FLOOR(CAST(n_transitions AS DOUBLE)
             / SUM(n_transitions) OVER (PARTITION BY from_type)
             * 1000000 + 0.5e0) / 1000000 AS p_transition
FROM counts
"""


@register(
    "q_markov_transitions",
    oracle=_QMARKOV_ORACLE,
    description=(
        "first-order Markov transition matrix of the per-user event "
        "stream: lead-window pairs, conditional probabilities per "
        "from-state — the journey-analytics building block"
    ),
    tags=("timeseries", "window", "markov", "analytics"),
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    wt = Window.partitionBy("from_type")
    p = F.col("n_transitions").cast("double") / F.sum("n_transitions").over(wt)
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        (F.floor(p * 1_000_000 + 0.5) / 1_000_000).alias("p_transition"),
    )


_ATTR_WINDOW_S = 7 * 86_400  # last-touch lookback


_QATTR_ORACLE = f"""
WITH stream AS (
  SELECT user_id, event_id, ts, event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                    IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_ts
  FROM events
),
attributed AS (
  SELECT CASE WHEN lt_type IS NULL
                OR date_diff('second', lt_ts, ts) > {_ATTR_WINDOW_S}
              THEN 'direct' ELSE lt_type END AS channel,
         CAST(FLOOR(value * 100 + 0.5e0) AS BIGINT) AS cents
  FROM stream WHERE event_type = 'purchase'
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(cents) AS DOUBLE) / 100 AS attributed_revenue
FROM attributed GROUP BY channel
"""


@register(
    "q_attribution_last_touch",
    oracle=_QATTR_ORACLE,
    description=(
        "last-touch revenue attribution: each purchase credits the "
        "user's most recent non-purchase event within 7 days (else "
        "'direct'); ignore-nulls last_value window, integer-cents sums"
    ),
    tags=("timeseries", "window", "attribution", "analytics"),
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-attribution shape: the channel of each conversion is the
    last preceding touch inside the lookback. One ignore-nulls
    last_value window over the per-user ordered stream (no per-purchase
    range join), then a 5-row aggregate. Revenue goes through exact
    integer cents so the per-channel sums are partition-order
    independent — a raw double SUM would drift in the last ulp."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touch_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    stream = e.select(
        "event_type",
        "ts",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("lt_type"),
        F.last(touch_ts, ignorenulls=True).over(w).alias("lt_ts"),
    )
    gap = F.unix_timestamp("ts") - F.unix_timestamp("lt_ts")
    channel = F.when(
        F.col("lt_type").isNull() | (gap > _ATTR_WINDOW_S), "direct"
    ).otherwise(F.col("lt_type"))
    attributed = stream.filter(F.col("event_type") == "purchase").select(
        channel.alias("channel"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        (F.sum("cents").cast("double") / 100).alias("attributed_revenue"),
    )


# --------------------------------------------------------------------------
# Cohort LTV: cumulative value per signup cohort over week offsets — the
# revenue counterpart of q_cohort_retention.
# --------------------------------------------------------------------------

_QLTV_ORACLE = f"""
WITH firsts AS (
  SELECT user_id,
         CAST(FLOOR(datediff('day', TIMESTAMP '2024-01-01', MIN(ts)) / 7.0)
              AS INTEGER) AS cohort_week
  FROM events GROUP BY user_id
),
weekly AS (
  SELECT f.cohort_week,
         CAST(FLOOR(datediff('day', TIMESTAMP '2024-01-01', e.ts) / 7.0)
              AS INTEGER) - f.cohort_week AS week_offset,
         CAST(SUM(CAST(ROUND(e.value * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events e JOIN firsts f ON e.user_id = f.user_id
  GROUP BY f.cohort_week, week_offset
),
sized AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
  FROM firsts GROUP BY cohort_week
)
SELECT w.cohort_week, w.week_offset, s.cohort_users,
       {rdiv_halfup_duck(
           "SUM(w.cents) OVER (PARTITION BY w.cohort_week "
           "ORDER BY w.week_offset "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
           "100 * s.cohort_users",
           4,
       )} AS cum_ltv_per_user
FROM weekly w JOIN sized s ON w.cohort_week = s.cohort_week
ORDER BY w.cohort_week, w.week_offset
"""


@register(
    "q_cohort_ltv",
    oracle=_QLTV_ORACLE,
    description=(
        "cohort LTV curve: cumulative per-user value by signup cohort "
        "and week offset (exact cent running sums) — the revenue "
        "counterpart of the retention matrix"
    ),
    tags=("timeseries", "cohort", "ltv", "window", "analytics"),
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("timestamp")) / 7.0
    ).cast("int")
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("first_ts")).select(
        "user_id",
        F.floor(
            F.datediff(F.col("first_ts"), F.lit("2024-01-01").cast("timestamp"))
            / 7.0
        )
        .cast("int")
        .alias("cohort_week"),
    )
    weekly = (
        e.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (week - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "cents"
            )
        )
    )
    sized = firsts.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_users")
    )
    w = Window.partitionBy("cohort_week").orderBy("week_offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        weekly.join(F.broadcast(sized), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "cohort_users",
            F.sum("cents").over(w).alias("cum_u2"),
        )
        .select(
            "cohort_week",
            "week_offset",
            "cohort_users",
            rdiv_halfup_expr("cum_u2", "100 * cohort_users", 4).alias(
                "cum_ltv_per_user"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------------------------------
# Path-depth transitions: what users do 1st -> 2nd -> 3rd, the Sankey
# feed (depth-indexed, unlike the stationary Markov transition matrix).
# --------------------------------------------------------------------------

_QPATHDEPTH_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS depth
  FROM events
),
steps AS (
  SELECT o.user_id, o.depth AS from_depth,
         o.event_type AS from_type,
         n.event_type AS to_type
  FROM ordered o JOIN ordered n
    ON n.user_id = o.user_id AND n.depth = o.depth + 1
  WHERE o.depth <= 3
)
SELECT from_depth, from_type, to_type,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM steps
GROUP BY from_depth, from_type, to_type
HAVING COUNT(*) >= 2
ORDER BY from_depth, from_type, to_type
"""


@register(
    "q_path_depth_transitions",
    oracle=_QPATHDEPTH_ORACLE,
    description=(
        "depth-indexed path transitions (Sankey feed): event-type flows "
        "at session positions 1->2, 2->3, 3->4 — unlike the stationary "
        "Markov matrix, transitions vary by depth"
    ),
    tags=("timeseries", "path", "sankey", "window", "analytics"),
)
def q_path_depth_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("depth")
    )
    nxt = ordered.select(
        F.col("user_id").alias("uid_n"),
        F.col("event_type").alias("to_type"),
        F.col("depth").alias("depth_n"),
    )
    steps = ordered.where(F.col("depth") <= 3).join(
        nxt,
        (F.col("uid_n") == F.col("user_id"))
        & (F.col("depth_n") == F.col("depth") + 1),
    )
    return (
        steps.groupBy(
            F.col("depth").alias("from_depth"),
            F.col("event_type").alias("from_type"),
            "to_type",
        )
        .agg(F.count("*").alias("n_users"))
        .where(F.col("n_users") >= 2)
        .orderBy("from_depth", "from_type", "to_type")
    )


# --------------------------------------------------------------------------
# Gaps & islands over a key sequence: contiguous runs and missing ranges
# — the sequence-integrity audit (id allocation, ingestion gaps).
# --------------------------------------------------------------------------

_QGAPS_ORACLE = """
WITH keys AS (
  SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
),
grouped AS (
  SELECT k,
         k - ROW_NUMBER() OVER (ORDER BY k) AS grp
  FROM keys
),
islands AS (
  SELECT MIN(k) AS island_start, MAX(k) AS island_end,
         CAST(COUNT(*) AS BIGINT) AS island_len
  FROM grouped GROUP BY grp
)
SELECT island_start, island_end, island_len,
       LEAD(island_start) OVER (ORDER BY island_start) - island_end - 1
         AS gap_after
FROM islands
ORDER BY island_len DESC, island_start
LIMIT 25
"""


@register(
    "q_gaps_islands_key_ranges",
    oracle=_QGAPS_ORACLE,
    description=(
        "gaps-and-islands over the F-status order-key sequence: longest "
        "contiguous runs and the gap following each — the k - "
        "row_number() grouping trick, exact integers"
    ),
    tags=("window", "gaps-islands", "data-quality", "analytics"),
)
def q_gaps_islands_key_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    keys = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("k")
    )
    # the k - row_number() grouping key and the island LEAD both run
    # through the range-bucketed kernel (round 11): rank and
    # next-island-start come from bucket-parallel walks, never a
    # single-partition sort over the key sequence.
    from .rankstats import bucketed_next_value, bucketed_running

    grouped = bucketed_running(
        keys, axis="k", order=[F.col("k").asc()], cums={"rn": F.lit(1)}
    ).select("k", (F.col("k") - F.col("rn")).alias("grp"))
    islands = grouped.groupBy("grp").agg(
        F.min("k").alias("island_start"),
        F.max("k").alias("island_end"),
        F.count("*").alias("island_len"),
    )
    return (
        bucketed_next_value(islands, "island_start")
        .select(
            "island_start",
            "island_end",
            "island_len",
            (
                F.col("next_island_start") - F.col("island_end") - 1
            ).alias("gap_after"),
        )
        .orderBy(F.desc("island_len"), "island_start")
        .limit(25)
    )
