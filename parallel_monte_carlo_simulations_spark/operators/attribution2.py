"""Attribution, round-10 addition: position-based (U-shaped) credit.

``q_attribution_last_touch`` (timeseries.py) credits one touch per
conversion via a window — no join at all. Position-based attribution
genuinely needs the per-conversion touch PATH (40% first touch, 40%
last touch, 20% split across the middle), so the plan is the bounded
time-range join every marketing stack runs: touches join purchases of
the same user within the lookback. The join is user-keyed (one
shuffle); per-purchase path ranks come from one window over the joined
frame; fractional credits quantize to DECIMAL cents so per-channel
sums are partition-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Lookback window: 7 days, in seconds (same as last-touch).
_ATTR_WINDOW_S = 7 * 24 * 3600

_QUPOS_ORACLE = f"""
WITH touches AS (
  SELECT user_id, ts, event_id, event_type
  FROM events WHERE event_type <> 'purchase'
),
purchases AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR(value * 100 + 0.5e0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
paths AS (
  SELECT p.event_id AS pid, p.cents, t.event_type, t.ts AS tts,
         t.event_id AS tid,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY t.ts, t.event_id)      AS rk,
         COUNT(*)    OVER (PARTITION BY p.event_id)         AS n
  FROM purchases p
  JOIN touches t
    ON t.user_id = p.user_id
   AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.event_id))
   AND date_diff('second', t.ts, p.ts) <= {_ATTR_WINDOW_S}
),
credits AS (
  SELECT event_type AS channel,
         CAST(FLOOR((cents * (
           CASE WHEN n = 1 THEN 1.0
                WHEN n = 2 THEN 0.5
                WHEN rk = 1 OR rk = n THEN 0.4
                ELSE 0.2 / (n - 2) END)) * 1e4 + 0.5) / 1e4 AS DECIMAL(24,4)) AS credit
  FROM paths
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_credits,
       FLOOR((CAST(SUM(credit) AS DOUBLE) / 100) * 1e4 + 0.5) / 1e4 AS attributed_revenue
FROM credits GROUP BY channel
"""


@register(
    "q_attribution_position_based",
    oracle=_QUPOS_ORACLE,
    description=(
        "position-based (U-shaped) attribution: each purchase's 7-day "
        "touch path credits 40% to the first touch, 40% to the last, "
        "20% split across the middle (100%/50-50 for 1-2 touch paths); "
        "user-keyed bounded range join + one per-purchase rank window, "
        "DECIMAL-quantized fractional cents"
    ),
    tags=("timeseries", "attribution", "window", "join", "analytics"),
)
def q_attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    touches = e.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("ts").alias("tts"),
        F.col("event_id").alias("tid"),
        "event_type",
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    # User-keyed equi join with the time predicates as join residuals:
    # one shuffle on user_id; the per-user fan-out is bounded by the
    # lookback (at 100 TB, salt hot users or bin by day like
    # q_join_range_binned if a single user's history outgrows a task).
    before = (F.col("tts") < F.col("pts")) | (
        (F.col("tts") == F.col("pts")) & (F.col("tid") < F.col("pid"))
    )
    in_window = (
        F.unix_timestamp("pts") - F.unix_timestamp("tts")
    ) <= _ATTR_WINDOW_S
    paths = touches.join(purchases, "user_id").filter(before & in_window)
    wrank = Window.partitionBy("pid").orderBy("tts", "tid")
    wall = Window.partitionBy("pid")
    ranked = paths.select(
        "pid",
        "cents",
        "event_type",
        F.row_number().over(wrank).alias("rk"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    weight = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("rk") == 1) | (F.col("rk") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    credits = ranked.select(
        F.col("event_type").alias("channel"),
        (F.floor((F.col("cents") * weight) * 1e4 + 0.5) / 1e4)
        .cast("decimal(24,4)")
        .alias("credit"),
    )
    return credits.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_credits"),
        (F.floor((F.sum("credit").cast("double") / 100) * 1e4 + 0.5) / 1e4).alias(
            "attributed_revenue"
        ),
    )
