"""Conversion latency: exact time-to-convert percentiles per funnel leg.

The follow-on question after the funnel stage counts
(``timeseries.q_funnel_stages``): for users who DID convert, how long
did it take? Per user: first 'view' timestamp, then the first
'purchase' AFTER it; the latency distribution is summarized with exact
(type-1, ordered-selection) percentiles — the same discipline as the
engine's other exact-percentile queries, so the numbers are
reproducible, not interpolation-dependent.

Exactness: latencies are integer SECONDS (epoch difference — both
engines compute the identical integer); p50/p90 select the ceil(p*n)-th
ordered value via row_number, integers end to end.

Scale: two min-aggregations per user (map-side combinable) and one
ordered selection over the CONVERTED-USER summary table (one row per
converting user, not per event) — the percentile sort runs on users,
never events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QCONVERT_ORACLE = """
WITH first_view AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
conv AS (
  SELECT f.user_id,
         CAST(date_diff('second', f.v_ts, MIN(e.ts)) AS BIGINT) AS lat_s
  FROM first_view f
  JOIN events e ON e.user_id = f.user_id
   AND e.event_type = 'purchase' AND e.ts > f.v_ts
  GROUP BY f.user_id, f.v_ts
),
ranked AS (
  SELECT lat_s,
         ROW_NUMBER() OVER (ORDER BY lat_s, user_id) AS rn,
         COUNT(*) OVER () AS n
  FROM conv
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM conv) AS n_converted,
       (SELECT CAST(MIN(lat_s) AS BIGINT) FROM conv) AS min_s,
       (SELECT CAST(lat_s AS BIGINT) FROM ranked
        WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT) LIMIT 1) AS p50_s,
       (SELECT CAST(lat_s AS BIGINT) FROM ranked
        WHERE rn = CAST(CEIL(0.9 * n) AS BIGINT) LIMIT 1) AS p90_s,
       (SELECT CAST(MAX(lat_s) AS BIGINT) FROM conv) AS max_s
"""


@register(
    "q_funnel_time_to_convert",
    oracle=_QCONVERT_ORACLE,
    description=(
        "conversion latency: first view -> first subsequent purchase "
        "per user, integer-second latencies, exact type-1 p50/p90 via "
        "ordered selection over the converted-user table (users, not "
        "events, feed the percentile sort)"
    ),
    tags=("timeseries", "funnel", "conversion", "percentile", "window"),
)
def q_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    first_view = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    conv = (
        first_view.join(
            e.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("p_ts")
            ),
            "user_id",
        )
        .filter(F.col("p_ts") > F.col("v_ts"))
        .groupBy("user_id", "v_ts")
        .agg(F.min("p_ts").alias("p_ts"))
        .select(
            "user_id",
            (
                F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")
            ).cast("long").alias("lat_s"),
        )
    )
    # percentile selection ranks via the range-bucketed kernel
    # (round 11): no global-sort window over the converted-user table;
    # n is a broadcast scalar, not a whole-frame window.
    from .rankstats import bucketed_running

    nconv = conv.agg(F.count("*").cast("long").alias("n"))
    ranked = bucketed_running(
        conv,
        axis="lat_s",
        order=[F.col("lat_s").asc(), F.col("user_id").asc()],
        cums={"rn": F.lit(1)},
    ).crossJoin(F.broadcast(nconv))
    stats = conv.agg(
        F.count("*").cast("long").alias("n_converted"),
        F.min("lat_s").cast("long").alias("min_s"),
        F.max("lat_s").cast("long").alias("max_s"),
    )
    p50 = ranked.filter(
        F.col("rn") == F.ceil(F.lit(0.5) * F.col("n")).cast("long")
    ).select(F.col("lat_s").cast("long").alias("p50_s"))
    p90 = ranked.filter(
        F.col("rn") == F.ceil(F.lit(0.9) * F.col("n")).cast("long")
    ).select(F.col("lat_s").cast("long").alias("p90_s"))
    return (
        stats.crossJoin(F.broadcast(p50))
        .crossJoin(F.broadcast(p90))
        .select("n_converted", "min_s", "p50_s", "p90_s", "max_s")
    )
