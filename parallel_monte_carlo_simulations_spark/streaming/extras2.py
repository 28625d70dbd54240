"""Streaming extras, round 10: per-window top-k over a real stream.

The leaderboard topology every metrics pipeline runs: a streaming
tumbling-window aggregation (stateful, watermark-bounded) feeds a
BATCH rank over the completed windows — ranking is not a streaming
operator (it would need the whole window's final counts), so the
correct decomposition is stream-aggregate -> sink -> rank, which is
exactly what this query executes: availableNow micro-batches into a
memory sink, then one rank window over the window-complete sink table.
At scale the sink is the per-(window, type) aggregate — span-sized,
never event-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from .extras import _run_to_memory
from .runtime import read_events_stream

_TOPK = 2

_QTOPK_ORACLE = f"""
WITH agg AS (
  SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)),
                  '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT window_start, event_type, n_events,
         ROW_NUMBER() OVER (PARTITION BY window_start
                            ORDER BY n_events DESC, event_type) AS rk
  FROM agg
)
SELECT window_start, event_type, n_events, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= {_TOPK}
"""


@register(
    "q_stream_windowed_topk",
    oracle=_QTOPK_ORACLE,
    description=(
        f"streaming per-window top-{_TOPK}: real availableNow tumbling "
        "1h window x event_type aggregation into a sink, then a batch "
        "rank over the completed windows — the stream-aggregate-then-"
        "rank decomposition (rank itself is not a streaming operator)"
    ),
    tags=("streaming", "window", "topk", "rank"),
)
def q_stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )
    # Complete-mode sink (the house streaming-parity convention,
    # runtime.run_streaming_tumbling): append mode would withhold the
    # final ~watermark's worth of windows, which never finalize on a
    # finite availableNow run. Unbounded production runs use append +
    # watermark eviction; the parity proof needs every window emitted.
    sink = _run_to_memory(agg, spark, "complete")
    rk = F.row_number().over(
        Window.partitionBy("window_start").orderBy(
            F.desc("n_events"), F.asc("event_type")
        )
    )
    return (
        sink.withColumn("rk", rk)
        .filter(F.col("rk") <= _TOPK)
        .select("window_start", "event_type", "n_events", "rk")
    )
