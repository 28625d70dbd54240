"""Stream-stream join and foreachBatch sink — the remaining Structured
Streaming surface.

The stream-stream inner join is the real watermarked topology: both
sides buffer state bounded by their watermark plus the join's time
range; the range condition lets Spark evict view-side state older than
``purchase.ts - 30 min``. Run availableNow against the static events
file, the result must equal the batch range join — the oracle."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .confscope import state_partitions_scope
from .runtime import read_events_stream

_QSSJOIN_ORACLE = """
SELECT
  p.event_id AS purchase_id,
  v.event_id AS view_id,
  p.user_id  AS user_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id
 AND p.ts > v.ts
 AND p.ts <= v.ts + INTERVAL 30 MINUTE
"""


@register(
    "q_stream_stream_join",
    oracle=_QSSJOIN_ORACLE,
    description="watermarked stream-stream range join == batch range join",
    tags=("streaming", "join", "stream_stream"),
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    views = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        F.expr(
            """
            p_user = v_user
            AND p_ts > v_ts
            AND p_ts <= v_ts + INTERVAL 30 MINUTES
            """
        ),
    ).select("purchase_id", "view_id", F.col("p_user").alias("user_id"))

    sink = f"mem_ss_{uuid.uuid4().hex[:12]}"
    with state_partitions_scope(spark), tempfile.TemporaryDirectory() as ckpt:
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


_QFEB_ORACLE = """
SELECT event_type,
       COUNT(*)             AS n_events,
       FLOOR((CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)) * 1e2 + 0.5) / 1e2
                            AS total_value
FROM events
WHERE value > 50
GROUP BY event_type
"""


@register(
    "q_stream_foreach_batch",
    oracle=_QFEB_ORACLE,
    description="foreachBatch custom sink (parquet append per micro-batch)",
    tags=("streaming", "foreachBatch", "sink"),
)
def q_stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch is the escape hatch for sinks Structured Streaming
    lacks natively (JDBC upserts, multi-table writes). Here each
    micro-batch appends filtered rows to a parquet dir; the final
    read-back aggregate must equal the batch oracle."""
    out_dir = tempfile.mkdtemp(prefix="pmcs_feb_")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.filter(F.col("value") > 50)
            .select("event_id", "event_type", "value")
            .write.mode("append")
            .parquet(out_dir)
        )

    stream = read_events_stream(spark, sf_dir)
    with state_partitions_scope(spark), tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    back = spark.read.parquet(out_dir)
    # element-wise decimal quantization before the sum: exact and
    # order-independent (r12 float discipline, see streaming/windows.py)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.floor((F.sum(F.col("value").cast("decimal(18,6)")).cast("double")) * 1e2 + 0.5) / 1e2).alias("total_value"),
    )


_QSSOUTER_ORACLE = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM events
  WHERE event_type = 'purchase'
    AND ts <= (SELECT max(ts) FROM events) - INTERVAL 90 MINUTE
),
v AS (
  SELECT event_id AS view_id, user_id, ts AS v_ts FROM events
  WHERE event_type = 'view'
)
SELECT p.purchase_id, p.user_id, v.view_id
FROM p LEFT JOIN v
  ON p.user_id = v.user_id
 AND p.p_ts > v.v_ts
 AND p.p_ts <= v.v_ts + INTERVAL 30 MINUTE
"""


@register(
    "q_stream_stream_outer_join",
    oracle=_QSSOUTER_ORACLE,
    description=(
        "watermarked stream-stream LEFT OUTER join: unmatched purchases "
        "emit only after the watermark passes their join window (state "
        "eviction), compared against the batch left join"
    ),
    tags=("streaming", "join", "stream_stream", "outer", "watermark"),
)
def q_stream_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OUTER variant is the semantically hard one: an unmatched left
    row may only be emitted once the watermark proves no matching right
    row can still arrive, so correctness depends on state-eviction
    timing, not just the join predicate. Real Structured Streaming
    gotcha handled here: rows inside the final ``watermark + band``
    window are never flushed before an availableNow query stops
    (measured: 4 of 1961 unmatched purchases withheld at sf0.01), so
    BOTH the streaming result and the batch oracle cut purchases at
    ``max(ts) - 90 minutes`` — the comparison covers exactly the rows
    the watermark has adjudicated."""
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    views = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        F.expr(
            """
            p_user = v_user
            AND p_ts > v_ts
            AND p_ts <= v_ts + INTERVAL 30 MINUTES
            """
        ),
        "left_outer",
    ).select("purchase_id", F.col("p_user").alias("user_id"), "view_id", "p_ts")

    sink = f"mem_sso_{uuid.uuid4().hex[:12]}"
    with state_partitions_scope(spark), tempfile.TemporaryDirectory() as ckpt:
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    from ..tables import table as _table

    cutoff = _table(spark, sf_dir, "events").agg(
        (F.max("ts") - F.expr("INTERVAL 90 MINUTES")).alias("cutoff_ts")
    )
    return (
        spark.table(sink)
        .crossJoin(F.broadcast(cutoff))
        .filter(F.col("p_ts") <= F.col("cutoff_ts"))
        .drop("p_ts", "cutoff_ts")
    )
