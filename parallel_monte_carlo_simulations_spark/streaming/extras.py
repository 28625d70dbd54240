"""Streaming extras: stream-static join and streaming deduplication.

Both run as real availableNow micro-batch jobs and are held to batch
oracles — the stream-static join enriches each micro-batch against a
static dimension (broadcast per batch; the standard streaming-enrichment
topology), and dropDuplicates demonstrates streaming exact-dedup state.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .confscope import state_partitions_scope
from ..tables import table
from .runtime import read_events_stream


def _run_to_memory(stream_df: DataFrame, spark: SparkSession, output_mode: str) -> DataFrame:
    sink = f"mem_x_{uuid.uuid4().hex[:12]}"
    with state_partitions_scope(spark), tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(sink)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


_QSTATIC_ORACLE = """
SELECT n_name       AS user_nation,
       event_type,
       COUNT(*)     AS n_events
FROM events
JOIN nation ON CAST(user_id % 25 AS INTEGER) = n_nationkey
GROUP BY user_nation, event_type
"""


@register(
    "q_stream_static_join",
    oracle=_QSTATIC_ORACLE,
    description="stream-static dimension join (enrichment topology) == batch",
    tags=("streaming", "join"),
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir)
    nation = table(spark, sf_dir, "nation")  # static side, broadcast per batch
    enriched = stream.withColumn(
        "nk", (F.col("user_id") % 25).cast("int")
    ).join(F.broadcast(nation), F.col("nk") == nation.n_nationkey)
    agg = enriched.groupBy(
        F.col("n_name").alias("user_nation"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return _run_to_memory(agg, spark, "complete")


_QSDEDUP_ORACLE = """
SELECT user_id, event_type, COUNT(*) AS n_first_events
FROM (
  SELECT DISTINCT ON (user_id, event_type) user_id, event_type
  FROM events
)
GROUP BY user_id, event_type
"""


@register(
    "q_stream_dedup",
    oracle=_QSDEDUP_ORACLE,
    description="streaming dropDuplicates state == batch DISTINCT",
    tags=("streaming", "dedup"),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir)
    deduped = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    out = _run_to_memory(deduped, spark, "append")
    return out.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_first_events")
    )


_QSDEDUPWM_ORACLE = """
SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM events
GROUP BY user_id
"""


@register(
    "q_stream_dedup_within_watermark",
    oracle=_QSDEDUPWM_ORACLE,
    description=(
        "bounded-state streaming dedup: dropDuplicatesWithinWatermark "
        "per (user_id, event_type) under an event-time watermark — the "
        "production form whose per-key state is EVICTED once the "
        "watermark passes, unlike plain dropDuplicates whose state "
        "grows forever; with the delay covering the corpus span the "
        "result equals batch DISTINCT, which is what the oracle pins"
    ),
    tags=("streaming", "dedup", "watermark", "state", "scale"),
)
def q_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At 100 TB the difference between this and `q_stream_dedup` is
    the difference between a state store bounded by the watermark
    horizon and one that must hold every key ever seen. The oracle
    equivalence (== DISTINCT) holds because the configured delay spans
    the whole corpus, so no state evicts before end-of-input; the
    semantics under eviction (late duplicates re-admitted) are the
    documented trade-off that makes the state bounded."""
    stream = read_events_stream(spark, sf_dir)
    deduped = (
        stream.select("user_id", "event_type", "ts")
        .withWatermark("ts", "2400 hours")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    out = _run_to_memory(deduped, spark, "append")
    return out.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_types")
    )
