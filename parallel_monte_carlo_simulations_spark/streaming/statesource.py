"""State-store data source (Spark 4): streaming state read back as a
table — the ops/debugging primitive for stateful pipelines.

At production scale, "what is the job's state RIGHT NOW" is a real
operational question (skewed keys, state bloat, wrong watermark). Spark
4's ``statestore`` batch source reads a streaming checkpoint's state
files directly: one row per state key with the aggregator's internal
value struct. This query:

1. runs a REAL micro-batch aggregation (update mode, availableNow) over
   the events source to a checkpoint,
2. reads the final state back via ``spark.read.format("statestore")``,
3. flattens the (key struct, value struct) rows to atomic columns.

Because availableNow drains the whole source, the final state must
EQUAL the batch aggregate — so the state read is held to the same
DuckDB oracle as any batch groupBy, proving the state round-trip, not
just that the API runs. The flattened frame is eagerly materialized
(localCheckpoint) so the temporary checkpoint directory can be removed
before returning.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .confscope import state_partitions_scope
from .runtime import read_events_stream

_QSTATESTORE_ORACLE = """
SELECT user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
WHERE user_id < 40
GROUP BY user_id, event_type
"""


@register(
    "q_stream_statestore_read",
    oracle=_QSTATESTORE_ORACLE,
    description=(
        "Spark 4 statestore data source: run a real update-mode "
        "availableNow aggregation, then read the checkpoint's state "
        "files back as a table — flattened state == batch aggregate, "
        "proving the state round-trip"
    ),
    tags=("streaming", "statestore", "state", "introspection", "source"),
)
def q_stream_statestore_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.filter(F.col("user_id") < 40)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    ckpt = tempfile.mkdtemp(prefix="pmcs_statestore_")
    sink = f"mem_{uuid.uuid4().hex[:12]}"
    try:
        with state_partitions_scope(spark):
            q = (
                agg.writeStream.format("memory")
                .queryName(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        state = spark.read.format("statestore").load(ckpt)
        flat = state.select(
            F.col("key.user_id").alias("user_id"),
            F.col("key.event_type").alias("event_type"),
            F.col("value.count").cast("long").alias("n_events"),
        )
        # Materialize off the checkpoint files before they are removed.
        return flat.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


# ---------------------------------------------------------------------------
# State CHANGE FEED: the per-micro-batch evolution of streaming state.
# ---------------------------------------------------------------------------

_QSTATE_CDC_ORACLE = """
WITH ev AS (
  SELECT event_id % 4 AS b, user_id, event_type
  FROM events WHERE user_id < 40
),
cum AS (
  SELECT bb.b AS batch_id, e.user_id, e.event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM (SELECT DISTINCT b FROM ev) bb
  JOIN ev e ON e.b <= bb.b
  GROUP BY bb.b, e.user_id, e.event_type
),
present AS (SELECT DISTINCT b, user_id, event_type FROM ev)
SELECT CAST(c.batch_id AS BIGINT) AS batch_id,
       c.user_id, c.event_type, c.n_events
FROM cum c
JOIN present p
  ON p.b = c.batch_id AND p.user_id = c.user_id
 AND p.event_type = c.event_type
"""


@register(
    "q_stream_statestore_changefeed",
    oracle=_QSTATE_CDC_ORACLE,
    description=(
        "statestore CHANGE FEED: 4 real micro-batches "
        "(data-derived event_id % 4 file split, modtime-ordered pickup), "
        "then read the per-batch state updates back — each batch's "
        "update rows == SQL-reconstructed cumulative counts for the "
        "keys that batch touched"
    ),
    tags=("streaming", "statestore", "cdc", "state", "introspection"),
)
def q_stream_statestore_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State evolution as data: with ``readChangeFeed`` the statestore
    source emits one row per (micro-batch, key) state WRITE. The batch
    membership is derived from the DATA (event_id % 4) and the file
    pickup order pinned via mtime, so DuckDB can replay the exact same
    4-batch schedule: an update row exists for (b, key) iff the key had
    an event in batch b, with the cumulative count over batches <= b.
    This is the state-audit trail a production pipeline keeps for
    debugging watermark/skew incidents — proven equal to its relational
    reconstruction.
    """
    import glob
    import os

    from ..tables import table

    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    src_dir = tempfile.mkdtemp(prefix="pmcs_cdc_src_")
    ckpt = tempfile.mkdtemp(prefix="pmcs_cdc_ckpt_")
    try:
        # One file per data-derived batch, mtime ascending so the file
        # stream (maxFilesPerTrigger=1) picks them up as batches 0..3.
        for b in range(4):
            sub = os.path.join(src_dir, f"_stage{b}")
            (
                ev.filter(F.col("event_id") % 4 == b)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(sub)
            )
            part = glob.glob(os.path.join(sub, "part-*.parquet"))[0]
            dst = os.path.join(src_dir, f"batch{b}.parquet")
            os.replace(part, dst)
            os.utime(dst, (1_700_000_000 + b * 60, 1_700_000_000 + b * 60))
        for b in range(4):
            shutil.rmtree(os.path.join(src_dir, f"_stage{b}"), ignore_errors=True)

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        agg = stream.groupBy("user_id", "event_type").agg(
            F.count("*").alias("n_events")
        )
        sink = f"mem_{uuid.uuid4().hex[:12]}"
        with state_partitions_scope(spark):
            q = (
                agg.writeStream.format("memory")
                .queryName(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        feed = (
            spark.read.format("statestore")
            .option("readChangeFeed", "true")
            .option("changeStartBatchId", 0)
            .load(ckpt)
        )
        flat = feed.select(
            F.col("batch_id").cast("long").alias("batch_id"),
            F.col("key.user_id").alias("user_id"),
            F.col("key.event_type").alias("event_type"),
            F.col("value.count").cast("long").alias("n_events"),
        )
        return flat.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(src_dir, ignore_errors=True)
