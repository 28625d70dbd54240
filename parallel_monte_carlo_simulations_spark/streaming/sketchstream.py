"""Streaming count-min sketch — associative merge across micro-batches.

The production deployment shape for the CMS in ``operators/sketches``:
each micro-batch builds its own partial D×W grid (a few thousand rows)
and appends it via ``foreachBatch``; merging is a cell-wise SUM. Because
the grid is associative and commutative, the merged sketch — and every
estimate read from it — is IDENTICAL to the one built in a single batch
pass, which is exactly what this query proves: it streams the events in
four forced micro-batches (the input is re-sharded into four files,
``maxFilesPerTrigger=1``) and must hash-match the same DuckDB oracle as
the batch query. This merge-equivalence is what makes the sketch a
bounded-state streaming aggregate: state is D×W cells forever, not
per-key.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import _CMS_ORACLE, build_sketch, estimates_top_n
from ..registry import register
from ..tables import table
from .confscope import state_partitions_scope

N_SHARDS = 4


@register(
    "q_stream_cms_merge",
    oracle=_CMS_ORACLE,
    description=(
        "count-min sketch built per micro-batch (4 forced batches via "
        "maxFilesPerTrigger=1) and merged cell-wise; estimates equal the "
        "single-pass batch sketch"
    ),
    tags=("streaming", "sketch", "count-min", "foreachBatch", "merge"),
)
def q_stream_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Re-shard the events into N files (executor-side write) so the file
    # stream source actually produces N micro-batches.
    src_dir = tempfile.mkdtemp(prefix="pmcs_cms_src_")
    sketch_dir = tempfile.mkdtemp(prefix="pmcs_cms_parts_")
    ev = table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("key_s")
    )
    ev.repartition(N_SHARDS).write.mode("overwrite").parquet(src_dir)

    def append_partial_sketch(batch_df: DataFrame, batch_id: int) -> None:
        build_sketch(batch_df).write.mode("append").parquet(sketch_dir)

    stream = (
        spark.readStream.schema("key_s string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    with state_partitions_scope(spark), tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.foreachBatch(append_partial_sketch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    merged = (
        spark.read.parquet(sketch_dir)
        .groupBy("row_i", "pos")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return estimates_top_n(spark, sf_dir, merged)
