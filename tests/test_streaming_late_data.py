"""Watermark late-data semantics: events that arrive after the watermark
has passed their window are DROPPED from the aggregate.

Three parquet files processed as separate micro-batches
(maxFilesPerTrigger=1). The watermark in effect during batch N derives
from data up to batch N-1 (one-batch propagation lag), so the late file
is delivered two batches after the watermark-advancing data:

  batch 0: on-time events at 00:00 and 06:00  (wm after: 05:50)
  batch 1: on-time event at 12:00             (wm after: 11:50)
  batch 2: LATE event at 00:02 — wm in effect is 11:50 -> dropped
"""

from __future__ import annotations

import datetime
import os
import tempfile
import time
import uuid

from pyspark.sql import functions as F


def test_late_event_dropped_by_watermark(spark):
    tmp = tempfile.mkdtemp(prefix="late_src_")
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    hours = datetime.timedelta(hours=1)

    def write_file(name, rows):
        spark.createDataFrame(rows, "ts timestamp, k string").coalesce(1).write.parquet(
            os.path.join(tmp, name)
        )
        time.sleep(1.1)  # distinct mtimes => deterministic batch order

    write_file("f1", [(t0, "a"), (t0 + 6 * hours, "a")])
    write_file("f2", [(t0 + 12 * hours, "a")])
    write_file("f3", [(t0 + datetime.timedelta(minutes=2), "a")])  # late

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(tmp, "*"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "k", "n")
    )
    sink = f"mem_late_{uuid.uuid4().hex[:10]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dropped = sum(
            p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
        )
    assert dropped == 1, f"expected exactly the late row dropped, got {dropped}"
    rows = {(r.ws, r.k): r.n for r in spark.table(sink).collect()}
    # 00:00 window finalized WITHOUT the late event
    assert rows.get((t0, "a")) == 1, rows
    assert rows.get((t0 + 6 * hours, "a")) == 1, rows
