"""Custom STREAMING Python DataSource (Spark 4 ``simpleStreamReader``).

The streaming half of :mod:`.pysource`: a pure-Python class is the
stream — ``initialOffset``/``read(start)`` advance a self-describing
offset (a dict checkpointed by the engine), and Structured Streaming
gives the connector exactly-once semantics for free: offsets commit to
the checkpoint, a crashed batch replays via ``readBetweenOffsets``, and
the memory-sink row set is exactly the closed-form domain — no dupes, no
gaps — which is precisely what the oracle asserts. This is the
extensibility story for queue-like feeds with no file representation
(REST pagination cursors, change feeds): ~25 lines of Python, engine
semantics unchanged.

The source is FINITE (20 000 closed-form rows in 6 000-row chunks → 4
micro-batches, then empty batches); the query drains it under a
processing-time trigger and polls the sink until the domain is complete,
then aggregates per station. Readings are carried as integer tenths so
the per-station sums are exact and order-independent; DuckDB replays the
same closed form from ``range()`` — the same discipline as the batch
Python source and the codec oracles.
"""

from __future__ import annotations

import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from ..registry import register

N_TOTAL = 20_000
CHUNK = 6_000
N_STATIONS = 7


def _row(i: int):
    return (i, i % N_STATIONS, (i * i) % 1000)


class TickStreamReader(SimpleDataSourceStreamReader):
    """Offset = next row index; finite: empty batches past N_TOTAL."""

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        lo = start["i"]
        hi = min(lo + CHUNK, N_TOTAL)
        return (iter([_row(i) for i in range(lo, hi)]), {"i": hi})

    def readBetweenOffsets(self, start, end):
        return iter([_row(i) for i in range(start["i"], end["i"])])


class TickStreamSource(DataSource):
    @classmethod
    def name(cls):
        return "tickstream"

    def schema(self):
        return "seq bigint, station int, reading_x10 bigint"

    def simpleStreamReader(self, schema):
        return TickStreamReader()


_QPYSTREAM_ORACLE = f"""
WITH src AS (
  SELECT i AS seq,
         CAST(i % {N_STATIONS} AS INTEGER) AS station,
         (i * i) % 1000 AS reading_x10
  FROM range(0, {N_TOTAL}) t(i)
)
SELECT station,
       CAST(COUNT(*) AS BIGINT) AS n_ticks,
       CAST(COUNT(DISTINCT seq) AS BIGINT) AS n_distinct_seq,
       CAST(SUM(reading_x10) AS BIGINT) / 10.0e0 AS sum_reading,
       CAST(MIN(seq) AS BIGINT) AS min_seq,
       CAST(MAX(seq) AS BIGINT) AS max_seq
FROM src GROUP BY station ORDER BY station
"""


@register(
    "q_source_python_stream",
    oracle=_QPYSTREAM_ORACLE,
    description=(
        "custom streaming Python DataSource (simpleStreamReader, dict "
        "offsets, 4 micro-batches drained exactly-once); per-station "
        "aggregate equals the closed-form oracle"
    ),
    tags=("source", "streaming", "python-datasource", "exactly-once"),
)
def q_source_python_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.dataSource.register(TickStreamSource)
    sink = f"pystream_{uuid.uuid4().hex[:12]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            spark.readStream.format("tickstream")
            .load()
            .writeStream.format("memory")
            .queryName(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + 180
            while time.time() < deadline:
                n = spark.sql(f"SELECT COUNT(*) AS n FROM {sink}").first()["n"]
                if n >= N_TOTAL:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
            q.awaitTermination(60)
    return (
        spark.table(sink)
        .groupBy("station")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ticks"),
            F.countDistinct("seq").cast("long").alias("n_distinct_seq"),
            (F.sum("reading_x10").cast("long") / F.lit(10.0)).alias(
                "sum_reading"
            ),
            F.min("seq").cast("long").alias("min_seq"),
            F.max("seq").cast("long").alias("max_seq"),
        )
        .orderBy("station")
    )
