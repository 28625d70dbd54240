"""Scoped shuffle-partition override for micro-batch streaming jobs.

Stateful streaming operators (stream-stream joins, streaming aggs,
dropDuplicates, applyInPandasWithState) create ONE state-store instance
per shuffle partition, and the count is frozen into the checkpoint at
first run. On a default session that is 200 state stores for kilobytes
of state — measured 27 s vs 2.4 s for the stream-stream join at sf0.01
on local[8], pure per-store open/commit overhead.

Every registered streaming query starts a FRESH checkpoint per call, so
scoping ``spark.sql.shuffle.partitions`` to cluster parallelism for the
duration of the run is safe and self-contained: the conf is restored in
``finally`` (the bench_skew pattern — unlike a leaked setting, a scoped
override leaves the shared session exactly as found). On a real cluster
``defaultParallelism`` tracks executor count, which is the right
state-store granularity there too; a 100 TB deployment with huge state
would instead pin ``spark.sql.streaming.stateStore`` partitioning
explicitly per job.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

_KEY = "spark.sql.shuffle.partitions"


@contextmanager
def state_partitions_scope(spark: SparkSession) -> Iterator[None]:
    prev = spark.conf.get(_KEY)
    spark.conf.set(_KEY, str(spark.sparkContext.defaultParallelism))
    try:
        yield
    finally:
        spark.conf.set(_KEY, prev)
