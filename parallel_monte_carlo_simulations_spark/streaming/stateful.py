"""Custom stateful streaming operator: ``applyInPandasWithState``.

Per-user running aggregates maintained in explicit group state across
micro-batches — the Structured Streaming API for operators the built-in
windows can't express (custom sessionization, CEP, online counters).

Run under ``availableNow`` + update mode, the final emitted state per
user must equal a plain batch groupBy over the same events — which is
exactly what the DuckDB oracle checks. At scale the state store shards by
the grouping key across executors (RocksDB-backed in production), so
state size is bounded per key, not per stream.

Spark 4's successor API (``transformWithStateInPandas``, typed state
variables + timers) was evaluated and is unusable in this container:
its state-server protocol module
(``pyspark.sql.streaming.proto.StateMessage_pb2``) is protobuf-generated
code whose first import is ``from google.protobuf import descriptor``,
and google.protobuf is not installed (installs disallowed). The exact
blocker is PINNED by
tests/test_state_backend.py::test_transform_with_state_blocker_still_pinned —
if the sandbox ever gains protobuf that test fails loudly, which is the
signal to register a real ``q_stream_tws_*`` query. The v1 API below
covers the custom-stateful surface meanwhile.
"""

from __future__ import annotations

import tempfile
import uuid

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import register
from .confscope import state_partitions_scope
from .runtime import read_events_stream

_OUT_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total_cents long"


def _update_user_state(key, pdfs, state: GroupState):
    """Accumulate (count, value-sum) per user across micro-batches.

    The running sum is kept in EXACT integer cents (values are 2-decimal
    by construction; each element x100 rounds to an exact int), so the
    state is order-independent across micro-batch arrival orders and
    matches the oracle's decimal sum bit-for-bit — float accumulation
    here is the same scale-dependent rounding-flip class the r12 sf0.1
    sweep caught in the sliding window."""
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(pdf["value"].mul(100).round().sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [cents / 100.0],
        }
    )


_QSTATE_ORACLE = """
SELECT user_id,
       COUNT(*)             AS n_events,
       FLOOR((CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)) * 1e2 + 0.5) / 1e2
                            AS total_value
FROM events
GROUP BY user_id
"""


@register(
    "q_stream_stateful_counts",
    oracle=_QSTATE_ORACLE,
    description="applyInPandasWithState running per-user aggregates == batch groupBy",
    tags=("streaming", "stateful", "applyInPandasWithState"),
)
def q_stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir).select("user_id", "value")
    stateful = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = f"mem_state_{uuid.uuid4().hex[:12]}"
    with state_partitions_scope(spark), tempfile.TemporaryDirectory() as ckpt:
        q = (
            stateful.writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # update mode can emit a user once per micro-batch that touched it;
    # the final state is the emission with the largest (cumulative,
    # strictly increasing) n_events — max_by picks its value column.
    out = spark.table(sink)
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        (F.floor((F.max_by("total_value", "n_events")) * 1e2 + 0.5) / 1e2).alias("total_value"),
    )
