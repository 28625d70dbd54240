"""Bitemporal AS OF query (SQL:2011 temporal semantics) over an
append-only correction log.

A bitemporal record carries TWO times: when the fact became true in the
world (valid time) and when the warehouse learned it (transaction
time). The canonical query — "what did we believe on T the value
effective at V was?" — is a two-dimensional as-of: among records with
``tx_time <= T`` (known by then) and ``valid_from <= V`` (effective by
then), take the one with the greatest valid_from, breaking ties by the
latest transaction time (the most recent correction wins).

The log is derived from events: each event is a correction whose
transaction time is ``ts`` and whose effective date is backdated by
``k % 7`` days (the JSON props field) — late-arriving corrections, the
exact thing bitemporality exists for. The query is one filtered
ROW_NUMBER over (user) ordered by (valid_from DESC, tx DESC, event_id)
— a single window pass, no self-join; everything is exact
integer/timestamp comparison.

Scale: the window partitions by the entity key — embarrassingly
parallel; the two as-of predicates push down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: The observation point: transaction-time T and valid-time V.
TX_AS_OF = "2024-01-20 00:00:00"
VALID_AS_OF = "2024-01-15"

_QBITEMP_ORACLE = f"""
WITH log AS (
  SELECT user_id,
         event_id,
         ts AS tx_time,
         CAST(ts AS DATE)
           - TO_DAYS(CAST(json_extract(props, '$.k') AS INTEGER) % 7)
           AS valid_from,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS value_cents
  FROM events
),
visible AS (
  SELECT user_id, event_id, tx_time, valid_from, value_cents,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY valid_from DESC, tx_time DESC, event_id)
           AS rk,
         CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_known
  FROM log
  WHERE tx_time <= TIMESTAMP '{TX_AS_OF}'
    AND valid_from <= DATE '{VALID_AS_OF}'
)
SELECT user_id,
       strftime(valid_from, '%Y-%m-%d') AS valid_from,
       strftime(tx_time, '%Y-%m-%d %H:%M:%S') AS tx_time,
       value_cents,
       n_known
FROM visible
WHERE rk = 1
ORDER BY user_id
"""


@register(
    "q_bitemporal_asof",
    oracle=_QBITEMP_ORACLE,
    description=(
        "bitemporal AS OF query: value effective at valid-time V as "
        "known at transaction-time T, from a backdated correction log — "
        "one ROW_NUMBER pass, no self-join"
    ),
    tags=("bitemporal", "temporal", "asof", "window", "warehouse"),
)
def q_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    log = e.select(
        "user_id",
        "event_id",
        F.col("ts").alias("tx_time"),
        F.date_sub(
            F.col("ts").cast("date"),
            (
                F.get_json_object(F.col("props"), "$.k").cast("int") % 7
            ),
        ).alias("valid_from"),
        F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
    )
    visible = log.where(
        (F.col("tx_time") <= F.lit(TX_AS_OF).cast("timestamp"))
        & (F.col("valid_from") <= F.lit(VALID_AS_OF).cast("date"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("valid_from"), F.desc("tx_time"), F.col("event_id")
    )
    wc = Window.partitionBy("user_id")
    return (
        visible.select(
            "user_id",
            "event_id",
            "tx_time",
            "valid_from",
            "value_cents",
            F.row_number().over(w).alias("rk"),
            F.count("*").over(wc).alias("n_known"),
        )
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
            F.date_format("tx_time", "yyyy-MM-dd HH:mm:ss").alias("tx_time"),
            "value_cents",
            "n_known",
        )
        .orderBy("user_id")
    )
