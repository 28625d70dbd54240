"""Warehouse mutation shapes: MERGE-style upsert expressed relationally.

Spark's MERGE INTO statement needs a transactional table format (Delta /
Iceberg), which this container ships without — but the MERGE *semantics*
(update matched rows, insert unmatched source rows, keep untouched
target rows) are a join topology, and that is what an engine must get
right. The upsert here is the standard full-outer-join formulation; the
DuckDB oracle replays identical semantics in SQL, so the three-way row
disposition (updated / inserted / carried) is hash-verified.

Scale notes (100 TB): the merge shuffles both sides once on the join
key — exactly what a format-native MERGE does under the hood (minus
file-level pruning, which the table format adds on top). The source
(changeset) side is usually small; AQE broadcasts it when it is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QMERGE_ORACLE = """
WITH updates AS (
  SELECT o_orderkey AS k,
         CAST(FLOOR((CAST(o_totalprice * 1.1 AS DECIMAL(18,4))) * 1e2 + 0.5) / 1e2 AS DOUBLE)
           AS src_price,
         NULL AS src_status
  FROM orders WHERE o_orderkey % 10 = 0
),
inserts AS (
  SELECT o_orderkey + 100000000 AS k,
         o_totalprice AS src_price,
         'N' AS src_status
  FROM orders WHERE o_orderkey % 97 = 0
),
src AS (SELECT * FROM updates UNION ALL SELECT * FROM inserts),
merged AS (
  SELECT
    COALESCE(b.o_orderkey, s.k)            AS k,
    COALESCE(s.src_price, b.o_totalprice)  AS price,
    COALESCE(b.o_orderstatus, s.src_status) AS status,
    CASE WHEN b.o_orderkey IS NULL THEN 'inserted'
         WHEN s.k IS NULL          THEN 'carried'
         ELSE 'updated' END                AS disposition
  FROM orders b FULL OUTER JOIN src s ON b.o_orderkey = s.k
)
SELECT status, disposition,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(FLOOR((SUM(CAST(price AS DECIMAL(18,4)))) * 1e2 + 0.5) / 1e2 AS DOUBLE)
         AS total_price
FROM merged
GROUP BY status, disposition
"""


@register(
    "q_merge_upsert",
    oracle=_QMERGE_ORACLE,
    description="MERGE-style upsert (update/insert/carry) via full outer join",
    tags=("merge", "upsert", "join", "warehouse"),
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = o.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("k"),
        (F.floor(((F.col("o_totalprice") * 1.1).cast("decimal(18,4)")) * 1e2 + 0.5) / 1e2)
        .cast("double")
        .alias("src_price"),
        F.lit(None).cast("string").alias("src_status"),
    )
    inserts = o.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 100_000_000).alias("k"),
        F.col("o_totalprice").alias("src_price"),
        F.lit("N").alias("src_status"),
    )
    src = updates.unionByName(inserts)
    merged = o.join(src, F.col("o_orderkey") == F.col("k"), "full_outer").select(
        F.coalesce("src_price", "o_totalprice").alias("price"),
        F.coalesce("o_orderstatus", "src_status").alias("status"),
        F.when(F.col("o_orderkey").isNull(), "inserted")
        .when(F.col("k").isNull(), "carried")
        .otherwise("updated")
        .alias("disposition"),
    )
    return merged.groupBy("status", "disposition").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        (F.floor((F.sum(F.col("price").cast("decimal(18,4)"))) * 1e2 + 0.5) / 1e2)
        .cast("double")
        .alias("total_price"),
    )


# --------------------------------------------------------------------------
# CDC apply: materialize the latest state from an ordered change log
# (last-writer-wins with delete tombstones) — the Debezium/stream-table
# maintenance pattern.
# --------------------------------------------------------------------------

_QCDC_ORACLE = """
WITH log AS (
  SELECT user_id, event_id, ts, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM events
)
SELECT user_id,
       event_type AS last_op,
       CAST(FLOOR((CAST(value AS DECIMAL(18,4))) * 1e4 + 0.5) / 1e4 AS DOUBLE) AS last_value,
       CAST(epoch_us(ts) AS BIGINT) AS last_ts_us
FROM log
WHERE rk = 1 AND event_type <> 'error'
"""


@register(
    "q_cdc_apply",
    oracle=_QCDC_ORACLE,
    description=(
        "CDC apply: last-writer-wins latest state per key from the event "
        "change log, 'error' ops as delete tombstones"
    ),
    tags=("warehouse", "cdc", "window", "upsert"),
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture materialization: each key's newest log entry
    (ordered by (ts, event_id) DESC — the deterministic tie-break) wins;
    keys whose final operation is a tombstone ('error' here) drop out of
    the materialized state. One window shuffle on the key — the same
    plan MERGE-based CDC apply lowers to, without requiring a table
    format. Timestamps surface as epoch micros, values through the
    decimal round-trip, so the state hash-matches cross-engine."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_op"),
            (F.floor((F.col("value").cast("decimal(18,4)")) * 1e4 + 0.5) / 1e4)
            .cast("double")
            .alias("last_value"),
            F.unix_micros("ts").cast("long").alias("last_ts_us"),
        )
    )
