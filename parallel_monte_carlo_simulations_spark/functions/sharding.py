"""Training-data shard manifests: deterministic shuffle + shard packing.

The last step of an LLM data pipeline before the dataloader: assign
every document to one of N shards by a DETERMINISTIC hash (stable
across reruns and cluster layouts — no rand()), order documents within
each shard by the same hash (the "global shuffle" that decorrelates
adjacent training examples), and emit a per-shard MANIFEST — row count,
payload bytes, and an order-sensitive fingerprint the dataloader can
verify after download.

The fingerprint is order-SENSITIVE on the intra-shard order (a
polynomial rolling hash over the hash-ordered doc ids, mod a prime), so
the oracle only matches if Spark produced the exact same shard
assignment AND the exact same within-shard order — the two properties
shard reproducibility depends on.

Scale shape: one hash projection, one groupBy(shard) — a single
shuffle; manifests are N rows. The md5-derived 60-bit hash is the
repo's portable hash (``functions.hashing``), identical in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .hashing import sql_hash60 as _hash60_sql

N_SHARDS = 16
_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
_BASE = 1_000_003


_QSHARD_ORACLE = f"""
WITH hashed AS (
  SELECT doc_id, n_chars,
         {_hash60_sql("'shard:' || CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
),
assigned AS (
  SELECT doc_id, n_chars, h, h % {N_SHARDS} AS shard,
         ROW_NUMBER() OVER (PARTITION BY h % {N_SHARDS} ORDER BY h, doc_id)
           AS pos
  FROM hashed
),
fp AS (
  SELECT shard, doc_id, pos, n_chars,
         -- polynomial rolling hash, evaluated with Horner over pos order
         (doc_id % {_MOD}) AS term
  FROM assigned
)
SELECT CAST(shard AS INTEGER)        AS shard,
       CAST(COUNT(*) AS BIGINT)      AS n_docs,
       CAST(SUM(n_chars) AS BIGINT)  AS total_chars,
       CAST(list_reduce(
             list_prepend(0::HUGEINT, list(doc_id::HUGEINT ORDER BY pos)),
             (acc, d) -> (acc * {_BASE} + d) % {_MOD}
           ) AS BIGINT)              AS order_fingerprint
FROM fp
GROUP BY shard
"""


@register(
    "q_dataset_shard_manifest",
    oracle=_QSHARD_ORACLE,
    description=(
        f"training-data sharding: deterministic hash shuffle into "
        f"{N_SHARDS} shards with per-shard manifests (count, bytes, "
        "order-sensitive rolling-hash fingerprint)"
    ),
    tags=("dataset", "sharding", "curation", "deterministic"),
)
def q_dataset_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .hashing import hash60

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    hashed = d.withColumn(
        "h", hash60(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
    ).withColumn("shard", F.col("h") % N_SHARDS)
    from pyspark.sql import Window

    pos = F.row_number().over(
        Window.partitionBy("shard").orderBy("h", "doc_id")
    )
    assigned = hashed.withColumn("pos", pos)
    # Horner fold over the hash-ordered ids: decimal accumulator keeps
    # the (acc * base + id) product exact before each mod.
    ids_in_order = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "doc_id"))),
        lambda s: s["doc_id"],
    )
    # the merge lambda must RETURN the accumulator type exactly —
    # decimal arithmetic re-derives precision per op, so cast back
    fingerprint = F.aggregate(
        ids_in_order,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, d: ((acc * _BASE + d) % _MOD).cast("decimal(38,0)"),
    ).cast("long")
    return (
        assigned.groupBy(F.col("shard").cast("int").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            fingerprint.alias("order_fingerprint"),
        )
    )
