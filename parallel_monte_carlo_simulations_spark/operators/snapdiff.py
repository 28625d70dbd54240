"""Snapshot diff: added / removed / changed rows between two table
versions — the table-diff primitive behind data versioning (Delta
CHANGE DATA FEED, lakeFS/DVC-style diffs, reconciliation dashboards).

Versions are derived deterministically: v1 = orders placed before the
series midpoint; v2 = all orders minus a deterministic 5% (removals),
with pre-midpoint URGENT rows "updated" (priority recoded) — so the
diff carries all four change classes by construction. The diff itself
is ONE full outer join on the key comparing content hashes:

- key only in v2           -> added
- key only in v1           -> removed
- both, hash differs       -> changed
- both, hash equal         -> unchanged

The content hash is the portable md5-derived 60-bit hash of the
canonicalized row payload, so both engines agree bit-for-bit. Scale:
one co-partitioned full outer join on the snapshot key + one exact
groupBy — the same cost as any fact-fact join; at 100 TB both sides
bucket by the key and the join is zero-exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60, sql_hash60
from ..registry import register
from ..tables import table

SPLIT_DATE = "1998-01-01"

_PAYLOAD = (
    "CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' || "
    "CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR) "
    "|| '|' || o_orderpriority"
)
_PAYLOAD_V2 = (
    "CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' || "
    "CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR) "
    "|| '|' || CASE WHEN o_orderdate < TIMESTAMP '" + SPLIT_DATE + "' "
    "AND o_orderpriority = '1-URGENT' "
    "THEN 'RECODED' ELSE o_orderpriority END"
)
#: v2 drops a deterministic 5% of keys so the diff carries removals.
_DROP = sql_hash60("'snapdrop:' || CAST(o_orderkey AS VARCHAR)")

_QDIFF_ORACLE = f"""
WITH v1 AS (
  SELECT o_orderkey AS okey, {sql_hash60(_PAYLOAD)} AS h
  FROM orders WHERE o_orderdate < TIMESTAMP '{SPLIT_DATE}'
),
v2 AS (
  SELECT o_orderkey AS okey, {sql_hash60(_PAYLOAD_V2)} AS h
  FROM orders
  WHERE {_DROP} % 20 <> 0
),
diff AS (
  SELECT COALESCE(v1.okey, v2.okey) AS okey,
         CASE WHEN v1.okey IS NULL THEN 'added'
              WHEN v2.okey IS NULL THEN 'removed'
              WHEN v1.h <> v2.h THEN 'changed'
              ELSE 'unchanged' END AS change
  FROM v1 FULL OUTER JOIN v2 ON v1.okey = v2.okey
)
SELECT change,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(okey) AS min_key,
       MAX(okey) AS max_key
FROM diff
GROUP BY change
ORDER BY change
"""


@register(
    "q_snapshot_diff",
    oracle=_QDIFF_ORACLE,
    description=(
        "table-version diff: added/removed/changed/unchanged row counts "
        "between two derived snapshots via one full outer join on "
        "portable content hashes"
    ),
    tags=("warehouse", "diff", "versioning", "full-outer-join", "audit"),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string")
    payload_v1 = F.concat_ws(
        "|",
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        cents,
        F.col("o_orderpriority"),
    )
    payload_v2 = F.concat_ws(
        "|",
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        cents,
        F.when(
            (F.col("o_orderdate") < F.lit(SPLIT_DATE).cast("timestamp"))
            & (F.col("o_orderpriority") == "1-URGENT"),
            F.lit("RECODED"),
        ).otherwise(F.col("o_orderpriority")),
    )
    v1 = o.where(
        F.col("o_orderdate") < F.lit(SPLIT_DATE).cast("timestamp")
    ).select(
        F.col("o_orderkey").alias("okey1"), hash60(payload_v1).alias("h1")
    )
    v2 = o.where(
        hash60(
            F.concat(F.lit("snapdrop:"), F.col("o_orderkey").cast("string"))
        )
        % 20
        != 0
    ).select(
        F.col("o_orderkey").alias("okey2"), hash60(payload_v2).alias("h2")
    )
    diff = v1.join(v2, v1.okey1 == v2.okey2, "full_outer").select(
        F.coalesce("okey1", "okey2").alias("okey"),
        F.when(F.col("okey1").isNull(), F.lit("added"))
        .when(F.col("okey2").isNull(), F.lit("removed"))
        .when(F.col("h1") != F.col("h2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
    )
    return (
        diff.groupBy("change")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("okey").alias("min_key"),
            F.max("okey").alias("max_key"),
        )
        .orderBy("change")
    )
