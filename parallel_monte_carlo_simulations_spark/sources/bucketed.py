"""Bucketed tables: the co-located-join storage layout.

At 100 TB the single most expensive part of a repeated fact-fact join
is re-shuffling both sides on every query. Bucketing pre-shuffles ONCE
at write time: ``bucketBy(N, key)`` hash-partitions rows into N files
per partition and records the layout in the catalog, so a later join of
two tables bucketed on the same key with the same N needs NO exchange —
the scan itself satisfies the join's distribution requirement
(plan-asserted in tests/test_plans.py). ``sortBy`` additionally
pre-sorts within buckets so sort-merge joins skip their sort.

The reference has no storage layout at all (CSV sink,
``utils.py:15-23``); this is the Spark-native answer to "make the join
free", and the pattern users should copy for iterated pipelines over
the same keys (dedup reruns, daily fact joins).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.microunit import (
    rdiv_halfup_duck,
    rdiv_halfup_expr,
    units_col,
    units_sql,
)
from ..registry import register
from ..tables import table
from .roundtrip import _tmpdir

N_BUCKETS = 8
_RUN_SEQ = itertools.count()

_QBUCKETED_ORACLE = f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT)        AS n_items,
       {rdiv_halfup_duck(f"SUM({units_sql('l_extendedprice', 2)})", "100", 2)}
                                       AS sum_price
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_totalprice > 1000
GROUP BY o_orderpriority
"""


@register(
    "q_sink_bucketed_join",
    oracle=_QBUCKETED_ORACLE,
    description=(
        "bucketBy storage layout: write lineitem+orders bucketed on the "
        "join key, read back and join with zero exchanges (co-located "
        "bucket join)"
    ),
    tags=("source", "sink", "bucketing", "join", "layout"),
)
def q_sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write both join sides as parquet tables bucketed on the join key
    (same bucket count), then join the read-back tables. Bucket layout
    makes the join exchange-free; the oracle (reading the original
    parquet) only matches if the bucketed write+read was lossless.

    Table metadata lives in the session catalog (in-memory; no Hive
    metastore needed) and data files under an external ``path``, so the
    round driver's plain session can run this without a warehouse
    directory appearing in the repo."""
    run = next(_RUN_SEQ)
    l_name, o_name = f"li_bucketed_{run}", f"ord_bucketed_{run}"
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    for df, name, key in ((l, l_name, "l_orderkey"), (o, o_name, "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            # r13 (guide §6): align the write layout with the bucket
            # function — repartition(N, key) and bucketBy(N, key) share
            # pmod(murmur3(key), N), so each write task holds exactly
            # one bucket. Without it every scan task writes a file per
            # bucket it sees (scan_tasks x N files — the small-files
            # problem at 100 TB) and a single-task scan serializes the
            # whole write (measured 3.20 -> 2.46 s at sf0.1/local[32],
            # identical stored rows and query result).
            df.repartition(N_BUCKETS, F.col(key))
            .write.format("parquet")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", _tmpdir(name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    lb, ob = spark.table(l_name), spark.table(o_name)
    return (
        lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        .filter(F.col("o_totalprice") > 1000)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            rdiv_halfup_expr(
                f"sum({units_sql('l_extendedprice', 2)})", "100", 2
            ).alias("sum_price"),
        )
    )
