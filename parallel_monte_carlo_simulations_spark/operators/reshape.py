"""Reshaping: pivot (long->wide) and unpivot/melt (wide->long).

Spark executes pivot as a single hash aggregate with one output column
per pivot value (values pinned explicitly — never let the engine run the
extra distinct-scan job to discover them, and at scale an unpinned pivot
over a high-cardinality column is a plan bomb). Unpivot is a zero-shuffle
Expand."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_STATUSES = ["F", "O", "P"]

_QPIVOT_ORACLE = """
SELECT
  o_orderpriority,
  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS status_F,
  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS status_O,
  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS status_P
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "q_pivot",
    oracle=_QPIVOT_ORACLE,
    description="pivot with pinned values: status counts per priority",
    tags=("reshape", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("bigint").alias(f"status_{s}")
            for s in _STATUSES
        ],
    )


_QUNPIVOT_ORACLE = """
SELECT c_custkey, metric, FLOOR((val) * 1e2 + 0.5) / 1e2 AS val
FROM (
  SELECT c_custkey,
         unnest(['acctbal', 'nationkey']) AS metric,
         unnest([c_acctbal, CAST(c_nationkey AS DOUBLE)]) AS val
  FROM customer
  WHERE c_custkey % 10 = 0
)
"""


@register(
    "q_unpivot_melt",
    oracle=_QUNPIVOT_ORACLE,
    description="unpivot/melt wide columns into (metric, value) rows",
    tags=("reshape", "unpivot"),
)
def q_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    wide = c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    long = wide.unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return long.select("c_custkey", "metric", (F.floor((F.col("val")) * 1e2 + 0.5) / 1e2).alias("val"))
