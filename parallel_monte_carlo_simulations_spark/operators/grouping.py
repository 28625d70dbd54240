"""Multi-dimensional grouping: rollup, cube, grouping sets, distinct.

Spark computes these with a single Expand + hash aggregate (one shuffle);
partial aggregation still applies, so they scale like plain groupBy.
"""

from __future__ import annotations

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

_QROLLUP_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  COUNT(*)                     AS n_items,
  FLOOR((SUM(l_quantity)) * 1e2 + 0.5) / 1e2    AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register(
    "q_rollup",
    oracle=_QROLLUP_ORACLE,
    description="ROLLUP hierarchy totals (flag, flag+status, grand total)",
    tags=("grouping", "rollup"),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        (F.floor((F.sum("l_quantity")) * 1e2 + 0.5) / 1e2).alias("sum_qty"),
    )


_QCUBE_ORACLE = f"""
SELECT
  o_orderstatus,
  o_orderpriority,
  COUNT(*)                      AS n_orders,
  {rdiv_halfup_duck(f"SUM({units_sql('o_totalprice', 2)})", "100", 2)}
                                AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register(
    "q_cube",
    oracle=_QCUBE_ORACLE,
    description="CUBE: all grouping combinations of status × priority",
    tags=("grouping", "cube"),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(units_col(F.col("o_totalprice"), 2)).alias("_u2"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "n_orders",
            rdiv_halfup_expr("_u2", "100", 2).alias("total_price"),
        )
    )


_QGSETS_ORACLE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


@register(
    "q_grouping_sets",
    oracle=_QGSETS_ORACLE,
    description="explicit GROUPING SETS: status-only and priority-only slices",
    tags=("grouping", "grouping_sets"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gsets")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders_gsets
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


_QDISTINCT_ORACLE = """
SELECT DISTINCT o_orderstatus, o_orderpriority
FROM orders
"""


@register(
    "q_distinct",
    oracle=_QDISTINCT_ORACLE,
    description="DISTINCT over two low-cardinality columns",
    tags=("distinct",),
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


_QCD_ORACLE = """
SELECT
  o_orderpriority,
  COUNT(DISTINCT o_custkey) AS n_customers,
  COUNT(*)                  AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "q_count_distinct",
    oracle=_QCD_ORACLE,
    description="exact COUNT(DISTINCT) per group",
    tags=("distinct", "aggregate"),
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# approx_count_distinct is HLL-based and engine-specific — the estimate
# differs between Spark and DuckDB by design, so this query is registered
# WITHOUT an oracle (driver records rows-only). The property test in
# tests/ checks the estimate is within 5% of exact.
@register(
    "q_approx_count_distinct",
    oracle=None,
    description="HLL++ approx distinct (no oracle: estimator-specific)",
    tags=("distinct", "approx"),
)
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )


_QGROUPID_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register(
    "q_grouping_id",
    oracle=_QGROUPID_ORACLE,
    description="GROUPING() indicator columns distinguish rollup subtotal levels",
    tags=("grouping", "rollup", "grouping_id"),
)
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping() disambiguates 'real NULL key' from 'subtotal row' —
    without it, rollup output is unusable on nullable group keys."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus").agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n_items"),
        )
    )
