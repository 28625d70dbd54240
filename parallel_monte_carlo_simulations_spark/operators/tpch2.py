"""Second TPC-H-shaped sweep adapted to the driver schema: multi-way
join topologies beyond the star (nation-pair volume, market share,
bucketed CASE aggregation, promo share, country-code anti join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.microunit import (
    rdiv_halfup_duck,
    rdiv_halfup_expr,
    rdiv_halfup_spark,
    units_col,
    units_sql,
)
from ..registry import register
from ..tables import table

# --------------------------------------------------------------------------
# Q7 shape: trade volume between nation pairs (two roles for nation).
# --------------------------------------------------------------------------

_Q07_ORACLE = f"""
SELECT
  cn.n_name AS cust_nation,
  sn.n_name AS supp_nation,
  CAST(year(l_shipdate) AS INTEGER) AS ship_year,
  {rdiv_halfup_duck(
      f"SUM({units_sql('l_extendedprice', 2)}"
      f" * {units_sql('1 - l_discount', 2)})",
      "10000", 2)} AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name <> sn.n_name
GROUP BY cust_nation, supp_nation, ship_year
"""


@register(
    "q07_nation_volume",
    oracle=_Q07_ORACLE,
    description="TPC-H Q7 shape: nation-pair trade volume (dim in two roles)",
    tags=("join", "aggregate", "tpch"),
)
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    cn = n.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = n.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cnk"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("snk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            F.sum(
                units_col(F.col("l_extendedprice"), 2)
                * units_col(1 - F.col("l_discount"), 2)
            ).alias("volume_u4")
        )
        .select(
            "cust_nation",
            "supp_nation",
            "ship_year",
            rdiv_halfup_expr("volume_u4", "10000", 2).alias("volume"),
        )
    )


# --------------------------------------------------------------------------
# Q8 shape: a nation's share of regional revenue per year.
# --------------------------------------------------------------------------

_Q08_ORACLE = f"""
WITH rev AS (
  SELECT
    CAST(year(o_orderdate) AS INTEGER) AS order_year,
    {units_sql('l_extendedprice', 2)}
      * {units_sql('1 - l_discount', 2)}  AS volume_u4,
    cn.n_name                             AS cust_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region    ON cn.n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT
  order_year,
  {rdiv_halfup_duck(
      "SUM(CASE WHEN cust_nation = 'NATION_2' THEN volume_u4 ELSE 0 END)",
      "SUM(volume_u4)", 6)} AS mkt_share
FROM rev
GROUP BY order_year
"""


@register(
    "q08_market_share",
    oracle=_Q08_ORACLE,
    description="TPC-H Q8 shape: conditional share of regional revenue",
    tags=("join", "aggregate", "tpch"),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    vol_u4 = units_col(F.col("l_extendedprice"), 2) * units_col(
        1 - F.col("l_discount"), 2
    )
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .select(
            F.year("o_orderdate").alias("order_year"),
            vol_u4.alias("volume_u4"),
            "cust_nation",
        )
    )
    return (
        rev.groupBy("order_year")
        .agg(
            F.sum(
                F.when(
                    F.col("cust_nation") == "NATION_2", F.col("volume_u4")
                ).otherwise(F.lit(0))
            ).alias("num_u4"),
            F.sum("volume_u4").alias("den_u4"),
        )
        .select(
            "order_year",
            rdiv_halfup_expr("num_u4", "den_u4", 6).alias("mkt_share"),
        )
    )


# --------------------------------------------------------------------------
# Q12 shape: two-bucket CASE aggregation by priority class.
# --------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT
  l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


@register(
    "q12_priority_buckets",
    oracle=_Q12_ORACLE,
    description="TPC-H Q12 shape: IN-list CASE bucketing over a join",
    tags=("join", "case", "tpch"),
)
def q12_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


# --------------------------------------------------------------------------
# Q14 shape: percentage-of-total with a predicate numerator.
# --------------------------------------------------------------------------

_Q14_ORACLE = f"""
SELECT
  {rdiv_halfup_duck(
      f"100 * SUM(CASE WHEN p_type = 'PROMO' "
      f"THEN {units_sql('l_extendedprice', 2)}"
      f" * {units_sql('1 - l_discount', 2)} ELSE 0 END)",
      f"SUM({units_sql('l_extendedprice', 2)}"
      f" * {units_sql('1 - l_discount', 2)})", 6)} AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01'
  AND l_shipdate <  TIMESTAMP '1997-07-01'
"""


@register(
    "q14_promo_share",
    oracle=_Q14_ORACLE,
    description="TPC-H Q14 shape: conditional revenue share (LIKE numerator)",
    tags=("join", "aggregate", "tpch"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev_u4 = units_col(F.col("l_extendedprice"), 2) * units_col(
        1 - F.col("l_discount"), 2
    )
    promo_u4 = F.when(F.col("p_type") == "PROMO", rev_u4).otherwise(F.lit(0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo_u4).alias("num_u4"),
            F.sum(rev_u4).alias("den_u4"),
        )
        .select(
            rdiv_halfup_expr("100 * num_u4", "den_u4", 6).alias(
                "promo_revenue_pct"
            )
        )
    )


# --------------------------------------------------------------------------
# Q22 shape: selective band + scalar-subquery threshold + anti join.
# --------------------------------------------------------------------------

def _q22_sql(totacctbal_expr: str) -> str:
    """Shared-dialect Q22 text; only the exact division differs.

    The original ``c_acctbal > (SELECT AVG(c_acctbal) ...)`` threshold
    compared against a raw-double AVG whose last-ulp value depends on
    each engine's summation order — a boundary customer could flip in or
    out. The comparison is now exact integer arithmetic on both sides:
    ``cents(c_acctbal) * n_pos > sum_pos_cents`` is the same predicate
    with no division at all."""
    return f"""
WITH pos AS (
  SELECT SUM({units_sql("c_acctbal", 2)}) AS bal_u2,
         COUNT(*)                         AS n_pos
  FROM customer WHERE c_acctbal > 0
),
eligible AS (
  SELECT c_custkey, c_acctbal,
         CAST(c_custkey % 10 AS INTEGER) AS cust_band
  FROM customer, pos
  WHERE c_custkey % 10 IN (1, 3, 5)
    AND {units_sql("c_acctbal", 2)} * pos.n_pos > pos.bal_u2
)
SELECT
  cust_band,
  COUNT(*)             AS numcust,
  {totacctbal_expr}    AS totacctbal
FROM eligible e
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = e.c_custkey AND o_totalprice > 300000)
GROUP BY cust_band
"""


_Q22_ORACLE = _q22_sql(
    rdiv_halfup_duck(f"SUM({units_sql('c_acctbal', 2)})", "100", 2)
)


@register(
    "q22_global_sales_opp",
    oracle=_Q22_ORACLE,
    description="TPC-H Q22 shape: band filter + avg subquery + anti join",
    tags=("subquery", "anti", "tpch"),
)
def q22_global_sales_opp(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        _q22_sql(
            rdiv_halfup_spark(f"SUM({units_sql('c_acctbal', 2)})", "100", 2)
        )
    )
