"""Third TPC-H-shaped sweep: the remaining distinctive query topologies
(EXISTS semi with a non-equi conjunct, multi-join profit rollup,
group-vs-global HAVING share, outer-join count histogram, argmax-by-view,
count-distinct with NOT IN exclusion, sole-late-supplier multi-EXISTS).

The driver schema has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate`` columns, so Q4/Q9/Q11/Q16/Q20/Q21 are
adapted: "late" is proxied by ``l_shipdate > o_orderdate + 60 days``,
supply cost by a fraction of ``p_retailprice``, and partsupp by the
(part, supplier) pairs observed in ``lineitem``. The join/subquery
topology — what each query exercises — is preserved.

Scale notes (100 TB): every dimension side that fits in memory is
broadcast explicitly; the fact-fact self-aggregations (Q13, Q21) reduce
``lineitem``/``orders`` to distinct keys *before* joining so the shuffle
carries keys, not payloads; the Q11-style global total is a 1-row
aggregate broadcast via crossJoin rather than a window over all rows.
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

# --------------------------------------------------------------------------
# Q4 shape: order-priority checking — EXISTS semi join with an extra
# non-equi conjunct (late lineitem), counted by priority.
# --------------------------------------------------------------------------

_Q04_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


@register(
    "q04_priority_checking",
    oracle=_Q04_ORACLE,
    description="TPC-H Q4 shape: EXISTS semi join with non-equi conjunct",
    tags=("join", "semi", "exists", "tpch"),
)
def q04_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    # left_semi with a mixed equi + range condition: Catalyst keeps the
    # equi part as the shuffle key and evaluates the range post-join.
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q9 shape: product-type profit rollup over a 4-way join, grouped by the
# supplier nation and order year. Supply cost proxied at 60% of retail.
# --------------------------------------------------------------------------

_Q09_ORACLE = """
SELECT
  n_name AS supp_nation,
  CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(FLOOR((SUM(CAST(l_extendedprice * (1 - l_discount)
                      - 0.6 * p_retailprice * l_quantity
                      AS DECIMAL(18,4)))) * 1e2 + 0.5) / 1e2 AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%g%'
GROUP BY supp_nation, o_year
"""


@register(
    "q09_product_profit",
    oracle=_Q09_ORACLE,
    description="TPC-H Q9 shape: profit rollup over lineitem-part-supplier-orders-nation",
    tags=("join", "aggregate", "tpch"),
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%g%")).select(
        "p_partkey", "p_retailprice"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        # Per-row cast to DECIMAL before the sum: decimal addition is
        # exact, so the result is independent of partition/merge order —
        # required for cross-engine parity and for stable results under
        # AQE re-partitioning at scale.
        .agg(
            (F.floor((F.sum(profit.cast("decimal(18,4)"))) * 1e2 + 0.5) / 1e2)
            .cast("double")
            .alias("sum_profit")
        )
    )


# --------------------------------------------------------------------------
# Q11 shape: important-stock share — per-part value for one nation's
# suppliers, kept only when above a fraction of the GLOBAL total
# (group HAVING against a scalar-subquery threshold).
# --------------------------------------------------------------------------

_Q11_ORACLE = """
WITH val AS (
  SELECT l_partkey, SUM(l_extendedprice * l_quantity) AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, FLOOR((part_value) * 1e2 + 0.5) / 1e2 AS part_value
FROM val
WHERE part_value > (SELECT SUM(part_value) * 0.001 FROM val)
"""


@register(
    "q11_important_stock",
    oracle=_Q11_ORACLE,
    description="TPC-H Q11 shape: group value vs global-total scalar threshold",
    tags=("subquery", "aggregate", "tpch"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1").select(
        "n_nationkey"
    )
    val = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("pv"))
    )
    # 1-row global total, broadcast to every partition — no second shuffle
    # of the grouped data and no all-rows window at scale.
    total = val.agg((F.sum("pv") * 0.001).alias("threshold"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("pv") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.floor((F.col("pv")) * 1e2 + 0.5) / 1e2).alias("part_value"),
        )
    )


# --------------------------------------------------------------------------
# Q13 shape: customer order-count distribution — outer join with a join
# predicate (not a post-filter!), then a histogram of the counts.
# --------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


@register(
    "q13_customer_distribution",
    oracle=_Q13_ORACLE,
    description="TPC-H Q13 shape: left-join-with-predicate count histogram",
    tags=("join", "outer", "aggregate", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, on=cond, how="left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q15 shape: top supplier — a revenue "view" consumed twice (once for the
# global max, once for the matching rows).
# --------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {rdiv_halfup_duck(
             f"SUM({units_sql('l_extendedprice', 2)}"
             f" * {units_sql('1 - l_discount', 2)})",
             "10000", 2)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register(
    "q15_top_supplier",
    oracle=_Q15_ORACLE,
    description="TPC-H Q15 shape: view reused for scalar max + equality filter",
    tags=("subquery", "view", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                units_col(F.col("l_extendedprice"), 2)
                * units_col(1 - F.col("l_discount"), 2)
            ).alias("revenue_u4")
        )
        .select(
            "supplier_no",
            rdiv_halfup_expr("revenue_u4", "10000", 2).alias(
                "total_revenue"
            ),
        )
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q16 shape: parts-supplier relationship — count DISTINCT suppliers per
# part attribute group, excluding a NOT-IN supplier set. partsupp is
# proxied by the distinct (part, supplier) pairs observed in lineitem.
# --------------------------------------------------------------------------

_Q16_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 13, 17)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register(
    "q16_parts_suppliers",
    oracle=_Q16_ORACLE,
    description="TPC-H Q16 shape: distinct-supplier count with NOT IN exclusion",
    tags=("join", "distinct", "anti", "tpch"),
)
def q16_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reduce the fact table to distinct key pairs FIRST — at 100 TB this
    # collapses lineitem to |part x supp| before any join.
    ps = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey")
    )
    return (
        ps.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q21 shape: suppliers who kept orders waiting — the sole late supplier
# on a multi-supplier finished order (EXISTS + NOT EXISTS in the
# original; expressed here as two key-reduced aggregates, same result).
# --------------------------------------------------------------------------

_Q21_ORACLE = """
WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
),
nsupp AS (
  SELECT l_orderkey AS ok, COUNT(DISTINCT l_suppkey) AS n_supp
  FROM lineitem GROUP BY ok
),
sole AS (
  SELECT l_orderkey, MIN(l_suppkey) AS the_supp
  FROM late GROUP BY l_orderkey HAVING COUNT(*) = 1
)
SELECT s_name, COUNT(*) AS numwait
FROM sole
JOIN nsupp ON l_orderkey = ok AND n_supp > 1
JOIN supplier ON the_supp = s_suppkey
GROUP BY s_name
"""


@register(
    "q21_waiting_suppliers",
    oracle=_Q21_ORACLE,
    description="TPC-H Q21 shape: sole late supplier on multi-supplier orders",
    tags=("join", "exists", "anti", "tpch"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    nsupp = (
        l.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") > 1)
    )
    sole = (
        late.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("the_supp"), F.count("*").alias("n_late"))
        .filter(F.col("n_late") == 1)
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(nsupp, F.col("l_orderkey") == F.col("ok"))
        .join(F.broadcast(s), F.col("the_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q20 shape: potential part promotion — nested IN with an aggregate
# threshold (suppliers who shipped a promo part well above the part's
# average per-supplier volume). partsupp proxied by lineitem pairs.
# --------------------------------------------------------------------------

_Q20_ORACLE = """
WITH spq AS (
  SELECT l_suppkey, l_partkey, FLOOR((SUM(l_quantity)) * 1e2 + 0.5) / 1e2 AS qty
  FROM lineitem GROUP BY l_suppkey, l_partkey
),
pavg AS (
  SELECT l_partkey AS pk, AVG(qty) AS avg_qty FROM spq GROUP BY l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT spq.l_suppkey
  FROM spq
  JOIN pavg ON spq.l_partkey = pavg.pk
  JOIN part ON spq.l_partkey = p_partkey
  WHERE p_name LIKE '%red%' AND spq.qty > 1.5 * pavg.avg_qty
)
"""


@register(
    "q20_part_promotion",
    oracle=_Q20_ORACLE,
    description="TPC-H Q20 shape: nested IN with per-part aggregate threshold",
    tags=("subquery", "semi", "aggregate", "tpch"),
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    spq = l.groupBy("l_suppkey", "l_partkey").agg(
        (F.floor((F.sum("l_quantity")) * 1e2 + 0.5) / 1e2).alias("qty")
    )
    pavg = spq.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("qty").alias("avg_qty")
    )
    promo = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey"
    )
    heavy = (
        spq.join(pavg, spq.l_partkey == pavg.pk)
        .join(F.broadcast(promo), spq.l_partkey == F.col("p_partkey"))
        .filter(F.col("qty") > 1.5 * F.col("avg_qty"))
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    return s.join(
        heavy, s.s_suppkey == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")
