"""Join-type sweep: broadcast/shuffle equi, outer, semi/anti, range, as-of.

Each join strategy is a registered oracle-checked query. Strategy notes
for 100 TB: dims broadcast (map-side hash join, no shuffle of the fact
table); fact-fact joins shuffle on the join key and rely on AQE skew
splitting; the range join bounds its band tightly so the worst key's
fan-out stays small; the as-of join is the union+window formulation that
needs exactly ONE shuffle (by user) instead of a quadratic theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
# Broadcast inner equi join: fact ⋈ small dim.
# Money/avg outputs use exact BIGINT units + the string-form half-up
# division in BOTH engines (r13: raw-double ROUND(SUM/AVG) eliminated
# repo-wide, SCALING.md "Cross-engine float discipline").
# --------------------------------------------------------------------------

_QBCAST_ORACLE = f"""
SELECT
  p_brand,
  COUNT(*)                         AS n_items,
  {rdiv_halfup_duck(f"SUM({units_sql('l_extendedprice', 2)})", "100", 2)}
                                   AS total_price,
  {rdiv_halfup_duck(f"SUM({units_sql('l_quantity', 0)})", "COUNT(*)", 4)}
                                   AS avg_qty
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_size <= 15
GROUP BY p_brand
"""


@register(
    "q_join_broadcast_inner",
    oracle=_QBCAST_ORACLE,
    description="broadcast hash join: fact ⋈ filtered dim, no fact shuffle",
    tags=("join", "broadcast"),
)
def q_join_broadcast_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(units_col(F.col("l_extendedprice"), 2)).alias("price_u2"),
            F.sum(units_col(F.col("l_quantity"), 0)).alias("qty_u0"),
        )
        .select(
            "p_brand",
            "n_items",
            rdiv_halfup_expr("price_u2", "100", 2).alias("total_price"),
            rdiv_halfup_expr("qty_u0", "n_items", 4).alias("avg_qty"),
        )
    )


# --------------------------------------------------------------------------
# Left outer join preserving unmatched rows.
# --------------------------------------------------------------------------

_QLEFT_ORACLE = f"""
SELECT
  c_custkey,
  c_name,
  COUNT(o_orderkey)                        AS n_orders,
  {rdiv_halfup_duck(
      f"COALESCE(SUM({units_sql('o_totalprice', 2)}), 0)", "100", 2
  )} AS total_spend
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


@register(
    "q_join_left_outer",
    oracle=_QLEFT_ORACLE,
    description="left outer join keeping customers with zero orders",
    tags=("join", "outer"),
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(units_col(F.col("o_totalprice"), 2)), F.lit(0)
            ).alias("spend_u2"),
        )
        .select(
            "c_custkey",
            "c_name",
            "n_orders",
            rdiv_halfup_expr("spend_u2", "100", 2).alias("total_spend"),
        )
    )


# --------------------------------------------------------------------------
# Full outer join: customers-per-nation vs suppliers-per-nation.
# --------------------------------------------------------------------------

_QFULL_ORACLE = """
WITH cust AS (
  SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
  FROM customer GROUP BY c_nationkey
), supp AS (
  SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
  FROM supplier GROUP BY s_nationkey
)
SELECT
  COALESCE(cust.nationkey, supp.nationkey) AS nationkey,
  COALESCE(n_customers, 0)                 AS n_customers,
  COALESCE(n_suppliers, 0)                 AS n_suppliers
FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
"""


@register(
    "q_join_full_outer",
    oracle=_QFULL_ORACLE,
    description="full outer join of two pre-aggregated sides",
    tags=("join", "outer"),
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return cust.join(supp, "nationkey", "full").select(
        "nationkey",
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


# --------------------------------------------------------------------------
# Left semi join: EXISTS semantics without duplicating rows.
# --------------------------------------------------------------------------

_QSEMI_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 300000
)
"""


@register(
    "q_join_semi",
    oracle=_QSEMI_ORACLE,
    description="left semi join (EXISTS): customers with a >300k order",
    tags=("join", "semi"),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


# --------------------------------------------------------------------------
# Left anti join: NOT EXISTS.
# --------------------------------------------------------------------------

_QANTI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""


@register(
    "q_join_anti",
    oracle=_QANTI_ORACLE,
    description="left anti join (NOT EXISTS): customers without urgent orders",
    tags=("join", "anti"),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "customers with no orders at all" is empty at every test SF — use
    # the urgent-order predicate so the anti join asserts real rows.
    c = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# Range (band) join: same-user event pairs within a 5-minute window.
# Equi key (user_id) + tight band keeps fan-out bounded at scale; Spark
# executes the equi part as a hash/SMJ join and the band as a post-filter.
# --------------------------------------------------------------------------

_QRANGE_ORACLE = """
SELECT
  a.event_type                  AS first_type,
  b.event_type                  AS next_type,
  COUNT(*)                      AS n_pairs
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
GROUP BY first_type, next_type
"""


@register(
    "q_join_range",
    oracle=_QRANGE_ORACLE,
    description="band/range join: same-user event pairs within 5 minutes",
    tags=("join", "range", "theta"),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .groupBy(
            F.col("a.event_type").alias("first_type"),
            F.col("b.event_type").alias("next_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --------------------------------------------------------------------------
# As-of join: for each purchase, the most recent prior view by that user.
# Spark lacks ASOF JOIN; the scalable formulation is union + one window
# pass (single shuffle by user_id), NOT a theta join (quadratic).
# DuckDB oracles it with its native ASOF LEFT JOIN.
# --------------------------------------------------------------------------

_QASOF_ORACLE = """
SELECT
  p.event_id                                   AS purchase_id,
  p.user_id                                    AS user_id,
  v.event_id                                   AS view_id,
  CASE WHEN v.event_id IS NULL THEN NULL
       ELSE epoch_us(p.ts) - epoch_us(v.ts)
  END                                          AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""


@register(
    "q_join_asof",
    oracle=_QASOF_ORACLE,
    description="as-of join via union+window (one shuffle), DuckDB ASOF oracle",
    tags=("join", "asof"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("src_id"),
        F.lit(0).alias("kind"),  # views sort before purchases at equal ts
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("src_id"), F.lit(1).alias("kind")
    )
    merged = views.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "src_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_view_id = F.last(
        F.when(F.col("kind") == 0, F.col("src_id")), ignorenulls=True
    ).over(w)
    last_view_ts = F.last(
        F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        merged.withColumn("view_id", last_view_id)
        .withColumn("view_ts", last_view_ts)
        .filter(F.col("kind") == 1)
        .select(
            F.col("src_id").alias("purchase_id"),
            "user_id",
            "view_id",
            (F.unix_micros("ts") - F.unix_micros("view_ts")).alias("gap_us"),
        )
    )


# --------------------------------------------------------------------------
# Self join via aliases: parts sharing brand+type with a different size.
# --------------------------------------------------------------------------

_QSELF_ORACLE = """
SELECT
  a.p_brand                      AS p_brand,
  a.p_type                       AS p_type,
  COUNT(*)                       AS n_pairs
FROM part a
JOIN part b
  ON a.p_brand = b.p_brand AND a.p_type = b.p_type
 AND a.p_partkey < b.p_partkey
GROUP BY a.p_brand, a.p_type
"""


@register(
    "q_join_self",
    oracle=_QSELF_ORACLE,
    description="self equi join with inequality pair dedup",
    tags=("join", "self"),
)
def q_join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_type") == F.col("b.p_type"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .groupBy(F.col("a.p_brand").alias("p_brand"), F.col("a.p_type").alias("p_type"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


_QNULLSAFE_ORACLE = """
WITH o AS (
  SELECT o_orderkey, NULLIF(o_custkey % 50, 0) AS bucket, o_totalprice
  FROM orders WHERE o_orderkey < 2000
),
c AS (
  SELECT NULLIF(c_custkey % 50, 0) AS bucket, COUNT(*) AS n_cust
  FROM customer GROUP BY bucket
)
SELECT o.o_orderkey, o.bucket, c.n_cust
FROM o JOIN c ON o.bucket IS NOT DISTINCT FROM c.bucket
"""


@register(
    "q_join_null_safe",
    oracle=_QNULLSAFE_ORACLE,
    description="null-safe equality join (<=> / IS NOT DISTINCT FROM)",
    tags=("join", "null_safe"),
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eqNullSafe treats NULL keys as equal — a real join key domain
    (bucket 0 nulled on both sides) would silently drop those rows under
    plain equality. Still hash-joinable: Catalyst keeps <=> as an equi
    key, so no fallback to BNLJ at scale."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        F.nullif(F.col("o_custkey") % 50, F.lit(0)).alias("bucket"),
        "o_totalprice",
    )
    c = (
        table(spark, sf_dir, "customer")
        .select(F.nullif(F.col("c_custkey") % 50, F.lit(0)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_cust"))
    )
    return o.join(c, o.bucket.eqNullSafe(c.bucket)).select(
        "o_orderkey", o.bucket.alias("bucket"), "n_cust"
    )


_QRIGHT_ORACLE = """
SELECT c_mktsegment,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT)          AS n_rows
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register(
    "q_join_right_outer",
    oracle=_QRIGHT_ORACLE,
    description="right outer join: customers kept, orderless rows surface as NULLs",
    tags=("join", "right", "outer"),
)
def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer = left outer with sides swapped, but registered in its
    own right because the NULL-extension semantics differ per side and
    the COUNT(col)-vs-COUNT(*) distinction over the null-extended rows is
    the classic correctness trap. Shuffle join on custkey; at scale both
    sides are fact-sized so neither is broadcast."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"), "right_outer")
        .groupBy("c_mktsegment")
        .agg(
            F.count("o_orderkey").cast("bigint").alias("n_orders"),
            F.count("*").cast("bigint").alias("n_rows"),
        )
    )
