"""Window functions: rank/top-k per group, running aggregates, lag/lead,
ntile, moving frames.

All window orderings carry a unique tiebreaker column so results are
deterministic across engines (row_number over a non-unique ordering is
otherwise free to differ between Spark and DuckDB).

Scale note: each query is one shuffle (the window partition key). Top-k
per group via row_number + filter lets AQE prune early; no driver-side
collection anywhere.
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
# row_number: top-3 orders per customer.
# --------------------------------------------------------------------------

_QRANK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT
    o_custkey, o_orderkey, o_totalprice,
    CAST(row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
    ) AS INTEGER) AS rk
  FROM orders
)
WHERE rk <= 3
"""


@register(
    "q_window_topk_per_group",
    oracle=_QRANK_ORACLE,
    description="row_number window + filter = per-group top-k",
    tags=("window", "topk"),
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


# --------------------------------------------------------------------------
# rank / dense_rank semantics difference on real ties (same acctbal).
# --------------------------------------------------------------------------

_QRANKS_ORACLE = """
SELECT
  c_custkey,
  c_nationkey,
  c_acctbal,
  CAST(rank()       OVER w AS INTEGER) AS rnk,
  CAST(dense_rank() OVER w AS INTEGER) AS drnk
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY ROUND(c_acctbal, 0) DESC, c_custkey)
"""


@register(
    "q_window_rank_dense",
    oracle=_QRANKS_ORACLE,
    description="rank vs dense_rank over per-nation account balances",
    tags=("window", "rank"),
)
def q_window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.round("c_acctbal", 0).desc(), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


# --------------------------------------------------------------------------
# Running (cumulative) sum per customer over order date.
# --------------------------------------------------------------------------

_QRUN_ORACLE = f"""
WITH r AS (
  SELECT
    o_custkey,
    o_orderkey,
    strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
    SUM({units_sql("o_totalprice", 2)}) OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS spend_u2
  FROM orders
)
SELECT o_custkey, o_orderkey, orderdate,
       {rdiv_halfup_duck("spend_u2", "100", 2)} AS running_spend
FROM r
"""


@register(
    "q_window_running_sum",
    oracle=_QRUN_ORACLE,
    description="cumulative sum window (unbounded preceding frame)",
    tags=("window", "running"),
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.sum(units_col(F.col("o_totalprice"), 2)).over(w).alias("spend_u2"),
    ).select(
        "o_custkey",
        "o_orderkey",
        "orderdate",
        rdiv_halfup_expr("spend_u2", "100", 2).alias("running_spend"),
    )


# --------------------------------------------------------------------------
# lag/lead: days between consecutive orders of a customer.
# --------------------------------------------------------------------------

_QLAG_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  CAST(datediff('day', lag(o_orderdate) OVER w, o_orderdate) AS INTEGER)  AS days_since_prev,
  lead(o_orderkey) OVER w                                                 AS next_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register(
    "q_window_lag_lead",
    oracle=_QLAG_ORACLE,
    description="lag/lead: inter-order gaps and next-order lookahead",
    tags=("window", "lag"),
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
        ).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


# --------------------------------------------------------------------------
# ntile: quartile bucketing of customers by balance.
# --------------------------------------------------------------------------

_QNTILE_ORACLE = """
SELECT
  quartile,
  COUNT(*)                    AS n_customers,
  FLOOR((MIN(c_acctbal)) * 1e2 + 0.5) / 1e2    AS min_bal,
  FLOOR((MAX(c_acctbal)) * 1e2 + 0.5) / 1e2    AS max_bal
FROM (
  SELECT
    c_acctbal,
    CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile
  FROM customer
)
GROUP BY quartile
"""


@register(
    "q_window_ntile",
    oracle=_QNTILE_ORACLE,
    description="ntile quartiles + per-bucket aggregate",
    tags=("window", "ntile"),
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) via the range-bucketed rank kernel + closed-form
    sql_ntile (round 11) — identical quartile cuts to the oracle's
    window form, no single-partition global sort."""
    from .rankstats import bucketed_running, sql_ntile

    c = table(spark, sf_dir, "customer")
    nt = c.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    ranked = bucketed_running(
        c.select("c_acctbal", "c_custkey"),
        axis="c_acctbal",
        order=[F.asc("c_acctbal"), F.asc("c_custkey")],
        cums={"rank": F.lit(1)},
    )
    return (
        ranked.crossJoin(F.broadcast(nt))
        .select(
            "c_acctbal",
            sql_ntile(F.col("rank"), F.col("n_all"), 4).alias("quartile"),
        )
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.floor((F.min("c_acctbal")) * 1e2 + 0.5) / 1e2).alias("min_bal"),
            (F.floor((F.max("c_acctbal")) * 1e2 + 0.5) / 1e2).alias("max_bal"),
        )
    )


# --------------------------------------------------------------------------
# Moving frame: 3-row trailing average of daily revenue.
# --------------------------------------------------------------------------

_QMOV_ORACLE = f"""
WITH daily AS (
  SELECT
    strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS order_day,
    SUM({units_sql("o_totalprice", 2)})          AS day_u2
  FROM orders
  GROUP BY order_day
)
SELECT
  order_day,
  {rdiv_halfup_duck("day_u2", "100", 2)} AS day_total,
  {rdiv_halfup_duck(
      "SUM(day_u2) OVER (ORDER BY order_day "
      "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",
      "100 * COUNT(*) OVER (ORDER BY order_day "
      "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",
      2,
  )} AS trailing3_avg
FROM daily
"""


@register(
    "q_window_moving_avg",
    oracle=_QMOV_ORACLE,
    description="bounded ROWS frame: 3-day trailing average",
    tags=("window", "frame"),
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_format(F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd").alias("order_day")
    ).agg(F.sum(units_col(F.col("o_totalprice"), 2)).alias("day_u2"))
    w = Window.orderBy("order_day").rowsBetween(-2, Window.currentRow)
    return daily.select(
        "order_day",
        F.sum("day_u2").over(w).alias("win_u2"),
        F.count(F.lit(1)).over(w).alias("win_n"),
        "day_u2",
    ).select(
        "order_day",
        rdiv_halfup_expr("day_u2", "100", 2).alias("day_total"),
        rdiv_halfup_expr("win_u2", "100 * win_n", 2).alias("trailing3_avg"),
    )


# --------------------------------------------------------------------------
# first/last value over a frame: cheapest & priciest item per order.
# --------------------------------------------------------------------------

_QFL_ORACLE = """
SELECT DISTINCT
  l_orderkey,
  first_value(l_partkey) OVER w AS cheapest_part,
  last_value(l_partkey)  OVER w AS priciest_part
FROM lineitem
WINDOW w AS (
  PARTITION BY l_orderkey ORDER BY l_extendedprice, l_linenumber
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""


@register(
    "q_window_first_last",
    oracle=_QFL_ORACLE,
    description="first_value/last_value over full-partition frame",
    tags=("window", "first_last"),
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_extendedprice", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return l.select(
        "l_orderkey",
        F.first("l_partkey").over(w).alias("cheapest_part"),
        F.last("l_partkey").over(w).alias("priciest_part"),
    ).distinct()


# --------------------------------------------------------------------------
# cume_dist + nth_value: the remaining ranked-window surface (round 10).
# --------------------------------------------------------------------------

_QCUME_ORACLE = f"""
WITH r AS (
  SELECT o_orderkey,
         o_orderpriority,
         COUNT(*) OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice
                        RANGE BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)                   AS cum_le,
         COUNT(*) OVER (PARTITION BY o_orderpriority)      AS n_prio,
         nth_value(o_orderkey, 3) OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS third_cheapest_order
  FROM orders
)
SELECT o_orderkey,
       o_orderpriority,
       {rdiv_halfup_duck("cum_le", "n_prio", 6)} AS price_cume_dist,
       third_cheapest_order
FROM r
"""


@register(
    "q_window_cume_dist",
    oracle=_QCUME_ORACLE,
    description=(
        "cume_dist (tie-aware cumulative distribution of order value "
        "within priority class) + nth_value over the full-partition "
        "frame — completes the ranked-window surface alongside "
        "percent_rank/ntile/rank"
    ),
    tags=("window", "cume_dist", "nth_value"),
)
def q_window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle's window form partitions by o_orderpriority — 5
    distinct values, so at 100 TB the whole orders table serializes
    through 5 window partitions. The engine computes the identical
    tie-aware cume_dist two-pass (round 11): per-(priority, price)
    counts, cumulative over price via the range-bucketed kernel
    (rankstats.py; parallelism = 5 x n_buckets), joined back — cume =
    rows_le / n_priority, exactly cume_dist's definition. nth_value(3)
    is a local-then-global top-3: row_number <= 3 within each
    (priority, bucket) shrinks candidates to <= 3 x n_buckets per
    priority before the tiny global pick."""
    o = table(spark, sf_dir, "orders")
    from .rankstats import BUCKET_COL, bucketed_running, with_range_bucket

    byval = o.groupBy("o_orderpriority", "o_totalprice").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cum = bucketed_running(
        byval,
        axis="o_totalprice",
        order=[F.col("o_totalprice").asc()],
        cums={"cum_le": F.col("cnt")},
        partition_by=("o_orderpriority",),
    )
    nprio = F.broadcast(
        o.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("long").alias("n_prio")
        )
    )
    # third-cheapest (price, orderkey) per priority: local top-3 per
    # range bucket, then the global pick over <= 3 x n_buckets rows.
    slim = o.select("o_orderpriority", "o_totalprice", "o_orderkey")
    bucketed = with_range_bucket(
        slim, "o_totalprice", partition_by=("o_orderpriority",)
    )
    wloc = Window.partitionBy("o_orderpriority", BUCKET_COL).orderBy(
        "o_totalprice", "o_orderkey"
    )
    cand = bucketed.withColumn("lrn", F.row_number().over(wloc)).filter(
        F.col("lrn") <= 3
    )
    wglob = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    third = F.broadcast(
        cand.withColumn("grn", F.row_number().over(wglob))
        .filter(F.col("grn") == 3)
        .select(
            "o_orderpriority",
            F.col("o_orderkey").alias("third_cheapest_order"),
        )
    )
    return (
        o.join(
            cum.select("o_orderpriority", "o_totalprice", "cum_le"),
            ["o_orderpriority", "o_totalprice"],
        )
        .join(nprio, "o_orderpriority")
        .join(third, "o_orderpriority", "left")
        .select(
            "o_orderkey",
            "o_orderpriority",
            rdiv_halfup_expr("cum_le", "n_prio", 6).alias("price_cume_dist"),
            "third_cheapest_order",
        )
    )
