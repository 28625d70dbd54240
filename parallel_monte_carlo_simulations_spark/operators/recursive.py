"""Recursive CTE (Spark 4 ``WITH RECURSIVE``) — sequential recurrences.

Spark 4 ships ANSI recursive common table expressions (UNION ALL form;
the engine executes a UnionLoop that re-feeds each iteration's output as
the next iteration's input). The registered query uses them for a
computation that windows genuinely CANNOT express: a clamped running
balance — ``bal_k = LEAST(bal_{k-1} + order_cents, cap)`` — where the
per-step clamp makes the recurrence non-linear, so no prefix-sum
rewrite exists.

The recursion is SET-BASED, which is the 100 TB shape: one iteration
per order RANK, with ALL customers advancing in lockstep per iteration
(a hash join per level on the customer key), so the iteration count is
the maximum orders-per-customer (~tens), not the row count. This is the
same synchronized-frontier discipline as the hand-built BFS in
``operators/graph.py`` — the recursive CTE is the declarative spelling
of it.

Determinism: the entire recurrence is INTEGER (cents, LEAST against an
integer cap) — no float ever enters the loop — and DuckDB runs the
byte-identical SQL text as the oracle, so the result is exact by
construction.

Engine limits honored: Spark does not yet support the deduplicating
``UNION`` form inside recursion (so cyclic-graph closure is out —
that's what the iterative BFS/CC operators are for), and recursion
depth is capped (default 100 levels) — orders-per-customer maxes well
below that at every TPC-H SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import table

BAL_CAP_CENTS = 50_000_000


def _sql(orders: str, customer: str) -> str:
    return f"""
WITH RECURSIVE ranked AS (
  SELECT o_custkey AS cust,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rk
  FROM {orders}
),
walk(cust, rk, bal) AS (
  SELECT cust, rk, LEAST(cents, {BAL_CAP_CENTS}) FROM ranked WHERE rk = 1
  UNION ALL
  SELECT r.cust, r.rk, LEAST(w.bal + r.cents, {BAL_CAP_CENTS})
  FROM walk w JOIN ranked r ON r.cust = w.cust AND r.rk = w.rk + 1
),
fin AS (
  SELECT cust, bal FROM (
    SELECT cust, bal,
           ROW_NUMBER() OVER (PARTITION BY cust ORDER BY rk DESC) AS rr
    FROM walk
  ) WHERE rr = 1
)
SELECT c.c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(f.bal) AS BIGINT) AS total_balance_cents,
       CAST(MAX(f.bal) AS BIGINT) AS max_balance_cents
FROM fin f JOIN {customer} c ON c.c_custkey = f.cust
GROUP BY c.c_mktsegment ORDER BY seg
"""


@register(
    "q_sql_recursive_balance",
    oracle=_sql("orders", "customer"),
    description=(
        "WITH RECURSIVE clamped running balance per customer (integer "
        "cents, LEAST cap each step — not window-expressible); set-based "
        "recursion advancing all customers per rank level"
    ),
    tags=("sql", "recursive-cte", "iterative", "spark4"),
)
def q_sql_recursive_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_rec_src")
    table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_rec_src"
    )
    return spark.sql(_sql("orders_rec_src", "customer_rec_src"))
