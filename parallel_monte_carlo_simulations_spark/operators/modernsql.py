"""Modern SQL-surface parity: GROUP BY ALL, ORDER BY ALL, lateral
column aliases, and named-parameter queries.

Two registered queries:

- ``q_sql_modern_surface`` runs a BYTE-IDENTICAL SQL text in Spark and
  DuckDB: ``GROUP BY ALL`` infers the grouping keys, ``ORDER BY ALL``
  orders by every output column, and the outer projection chains
  LATERAL column aliases (``sum_qty_x2`` referencing ``sum_qty``, then
  ``combo`` referencing ``sum_qty_x2``) — the conveniences analysts
  actually type. (Boundary honored: Spark does not yet allow a lateral
  alias to feed GROUP BY ALL, so the aliases live in a post-aggregation
  projection.)
- ``q_sql_parameterized`` exercises Spark 4's named-parameter binding
  (``spark.sql(text, args={...})`` with ``:name`` markers) — the
  injection-safe way to template queries; the oracle inlines the same
  literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import table

_MODERN_SQL = """
WITH base AS (
  SELECT l_returnflag, l_linestatus,
         CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM {li} GROUP BY ALL
)
SELECT l_returnflag, l_linestatus, sum_qty,
       sum_qty * 2 AS sum_qty_x2,
       sum_qty_x2 + n_rows AS combo,
       n_rows
FROM base ORDER BY ALL
"""


@register(
    "q_sql_modern_surface",
    oracle=_MODERN_SQL.format(li="lineitem"),
    description=(
        "GROUP BY ALL / ORDER BY ALL / chained lateral column aliases — "
        "byte-identical SQL text runs in both engines"
    ),
    tags=("sql", "group-by-all", "lateral-alias", "spark4"),
)
def q_sql_modern_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_modern_src"
    )
    return spark.sql(_MODERN_SQL.format(li="lineitem_modern_src"))


_PARAMS = {"seg": "BUILDING", "pmin": 100_000.0}

_QPARAM_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_totalprice > 100000.0
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register(
    "q_sql_parameterized",
    oracle=_QPARAM_ORACLE,
    description=(
        "named-parameter SQL (spark.sql args with :name markers): "
        "segment + price-threshold filter, oracle inlines the literals"
    ),
    tags=("sql", "parameterized", "spark4"),
)
def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_param_src")
    table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_param_src"
    )
    return spark.sql(
        """
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders_param_src o
        JOIN customer_param_src c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment = :seg AND o.o_totalprice > :pmin
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
        """,
        args=_PARAMS,
    )
