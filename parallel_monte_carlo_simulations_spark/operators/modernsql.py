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


_QPIPE_ORACLE = """
SELECT li.l_returnflag, o.o_orderpriority,
       CAST(SUM(CAST(ROUND(li.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem li JOIN orders o ON o.o_orderkey = li.l_orderkey
WHERE li.l_quantity > 10 AND o.o_orderstatus = 'F'
GROUP BY li.l_returnflag, o.o_orderpriority
ORDER BY li.l_returnflag, o.o_orderpriority
LIMIT 8
"""


@register(
    "q_sql_pipe_syntax",
    oracle=_QPIPE_ORACLE,
    description=(
        "SQL pipe syntax (FROM ... |> WHERE |> EXTEND |> JOIN |> "
        "AGGREGATE |> ORDER BY |> LIMIT) — Spark 4's linear query form; "
        "oracle is the equivalent standard SQL"
    ),
    tags=("sql", "pipe-syntax", "spark4"),
)
def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ships the GoogleSQL-style pipe operators: each |> stage
    consumes the previous relation, so the query reads top-to-bottom in
    execution order — the linear form analysts increasingly expect. The
    chain below exercises the main stages (filter, computed-column
    EXTEND, join, grouped AGGREGATE, order, limit); Catalyst plans it
    identically to the nested standard form, which is exactly what the
    standard-SQL DuckDB oracle checks. The LIMIT boundary is
    deterministic: the ORDER BY covers the full (unique) grouping key."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_pipe_src"
    )
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_pipe_src")
    return spark.sql("""
    FROM lineitem_pipe_src li
    |> WHERE l_quantity > 10
    |> EXTEND CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
    |> JOIN orders_pipe_src o ON o.o_orderkey = li.l_orderkey
    |> WHERE o.o_orderstatus = 'F'
    |> AGGREGATE CAST(SUM(cents) AS BIGINT) AS total_cents,
                 CAST(COUNT(*) AS BIGINT) AS n_rows
       GROUP BY l_returnflag, o.o_orderpriority
    |> ORDER BY l_returnflag, o_orderpriority
    |> LIMIT 8
    """)
