"""SQL UDFs (Spark 4): CREATE FUNCTION with a SQL body — scalar and
table-valued, exercised through a correlated LATERAL call.

Spark 4 lets users package logic as catalog functions whose body is
pure SQL: scalar (``RETURNS DOUBLE RETURN expr``) and table-valued
(``RETURNS TABLE(...) RETURN SELECT ...``), callable from any query,
including LATERAL-correlated positions. Because the body is SQL,
Catalyst INLINES it — the optimized plan is identical to hand-written
SQL (no black-box UDF barrier, full pushdown/codegen), which is what
makes SQL UDFs the right abstraction tool at 100 TB where a Python UDF
in the same position would serialize every row.

The registered query creates a scalar ``net_price`` and a table UDF
``cust_orders`` and evaluates, per customer below a key bound, the
order count and discounted revenue through a correlated LATERAL call.
The DuckDB oracle writes the INLINED equivalent — passing is exactly
the inlining guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QSQLUDF_ORACLE = """
SELECT c.c_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(FLOOR((SUM(CAST(FLOOR((o.o_totalprice * (1.0 - 0.05)) * 1e4 + 0.5) / 1e4
                           AS DECIMAL(18,4)))) * 1e2 + 0.5) / 1e2 AS DOUBLE) AS disc_total
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
WHERE c.c_custkey < 50
GROUP BY c.c_custkey
"""


@register(
    "q_sql_udf_surface",
    oracle=_QSQLUDF_ORACLE,
    description=(
        "Spark 4 SQL UDFs: scalar (RETURN expr) + table-valued "
        "(RETURNS TABLE) functions called through a correlated LATERAL "
        "— Catalyst inlines the SQL bodies, so the oracle is the "
        "hand-inlined equivalent"
    ),
    tags=("sql", "udf", "sql-udf", "lateral", "spark4"),
)
def q_sql_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("_sqludf_orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("_sqludf_customer")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION _sqludf_net_price("
        "p DOUBLE, d DOUBLE) RETURNS DOUBLE RETURN FLOOR((p * (1.0 - d)) * 1e4 + 0.5) / 1e4"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION _sqludf_cust_orders(ck BIGINT)"
        " RETURNS TABLE(o_orderkey BIGINT, o_totalprice DOUBLE)"
        " RETURN SELECT o_orderkey, o_totalprice"
        " FROM _sqludf_orders WHERE o_custkey = ck"
    )
    return spark.sql(
        """
        SELECT c.c_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(FLOOR((SUM(CAST(_sqludf_net_price(t.o_totalprice, 0.05)
                                   AS DECIMAL(18,4)))) * 1e2 + 0.5) / 1e2 AS DOUBLE)
                 AS disc_total
        FROM _sqludf_customer c, LATERAL _sqludf_cust_orders(c.c_custkey) t
        WHERE c.c_custkey < 50
        GROUP BY c.c_custkey
        """
    )
