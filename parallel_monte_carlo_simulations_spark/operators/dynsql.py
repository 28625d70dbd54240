"""Dynamic SQL surface (Spark 4): EXECUTE IMMEDIATE, IDENTIFIER(),
session variables — safe metaprogramming without string splicing.

The administration/templating layer of a SQL platform: a statement
built at runtime (``EXECUTE IMMEDIATE ... USING``), object names bound
through ``IDENTIFIER()`` (parameterized and injection-safe, unlike
string concatenation), and session variables (``DECLARE VARIABLE`` /
``SET VAR``) carrying state between statements. Catalyst resolves the
dynamic pieces before optimization, so the executed plan is identical
to the static query — which is exactly what the oracle asserts: the
DuckDB side is the static SQL the dynamic statement resolves to.

The registered query drives all three features: a session variable
holds the table name, IDENTIFIER() dereferences it inside an EXECUTE
IMMEDIATE with positional USING parameters, and the result aggregates
orders by priority bucket above a parameterized price floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import table

_QDYNSQL_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_totalprice > 150000.0
GROUP BY o_orderpriority
"""


@register(
    "q_sql_dynamic_exec",
    oracle=_QDYNSQL_ORACLE,
    description=(
        "dynamic SQL: session variable -> IDENTIFIER() table reference "
        "inside EXECUTE IMMEDIATE with positional USING parameters — "
        "resolves to the identical static plan the oracle spells"
    ),
    tags=("sql", "dynamic", "execute-immediate", "identifier", "spark4"),
)
def q_sql_dynamic_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("_dynsql_orders")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE _dynsql_tbl STRING DEFAULT '_dynsql_orders'"
    )
    return spark.sql(
        """
        EXECUTE IMMEDIATE
        'SELECT o_orderpriority,
                CAST(COUNT(*) AS BIGINT) AS n_orders,
                CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                     AS DOUBLE) AS total_price
         FROM IDENTIFIER(_dynsql_tbl)
         WHERE o_totalprice > ?
         GROUP BY o_orderpriority'
        USING 150000.0
        """
    )
