"""Set operations: UNION ALL, UNION (distinct), INTERSECT, EXCEPT."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QUNION_ORACLE = """
SELECT custkey, src, COUNT(*) AS n
FROM (
  SELECT o_custkey AS custkey, 'big'    AS src FROM orders WHERE o_totalprice > 250000
  UNION ALL
  SELECT o_custkey AS custkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
)
GROUP BY custkey, src
"""


@register(
    "q_union_all",
    oracle=_QUNION_ORACLE,
    description="UNION ALL of two filtered scans + aggregate",
    tags=("setops", "union"),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 250000).select(
        F.col("o_custkey").alias("custkey"), F.lit("big").alias("src")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey"), F.lit("urgent").alias("src")
    )
    return big.unionByName(urgent).groupBy("custkey", "src").agg(
        F.count(F.lit(1)).alias("n")
    )


_QINTERSECT_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


@register(
    "q_intersect",
    oracle=_QINTERSECT_ORACLE,
    description="INTERSECT (distinct) of two key sets",
    tags=("setops", "intersect"),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 250000).select(
        F.col("o_custkey").alias("custkey")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return big.intersect(urgent)


_QEXCEPT_ORACLE = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
"""


@register(
    "q_except",
    oracle=_QEXCEPT_ORACLE,
    description="EXCEPT (distinct): building customers minus big spenders",
    tags=("setops", "except"),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    big = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    # subtract == EXCEPT DISTINCT (exceptAll would keep multiset residues)
    return building.subtract(big)


_QEXCEPT_ALL_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_totalprice > 250000
"""


@register(
    "q_except_all",
    oracle=_QEXCEPT_ALL_ORACLE,
    description="EXCEPT ALL: multiset difference preserving residual multiplicity",
    tags=("setops", "except", "multiset"),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag semantics: a customer with 3 urgent orders and 1 expensive one
    keeps 2 residual rows — the multiplicity arithmetic DISTINCT-based
    except() erases. Same shuffle shape as except (hash on the row)."""
    o = table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    big = o.filter(F.col("o_totalprice") > 250000).select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.exceptAll(big)


_QINTERSECT_ALL_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_totalprice > 250000
"""


@register(
    "q_intersect_all",
    oracle=_QINTERSECT_ALL_ORACLE,
    description="INTERSECT ALL: multiset intersection (min multiplicity)",
    tags=("setops", "intersect", "multiset"),
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    big = o.filter(F.col("o_totalprice") > 250000).select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.intersectAll(big)
