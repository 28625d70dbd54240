"""Spark 4 collation support: case-insensitive grouping/equality via
``COLLATE UNICODE_CI``.

Collated comparison is a Spark 4 headline SQL feature (string columns
carrying a collation that changes =, GROUP BY, ORDER BY, and join
semantics engine-side, without lower()-normalizing the data). The query
derives a mixed-case column (upper or lower segment name, chosen by the
portable hash), groups it under UNICODE_CI, and proves the groups merge
case-insensitively. DuckDB has no column collations in the same form,
so the oracle expresses the identical SEMANTICS with
lower()-normalized grouping — equivalent for this ASCII domain; the
point under test is that Spark's collated GROUP BY produces exactly
those merged groups.

Scale: collation-aware grouping stays entirely JVM-side (no UDF
lowercasing), and the collation key participates in hash partitioning
like any other — no extra shuffle vs a plain groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60, sql_hash60
from ..registry import register
from ..tables import table

_CASE_HASH = sql_hash60("'case:' || CAST(c_custkey AS VARCHAR)")

_QCOLL_ORACLE = f"""
WITH mixed AS (
  SELECT CASE WHEN {_CASE_HASH} % 2 = 0
              THEN upper(c_mktsegment) ELSE lower(c_mktsegment) END AS seg,
         c_acctbal
  FROM customer
)
SELECT lower(seg) AS segment_ci,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_case_variants,
       FLOOR((SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) / 100.0e0) * 1e2 + 0.5) / 1e2
         AS total_bal
FROM mixed
GROUP BY lower(seg)
ORDER BY segment_ci
"""


@register(
    "q_collation_case_insensitive",
    oracle=_QCOLL_ORACLE,
    description=(
        "Spark 4 collations: GROUP BY a UNICODE_CI-collated mixed-case "
        "column merges case variants engine-side (oracle replays the "
        "semantics via lower())"
    ),
    tags=("scalar", "collation", "spark4", "aggregate"),
)
def q_collation_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    mixed = c.select(
        F.when(
            hash60(F.concat(F.lit("case:"), F.col("c_custkey").cast("string")))
            % 2
            == 0,
            F.upper("c_mktsegment"),
        )
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg"),
        "c_acctbal",
    )
    collated = mixed.select(
        F.expr("seg COLLATE UNICODE_CI").alias("seg_ci"),
        F.col("seg"),
        "c_acctbal",
    )
    return (
        collated.groupBy("seg_ci")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("seg").alias("n_case_variants"),
            (F.floor((F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long"))
                / F.lit(100.0)) * 1e2 + 0.5) / 1e2).alias("total_bal"),
        )
        .select(
            # the collated group key keeps an arbitrary representative's
            # case — normalize for cross-engine comparison
            F.lower(F.col("seg_ci").cast("string")).alias("segment_ci"),
            "n_rows",
            "n_case_variants",
            "total_bal",
        )
        .orderBy("segment_ci")
    )
