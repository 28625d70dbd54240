"""l-diversity audit: the companion to k-anonymity.

k-anonymity (``privacy.py``) bounds how small a quasi-identifier
equivalence class may be; l-diversity additionally requires each class
to contain at least ``l`` DISTINCT sensitive values — a k-anonymous
class whose members all share one sensitive value still leaks it
(homogeneity attack). The audit reports the distribution of
distinct-sensitive counts across classes plus the release decision per
class size, which is what an anonymization pipeline gates on before
publishing.

Relational shape (the whole audit is two hash aggregations):
group by (QI, sensitive) -> group by QI with COUNT + COUNT(DISTINCT)
via the pre-aggregated inner relation -> histogram over the diversity
level. Exact integers everywhere; scales as a plain two-level
aggregation with map-side partials at any data size.

QI here: (c_nationkey, account-balance kilo-bucket); sensitive:
c_mktsegment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Required diversity level for the release decision.
L_REQUIRED = 3

_QLDIV_ORACLE = f"""
WITH cells AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
         c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer
  GROUP BY c_nationkey, bal_bucket, c_mktsegment
),
classes AS (
  SELECT c_nationkey, bal_bucket,
         CAST(SUM(n) AS BIGINT) AS class_size,
         CAST(COUNT(*) AS BIGINT) AS l_distinct
  FROM cells
  GROUP BY c_nationkey, bal_bucket
)
SELECT l_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(class_size) AS BIGINT) AS n_rows,
       CAST(MIN(class_size) AS BIGINT) AS min_class_size,
       l_distinct >= {L_REQUIRED} AS releasable
FROM classes
GROUP BY l_distinct
ORDER BY l_distinct
"""


@register(
    "q_privacy_l_diversity",
    oracle=_QLDIV_ORACLE,
    description=(
        "l-diversity audit over (nation, balance-bucket) quasi-"
        "identifier classes with c_mktsegment sensitive: distribution "
        "of distinct-sensitive counts per class and the l>=3 release "
        "decision — two stacked hash aggregations, exact integers"
    ),
    tags=("privacy", "l-diversity", "data-quality", "aggregation"),
)
def q_privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    cells = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_bucket"),
        "c_mktsegment",
    ).agg(F.count("*").cast("long").alias("n"))
    classes = cells.groupBy("c_nationkey", "bal_bucket").agg(
        F.sum("n").cast("long").alias("class_size"),
        F.count("*").cast("long").alias("l_distinct"),
    )
    return (
        classes.groupBy("l_distinct")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.sum("class_size").cast("long").alias("n_rows"),
            F.min("class_size").cast("long").alias("min_class_size"),
        )
        .select(
            "l_distinct",
            "n_classes",
            "n_rows",
            "min_class_size",
            (F.col("l_distinct") >= L_REQUIRED).alias("releasable"),
        )
        .orderBy("l_distinct")
    )
