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


# --------------------------------------------------------------------------
# t-closeness: distributional distance of each class's sensitive values.
# --------------------------------------------------------------------------

#: Release threshold on the total-variation distance.
T_REQUIRED = 0.4

_QTCLOSE_ORACLE = f"""
WITH cells AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
         c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer
  GROUP BY c_nationkey, bal_bucket, c_mktsegment
),
classes AS (
  SELECT c_nationkey, bal_bucket, CAST(SUM(n) AS BIGINT) AS class_size
  FROM cells GROUP BY c_nationkey, bal_bucket
),
gdist AS (
  SELECT c_mktsegment, CAST(SUM(n) AS BIGINT) AS g
  FROM cells GROUP BY c_mktsegment
),
tot AS (SELECT CAST(SUM(g) AS BIGINT) AS t FROM gdist),
grid AS (
  SELECT cl.c_nationkey, cl.bal_bucket, cl.class_size, g.c_mktsegment, g.g, t.t,
         COALESCE(ce.n, 0) AS n
  FROM classes cl
  CROSS JOIN gdist g CROSS JOIN tot t
  LEFT JOIN cells ce
    ON ce.c_nationkey = cl.c_nationkey AND ce.bal_bucket = cl.bal_bucket
   AND ce.c_mktsegment = g.c_mktsegment
),
terms AS (
  SELECT c_nationkey, bal_bucket, class_size,
         CAST(FLOOR((0.5 * ABS(CAST(n AS DOUBLE) / class_size
                              - CAST(g AS DOUBLE) / t)) * 1e10 + 0.5) / 1e10
              AS DECIMAL(24,10)) AS tq
  FROM grid
)
SELECT c_nationkey, bal_bucket,
       CAST(ANY_VALUE(class_size) AS BIGINT)  AS class_size,
       FLOOR((CAST(SUM(tq) AS DOUBLE)) * 1e6 + 0.5) / 1e6      AS t_closeness,
       CAST(SUM(tq) AS DOUBLE) <= {T_REQUIRED} AS releasable
FROM terms GROUP BY c_nationkey, bal_bucket
"""


@register(
    "q_privacy_t_closeness",
    oracle=_QTCLOSE_ORACLE,
    description=(
        "t-closeness audit (the step beyond k-anonymity/l-diversity): "
        "per quasi-identifier class, the total-variation distance "
        "between the class's sensitive-value distribution and the "
        "global one (categorical EMD), with the release decision at "
        f"t <= {T_REQUIRED} — missing sensitive values contribute their "
        "full global mass; DECIMAL-quantized per-cell terms"
    ),
    tags=("privacy", "t-closeness", "audit", "aggregate"),
)
def q_privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    cells = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_bucket"),
        "c_mktsegment",
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    classes = cells.groupBy("c_nationkey", "bal_bucket").agg(
        F.sum("n").cast("long").alias("class_size")
    )
    glob = cells.groupBy("c_mktsegment").agg(F.sum("n").cast("long").alias("g"))
    tot = glob.agg(F.sum("g").cast("long").alias("t"))
    # glob/tot are segment-dim-sized: true bounded broadcasts. The
    # grid is classes x segments; class counts left-join in so absent
    # segments score their full global mass.
    grid = (
        classes.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["c_nationkey", "bal_bucket", "c_mktsegment"], "left")
        .select(
            "c_nationkey",
            "bal_bucket",
            "class_size",
            "g",
            "t",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )
    tq = (F.floor((0.5
        * F.abs(
            F.col("n").cast("double") / F.col("class_size")
            - F.col("g").cast("double") / F.col("t")
        )) * 1e10 + 0.5) / 1e10).cast("decimal(24,10)")
    return (
        grid.select("c_nationkey", "bal_bucket", "class_size", tq.alias("tq"))
        .groupBy("c_nationkey", "bal_bucket")
        .agg(
            F.any_value("class_size").cast("long").alias("class_size"),
            (F.floor((F.sum("tq").cast("double")) * 1e6 + 0.5) / 1e6).alias("t_closeness"),
            (F.sum("tq").cast("double") <= T_REQUIRED).alias("releasable"),
        )
    )
