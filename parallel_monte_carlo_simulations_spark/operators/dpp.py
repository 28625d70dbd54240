"""Dynamic partition pruning (DPP) over a hive-partitioned fact table.

The single biggest scan-cost lever at 100 TB: when a partitioned fact
joins a filtered dimension on the partition column, Spark injects a
runtime subquery that evaluates the dim side FIRST and prunes fact
partitions before the scan — the fact never reads years the dim filter
rejected, even though those years are unknown at compile time.

The dim filter here is on a NON-key attribute (order volume), so the
predicate cannot be statically folded onto the partition column by
constraint propagation (``InferFiltersFromConstraints``) — the pruning
genuinely happens at runtime. ``tests/test_plans.py`` asserts the
``dynamicpruningexpression`` on the fact scan.

Scale notes: the partitioned write is this query's setup step (a real
engine would already store the fact partitioned by date); the dim side
is a broadcast-sized aggregate of partition statistics. At 100 TB the
pruned scan reads |selected partitions| / |partitions| of the fact —
the plan property the test pins is exactly what makes that happen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QDPP_ORACLE = """
WITH fact AS (
  SELECT year(o_orderdate) AS o_year,
         o_orderpriority,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
dim AS (
  SELECT o_year,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, o_year)
           AS volume_rank
  FROM fact GROUP BY o_year
),
busy AS (
  SELECT o_year FROM dim WHERE volume_rank <= 3
)
SELECT f.o_year,
       f.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       FLOOR((CAST(SUM(f.cents) AS DOUBLE) / 100.0e0) * 1e2 + 0.5) / 1e2 AS revenue
FROM fact f JOIN busy b ON b.o_year = f.o_year
GROUP BY f.o_year, f.o_orderpriority
ORDER BY f.o_year, f.o_orderpriority
"""


def dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the partitioned-fact ⋈ filtered-dim join (shared by the
    registered query and the plan test, which asserts the runtime
    ``dynamicpruningexpression`` on the fact scan)."""
    from ..sources.roundtrip import _tmpdir

    o = table(spark, sf_dir, "orders")
    fact_path = _tmpdir("dpp_fact")
    (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
            F.year("o_orderdate").alias("o_year"),
        )
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)

    # Dim: per-year order volume with the rank MATERIALIZED, so the
    # read-back filter (volume_rank <= 3) is a literal predicate over a
    # plain scan — the shape PartitionPruning requires on the build
    # side. The predicate is on a NON-key attribute, so constraint
    # propagation cannot fold it onto the partition column statically;
    # only the runtime DPP subquery can restrict the fact scan.
    dim_path = _tmpdir("dpp_dim")
    (
        fact.groupBy("o_year")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .withColumn(
            "volume_rank",
            F.row_number().over(
                Window.orderBy(F.col("n_orders").desc(), F.col("o_year"))
            ),
        )
        .write.mode("overwrite")
        .parquet(dim_path)
    )
    busy = (
        spark.read.parquet(dim_path)
        .where(F.col("volume_rank") <= 3)
        .select("o_year")
    )
    return fact.join(F.broadcast(busy), "o_year")


@register(
    "q_dpp_partition_prune",
    oracle=_QDPP_ORACLE,
    description=(
        "dynamic partition pruning: year-partitioned fact joined to a "
        "volume-filtered dim on the partition column; the fact scan is "
        "pruned at runtime by the dim subquery (plan-asserted)"
    ),
    tags=("dpp", "partition-pruning", "join", "warehouse", "scale", "plan"),
)
def q_dpp_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    joined = dpp_join(spark, sf_dir)
    return (
        joined.groupBy("o_year", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            (F.floor((F.sum("cents").cast("double") / 100.0) * 1e2 + 0.5) / 1e2).alias(
                "revenue"
            ),
        )
        .orderBy("o_year", "o_orderpriority")
    )
