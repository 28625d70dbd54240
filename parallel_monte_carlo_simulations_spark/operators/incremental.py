"""Incremental view maintenance: partial-state merge == full recompute.

The foundation of materialized views and streaming upserts at scale: an
aggregate over (base + delta) must be computable by MERGING the base's
partial state with the delta's — never by rescanning the base. This
query runs the MERGE path in Spark (per-partition-of-time partial
states: count, sum, min, max, plus sum-of-squares for variance — all
algebraic/mergeable aggregates) while the oracle runs the FULL
RECOMPUTE over the union in DuckDB — the hash match IS the proof that
the merge semantics are exactly the recompute semantics, which is the
property incremental pipelines silently depend on.

Variance from merged states uses the sum-of-squares formula over exact
DECIMAL partial sums (mergeable and summation-order independent), then
converts to double once — the same money/decimal discipline as
q_abc_pareto.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_CUT = "2024-01-15"

_QINC_ORACLE = f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT)   AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
       MIN(value)                 AS value_min,
       MAX(value)                 AS value_max,
       -- engines derive different decimal precision for the product
       -- (Spark's allowPrecisionLoss trims scale), so the square sum
       -- converts to double ~1e-9 apart: quantize at 4 decimals
       FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,6))
                * CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             * 10000 + 0.5e0) / 10000 AS value_sq_sum
FROM events
GROUP BY event_type
"""


def _partial(df: DataFrame) -> DataFrame:
    v = F.col("value").cast("decimal(18,6)")
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.sum(v * v).alias("sq"),
    )


@register(
    "q_incremental_agg_maintenance",
    oracle=_QINC_ORACLE,
    description=(
        "incremental view maintenance: base and delta partial aggregate "
        "states MERGED (never rescanning the base) must equal the full "
        "recompute the oracle runs — count/sum/min/max/sum-of-squares "
        "over exact decimal partials"
    ),
    tags=("incremental", "aggregate", "materialized_view", "warehouse"),
)
def q_incremental_agg_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = table(spark, sf_dir, "events")
    base = _partial(e.filter(F.col("ts") < _CUT))
    delta = _partial(e.filter(F.col("ts") >= _CUT))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
            F.sum("sq").alias("sq"),
        )
    )
    return merged.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.col("s").cast("double").alias("value_sum"),
        F.col("mn").alias("value_min"),
        F.col("mx").alias("value_max"),
        (F.floor(F.col("sq").cast("double") * 10000 + 0.5) / 10000).alias(
            "value_sq_sum"
        ),
    )
