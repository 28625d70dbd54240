"""SCD2 point-in-time lookup — the consumption side of the slowly
changing dimension.

``q_scd2_history`` BUILDS the versioned dimension; this query USES it:
"what was each user's attribute AS OF time T?" — the join every fact
table makes against an SCD2 dimension
(``fact.ts BETWEEN dim.from AND dim.to``). Expressed as a filter on
the validity interval (from <= T < to, open-ended current rows
included), which needs no join at all when T is a literal — the range
predicate prunes each user's history to exactly one version. A second
probe at a later T demonstrates the time travel.

All comparisons are exact epoch microseconds. Scale: the interval
filter runs codegen-side on the versioned dimension; for a fact-side
as-of with per-row timestamps this becomes the banded range join of
``q_join_range_binned`` — both shapes are covered in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: the two probe instants (mid-January / mid-month-2 of the event span)
T1 = "2024-01-10 00:00:00"
T2 = "2024-01-25 00:00:00"

_QSCD2LOOKUP_ORACLE = f"""
WITH hist AS (
  SELECT user_id, event_type AS attribute,
         epoch_us(ts) AS from_us,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_us
  FROM events
),
probes AS (
  SELECT 1 AS probe, epoch_us(TIMESTAMP '{T1}') AS t_us
  UNION ALL
  SELECT 2 AS probe, epoch_us(TIMESTAMP '{T2}') AS t_us
),
looked AS (
  SELECT p.probe, h.user_id, h.attribute
  FROM hist h JOIN probes p
    ON h.from_us <= p.t_us
   AND (h.to_us IS NULL OR h.to_us > p.t_us)
)
SELECT probe, attribute,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       MIN(user_id) AS min_user
FROM looked
GROUP BY probe, attribute
ORDER BY probe, attribute
"""


@register(
    "q_scd2_asof_lookup",
    oracle=_QSCD2LOOKUP_ORACLE,
    description=(
        "SCD2 point-in-time lookup: each user's attribute AS OF two "
        "probe instants via validity-interval predicates — the "
        "consumption side of the type-2 dimension"
    ),
    tags=("warehouse", "scd2", "asof", "temporal", "window"),
)
def q_scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    hist = e.select(
        "user_id",
        F.col("event_type").alias("attribute"),
        us.cast("long").alias("from_us"),
        F.lead(us).over(w).cast("long").alias("to_us"),
    )
    probes = spark.createDataFrame(
        [(1, T1), (2, T2)], "probe int, t string"
    ).select(
        "probe", F.unix_micros(F.col("t").cast("timestamp")).alias("t_us")
    )
    looked = hist.join(
        F.broadcast(probes),
        (F.col("from_us") <= F.col("t_us"))
        & (F.col("to_us").isNull() | (F.col("to_us") > F.col("t_us"))),
    )
    return (
        looked.groupBy("probe", "attribute")
        .agg(
            F.count("*").alias("n_users"),
            F.min("user_id").alias("min_user"),
        )
        .orderBy("probe", "attribute")
    )
