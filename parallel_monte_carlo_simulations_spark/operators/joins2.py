"""Join surface, round-10 additions: tolerance-bounded as-of join.

``q_join_asof`` (joins.py) implements the unbounded backward as-of via
union+window. This module adds the pandas ``merge_asof(tolerance=...)``
semantics: the nearest PRIOR match only counts within a gap bound, else
the row joins to NULL — the form every feature-store point-in-time
lookup actually ships, because an hours-stale quote must not leak into
a training row. Same one-shuffle union+window plan (never a per-row
range join); nulling is a post-window predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: merge_asof tolerance: 30 minutes, in microseconds.
_TOL_US = 30 * 60 * 1_000_000

_QASOF_TOL_ORACLE = f"""
WITH views AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'
),
purchases AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id,
       p.user_id,
       v.view_id,
       v.gap_us
FROM purchases p LEFT JOIN LATERAL (
  SELECT v.event_id AS view_id,
         epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
  FROM views v
  WHERE v.user_id = p.user_id
    AND v.ts <= p.ts
    AND epoch_us(p.ts) - epoch_us(v.ts) <= {_TOL_US}
  ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
) v ON TRUE
"""


@register(
    "q_join_asof_tolerance",
    oracle=_QASOF_TOL_ORACLE,
    description=(
        "tolerance-bounded as-of join (pandas merge_asof semantics): "
        "each purchase matches its nearest prior view only if the gap "
        "is <= 30 min, else NULL — union+window one-shuffle plan, the "
        "point-in-time lookup with a staleness bound"
    ),
    tags=("join", "asof", "tolerance", "feature-store"),
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nearest backward match has the smallest gap, so 'nearest
    within tolerance' == 'nearest, nulled when out of tolerance' — the
    predicate applies AFTER the ignore-nulls last_value window and the
    plan stays one user-keyed shuffle at any scale (no range join)."""
    e = table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("src_id"), F.lit(0).alias("kind")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("src_id"), F.lit(1).alias("kind")
    )
    merged = views.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "src_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_view_id = F.last(
        F.when(F.col("kind") == 0, F.col("src_id")), ignorenulls=True
    ).over(w)
    last_view_ts = F.last(
        F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    gap = F.unix_micros("ts") - F.unix_micros(F.col("view_ts"))
    in_tol = F.col("view_ts").isNotNull() & (gap <= _TOL_US)
    return (
        merged.withColumn("view_id", last_view_id)
        .withColumn("view_ts", last_view_ts)
        .filter(F.col("kind") == 1)
        .select(
            F.col("src_id").alias("purchase_id"),
            "user_id",
            F.when(in_tol, F.col("view_id")).alias("view_id"),
            F.when(in_tol, gap).alias("gap_us"),
        )
    )
