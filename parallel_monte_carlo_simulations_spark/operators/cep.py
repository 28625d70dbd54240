"""Complex-event-processing patterns in batch SQL — MATCH_RECOGNIZE
emulation via lag chains.

Neither Spark nor DuckDB ships SQL:2016 MATCH_RECOGNIZE; the standard
translation for fixed-length patterns is a window lag chain: a row
anchors a match iff the lagged values around it satisfy the pattern
predicate. Two classic patterns over each user's event-value series:

- **V-shape** (down, down, up, up): a local crash-and-recover — the
  value falls twice then rises twice, with the anchor at the trough.
- **Three rising peaks**: strictly increasing values at three
  consecutive events, each above the user's running mean — a
  monotone-burst detector.

All comparisons are on exact value cents; counts per user with total
pattern counts. Scale: one window pass partitioned by user — the lag
chain adds columns, not passes; the pattern predicate runs in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QCEP_ORACLE = """
WITH v AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
lagged AS (
  SELECT user_id, ts, cents,
         LAG(cents, 2) OVER w AS m2,
         LAG(cents, 1) OVER w AS m1,
         LEAD(cents, 1) OVER w AS p1,
         LEAD(cents, 2) OVER w AS p2,
         AVG(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_mean
  FROM v
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
flagged AS (
  SELECT user_id,
         CASE WHEN m2 > m1 AND m1 > cents AND p1 > cents AND p2 > p1
              THEN 1 ELSE 0 END AS v_shape,
         CASE WHEN m2 < m1 AND m1 < cents
                   AND m2 > run_mean AND m1 > run_mean AND cents > run_mean
              THEN 1 ELSE 0 END AS rising_peaks
  FROM lagged
)
SELECT user_id,
       CAST(SUM(v_shape) AS BIGINT) AS n_v_shapes,
       CAST(SUM(rising_peaks) AS BIGINT) AS n_rising_bursts
FROM flagged
GROUP BY user_id
HAVING SUM(v_shape) > 0 OR SUM(rising_peaks) > 0
ORDER BY user_id
"""


@register(
    "q_cep_patterns",
    oracle=_QCEP_ORACLE,
    description=(
        "MATCH_RECOGNIZE-style pattern detection via lag chains: "
        "V-shape (crash-recover) troughs and above-running-mean rising "
        "bursts per user, exact cent comparisons"
    ),
    tags=("cep", "pattern", "window", "timeseries", "analytics"),
)
def q_cep_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    v = e.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wm = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lagged = v.select(
        "user_id",
        "cents",
        F.lag("cents", 2).over(w).alias("m2"),
        F.lag("cents", 1).over(w).alias("m1"),
        F.lead("cents", 1).over(w).alias("p1"),
        F.lead("cents", 2).over(w).alias("p2"),
        F.avg("cents").over(wm).alias("run_mean"),
    )
    v_shape = F.when(
        (F.col("m2") > F.col("m1"))
        & (F.col("m1") > F.col("cents"))
        & (F.col("p1") > F.col("cents"))
        & (F.col("p2") > F.col("p1")),
        F.lit(1),
    ).otherwise(F.lit(0))
    rising = F.when(
        (F.col("m2") < F.col("m1"))
        & (F.col("m1") < F.col("cents"))
        & (F.col("m2") > F.col("run_mean"))
        & (F.col("m1") > F.col("run_mean"))
        & (F.col("cents") > F.col("run_mean")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        lagged.select(
            "user_id", v_shape.alias("v_shape"), rising.alias("rising_peaks")
        )
        .groupBy("user_id")
        .agg(
            F.sum("v_shape").alias("n_v_shapes"),
            F.sum("rising_peaks").alias("n_rising_bursts"),
        )
        .where((F.col("n_v_shapes") > 0) | (F.col("n_rising_bursts") > 0))
        .orderBy("user_id")
    )
