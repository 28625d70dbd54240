"""Observation API: named runtime metrics collected DURING a query's
execution — the zero-extra-pass audit counter.

``df.observe(Observation, exprs...)`` attaches aggregate expressions
that the executors evaluate while the main action streams by: row
counts, null counts, sums for reconciliation — with NO second scan. At
100 TB that difference (piggybacked metrics vs a separate audit query)
is an entire pass over the data. The standard use is write-path
auditing: every batch job publishes its row/nullability/total metrics
alongside its output.

The registered query audits a filtered events scan (purchases): the
observed metrics are exact aggregates, so the single metrics row is
fully oracled against DuckDB computing the same aggregates relationally.
The observed plan is driven by a ``noop`` write (full computation, no
driver collect); ``Observation.get`` then yields the metrics the
executors accumulated during that write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QOBSERVE_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE value > 100) AS BIGINT) AS n_large,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(MIN(user_id) AS BIGINT) AS min_user,
       CAST(MAX(user_id) AS BIGINT) AS max_user
FROM events
WHERE event_type = 'purchase'
"""


@register(
    "q_observe_metrics",
    oracle=_QOBSERVE_ORACLE,
    description=(
        "Observation API: audit metrics (rows, filtered count, exact "
        "cent total, user-id bounds) accumulated DURING a noop-written "
        "scan — no second pass; the metrics row is exactly oracled"
    ),
    tags=("observe", "metrics", "audit", "data-quality"),
)
def q_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    obs = Observation("purchase_audit")
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("value") > 100, 1)).alias("n_large"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
    )  # DISTINCT aggregates are rejected by observe — bounds instead
    # Drive the observed plan once; metrics accumulate during this write.
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get  # dict of metric name -> value (driver-side scalars)
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_large"]),
                int(m["total_cents"]),
                int(m["min_user"]),
                int(m["max_user"]),
            )
        ],
        "n_rows long, n_large long, total_cents long, min_user long, max_user long",
    )
