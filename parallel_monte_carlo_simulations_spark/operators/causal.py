"""Causal-inference estimators over observational warehouse data.

**Difference-in-differences**: the workhorse quasi-experimental
estimator — compare the outcome change of a treated group to the change
of a control group over the same period, cancelling group-level and
period-level confounds (Card & Krueger 1994 canon):

    DiD = (E[y | treat, post] - E[y | treat, pre])
        - (E[y | ctrl,  post] - E[y | ctrl,  pre])

Groups and periods are derived deterministically: treatment = the
BUILDING market segment, pre/post split at the series midpoint date.
All four cell means are exact cent-integer sums divided once; the DiD
is one mirrored double expression over the four rounded means, so the
estimate is bit-identical cross-engine.

Scale: a single groupBy producing four cells — the estimator is one
shuffle regardless of fact-table size, and the per-cell partial sums
combine map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Pre/post boundary: midpoint of the order-date span.
SPLIT_DATE = "1998-01-01"
TREAT_SEGMENT = "BUILDING"

_QDID_ORACLE = f"""
WITH tagged AS (
  SELECT CASE WHEN c.c_mktsegment = '{TREAT_SEGMENT}' THEN 1 ELSE 0 END
           AS treated,
         CASE WHEN o.o_orderdate >= TIMESTAMP '{SPLIT_DATE}' THEN 1 ELSE 0 END
           AS post,
         CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cells AS (
  SELECT treated, post,
         CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(CAST(SUM(cents) AS DOUBLE) / (100.0e0 * COUNT(*)), 4)
           AS mean_price
  FROM tagged
  GROUP BY treated, post
),
wide AS (
  SELECT
    MAX(CASE WHEN treated = 1 AND post = 1 THEN mean_price END) AS t_post,
    MAX(CASE WHEN treated = 1 AND post = 0 THEN mean_price END) AS t_pre,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN mean_price END) AS c_post,
    MAX(CASE WHEN treated = 0 AND post = 0 THEN mean_price END) AS c_pre,
    CAST(SUM(n) AS BIGINT) AS n_total
  FROM cells
)
SELECT t_pre, t_post, c_pre, c_post, n_total,
       ROUND((t_post - t_pre) - (c_post - c_pre), 4) AS did_estimate
FROM wide
"""


@register(
    "q_causal_diff_in_diff",
    oracle=_QDID_ORACLE,
    description=(
        "difference-in-differences estimator: treated segment vs "
        "control, pre/post the series midpoint — four exact cell means, "
        "one mirrored DiD expression"
    ),
    tags=("causal", "statistics", "ab-testing", "aggregate", "analytics"),
)
def q_causal_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    tagged = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.when(F.col("c_mktsegment") == TREAT_SEGMENT, F.lit(1))
        .otherwise(F.lit(0))
        .alias("treated"),
        F.when(
            F.col("o_orderdate") >= F.lit(SPLIT_DATE).cast("timestamp"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("post"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    cells = tagged.groupBy("treated", "post").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum("cents").cast("double") / (F.lit(100.0) * F.count("*")), 4
        ).alias("mean_price"),
    )
    wide = cells.agg(
        F.max(
            F.when((F.col("treated") == 1) & (F.col("post") == 1), F.col("mean_price"))
        ).alias("t_post"),
        F.max(
            F.when((F.col("treated") == 1) & (F.col("post") == 0), F.col("mean_price"))
        ).alias("t_pre"),
        F.max(
            F.when((F.col("treated") == 0) & (F.col("post") == 1), F.col("mean_price"))
        ).alias("c_post"),
        F.max(
            F.when((F.col("treated") == 0) & (F.col("post") == 0), F.col("mean_price"))
        ).alias("c_pre"),
        F.sum("n").alias("n_total"),
    )
    return wide.select(
        "t_pre",
        "t_post",
        "c_pre",
        "c_post",
        "n_total",
        F.round(
            (F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre")),
            4,
        ).alias("did_estimate"),
    )
