"""Kendall tau-b rank correlation from exact integer concordance counts.

Spearman (``operators/stattests.py``) ranks then correlates; Kendall's
tau-b is the other classical rank-association measure — the normalized
excess of concordant over discordant pairs, with the tie-corrected
denominator sqrt((n0-n1)(n0-n2)). It is preferred when the series are
short or tie-heavy (both true for daily business aggregates), and its
sampling distribution is better behaved for hypothesis tests.

Computed here between daily order COUNT and daily revenue per order
priority — do busier days bring proportionally more money, and does the
association differ by priority class?

Scale design: the O(n^2) pair stage runs on the *aggregated* daily
series, never the fact table — the orders scan collapses to
|priorities| x |days| rows first (5 x ~2400 for TPC-H's 7-year
calendar), so the self-join emits ~2.9M pairs per priority REGARDLESS
of fact-table scale; 100 TB of orders still aggregates to the same
calendar-bounded series. The pair join is an equi-join on the priority
key with an inequality on day (a < b), so each group's pairs hash to
one partition's worth of work and priorities parallelize.

Exactness discipline: x (count) and y (cents) are integers;
concordant/discordant/tie counts are exact BIGINTs from sign
comparisons; n0, n1, n2 are exact integers; the single double step
(C - D) / sqrt((n0-n1)(n0-n2)) is mirrored in both engines and rounded
to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QKENDALL_ORACLE = """
WITH daily AS (
  SELECT o_orderpriority AS priority,
         CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS y
  FROM orders GROUP BY priority, day
),
pairs AS (
  SELECT a.priority,
         CASE WHEN (a.x < b.x AND a.y < b.y) OR (a.x > b.x AND a.y > b.y)
              THEN 1 ELSE 0 END AS c,
         CASE WHEN (a.x < b.x AND a.y > b.y) OR (a.x > b.x AND a.y < b.y)
              THEN 1 ELSE 0 END AS d
  FROM daily a JOIN daily b
    ON a.priority = b.priority AND a.day < b.day
),
cd AS (
  SELECT priority,
         CAST(SUM(c) AS BIGINT) AS concordant,
         CAST(SUM(d) AS BIGINT) AS discordant
  FROM pairs GROUP BY priority
),
counts AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n FROM daily
  GROUP BY priority
),
tx AS (
  SELECT priority, CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS n1
  FROM (SELECT priority, CAST(COUNT(*) AS BIGINT) AS t
        FROM daily GROUP BY priority, x)
  GROUP BY priority
),
ty AS (
  SELECT priority, CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS n2
  FROM (SELECT priority, CAST(COUNT(*) AS BIGINT) AS t
        FROM daily GROUP BY priority, y)
  GROUP BY priority
)
SELECT c.priority,
       n.n AS n_days,
       c.concordant,
       c.discordant,
       FLOOR((CAST(c.concordant - c.discordant AS DOUBLE)
         / sqrt(CAST((n.n * (n.n - 1) / 2 - tx.n1) AS DOUBLE)
                * CAST((n.n * (n.n - 1) / 2 - ty.n2) AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS tau_b
FROM cd c
JOIN counts n ON n.priority = c.priority
JOIN tx ON tx.priority = c.priority
JOIN ty ON ty.priority = c.priority
ORDER BY c.priority
"""


@register(
    "q_stat_kendall_tau",
    oracle=_QKENDALL_ORACLE,
    description=(
        "Kendall tau-b between daily order count and daily revenue per "
        "order priority: exact integer concordant/discordant/tie counts "
        "from a calendar-bounded self-join over the aggregated daily "
        "series, one mirrored double sqrt at the end"
    ),
    tags=("statistics", "correlation", "kendall", "join", "aggregation"),
)
def q_stat_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(
        F.count("*").cast("long").alias("x"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("y"),
    )

    a = daily.alias("a")
    b = daily.alias("b")
    xa, ya = F.col("a.x"), F.col("a.y")
    xb, yb = F.col("b.x"), F.col("b.y")
    pairs = a.join(
        b,
        (F.col("a.priority") == F.col("b.priority"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.priority").alias("priority"),
        F.when(
            ((xa < xb) & (ya < yb)) | ((xa > xb) & (ya > yb)), 1
        ).otherwise(0).alias("c"),
        F.when(
            ((xa < xb) & (ya > yb)) | ((xa > xb) & (ya < yb)), 1
        ).otherwise(0).alias("d"),
    )
    cd = pairs.groupBy("priority").agg(
        F.sum("c").cast("long").alias("concordant"),
        F.sum("d").cast("long").alias("discordant"),
    )

    counts = daily.groupBy("priority").agg(
        F.count("*").cast("long").alias("n")
    )
    # Tie corrections: n1 = sum over x-value groups of t(t-1)/2 (n2: y).
    tx = (
        daily.groupBy("priority", "x")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy("priority")
        .agg(
            F.sum((F.col("t") * (F.col("t") - 1) / 2).cast("long"))
            .cast("long")
            .alias("n1")
        )
    )
    ty = (
        daily.groupBy("priority", "y")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy("priority")
        .agg(
            F.sum((F.col("t") * (F.col("t") - 1) / 2).cast("long"))
            .cast("long")
            .alias("n2")
        )
    )

    n0 = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    return (
        cd.join(counts, "priority")
        .join(tx, "priority")
        .join(ty, "priority")
        .select(
            "priority",
            F.col("n").alias("n_days"),
            "concordant",
            "discordant",
            (F.floor(((F.col("concordant") - F.col("discordant")).cast("double")
                / F.sqrt(
                    (n0 - F.col("n1")).cast("double")
                    * (n0 - F.col("n2")).cast("double")
                )) * 1e6 + 0.5) / 1e6).alias("tau_b"),
        )
        .orderBy("priority")
    )
