"""Skyline (Pareto-front) query: the maxima of a 2-D dominance order.

"Show me the orders no other order beats on BOTH price and recency" —
the skyline operator of Borzsony/Kossmann/Stocker (ICDE 2001). For two
dimensions the skyline falls out of one sorted window pass: sort by x
descending (ties y descending), keep a row iff its y strictly exceeds
the running maximum y of all earlier (x-better) rows.

Scale design: dominance is distributive — the skyline of a union is a
subset of the union of per-partition skylines. So at 100 TB: compute
local skylines per partition (here: per order-year, any partitioning
works), then run the same window over the tiny union. The final window
sees only candidate rows (per-partition fronts), so the deliberate
single-partition sort at the end is bounded regardless of input size.
The oracle replays the plain one-pass definition over all rows — both
must produce the identical front, which is itself the proof of the
distributive property.

Dominance is evaluated on exact integers (price cents, epoch days), so
the front is deterministic and oracles bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QSKY_ORACLE = """
WITH pts AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
         datediff('day', TIMESTAMP '2024-01-01', o_orderdate) AS day_no
  FROM orders
),
ranked AS (
  SELECT o_orderkey, price_cents, day_no,
         MAX(day_no) OVER (ORDER BY price_cents DESC, day_no DESC, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_day_before
  FROM pts
)
SELECT o_orderkey, price_cents, day_no
FROM ranked
WHERE best_day_before IS NULL OR day_no > best_day_before
ORDER BY price_cents DESC, o_orderkey
"""


def _skyline_window(df: DataFrame) -> DataFrame:
    """One sorted pass: keep rows whose day_no beats every higher-priced
    row's day_no."""
    w = (
        Window.orderBy(
            F.desc("price_cents"), F.desc("day_no"), F.col("o_orderkey")
        ).rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("best_day_before", F.max("day_no").over(w))
        .where(
            F.col("best_day_before").isNull()
            | (F.col("day_no") > F.col("best_day_before"))
        )
        .drop("best_day_before")
    )


@register(
    "q_skyline_pareto_front",
    oracle=_QSKY_ORACLE,
    description=(
        "2-D skyline query (Pareto front of price x recency) via the "
        "distributive local-then-global window pass — no pairwise "
        "dominance join"
    ),
    tags=("skyline", "pareto", "window", "analytics", "scale"),
)
def q_skyline_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    pts = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias(
            "price_cents"
        ),
        F.datediff(
            F.col("o_orderdate"), F.lit("2024-01-01").cast("timestamp")
        ).alias("day_no"),
    )
    # Local pruning pass: per-year skylines drop every locally-dominated
    # row first, so the global sorted window only ever sees candidate
    # fronts (bounded), not the raw table. Same result by distributivity.
    year_w = (
        Window.partitionBy("yr")
        .orderBy(F.desc("price_cents"), F.desc("day_no"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = (
        pts.withColumn("yr", F.floor(F.col("day_no") / 365))
        .withColumn("best_day_before", F.max("day_no").over(year_w))
        .where(
            F.col("best_day_before").isNull()
            | (F.col("day_no") > F.col("best_day_before"))
        )
        .select("o_orderkey", "price_cents", "day_no")
    )
    return _skyline_window(local).orderBy(
        F.desc("price_cents"), "o_orderkey"
    )
