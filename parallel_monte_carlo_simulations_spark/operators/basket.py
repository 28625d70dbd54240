"""Market-basket analysis: frequent item pairs with lift.

The first rung of association mining (the 2-itemset core of
Apriori/FP-growth): items co-occurring in the same order, support
counted across baskets, LIFT separating genuine affinity from
popularity. The distributed shape is the classic one: distinct
(basket, item), self-join on the basket key with ``item_a < item_b``
(each unordered pair once), aggregate support, broadcast-join the
per-item supports for lift. Per-basket fan-out is items-per-basket
choose 2 — bounded by basket size, never corpus-quadratic.

Lift quantization uses the floor-half-up form (cross-engine ROUND tie
discipline); support thresholds keep the result set meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

MIN_SUPPORT = 3

_QBASKET_ORACLE = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
),
n_baskets AS (SELECT COUNT(DISTINCT basket) AS n FROM baskets),
item_sup AS (SELECT item, COUNT(*) AS sup FROM baskets GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS support
  FROM baskets a JOIN baskets b
    ON a.basket = b.basket AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING COUNT(*) >= {MIN_SUPPORT}
)
SELECT p.item_a, p.item_b,
       CAST(p.support AS BIGINT) AS support,
       FLOOR((p.support * 1.0 * nb.n / (sa.sup * sb.sup)) * 10000 + 0.5e0)
         / 10000 AS lift
FROM pairs p
JOIN item_sup sa ON p.item_a = sa.item
JOIN item_sup sb ON p.item_b = sb.item
CROSS JOIN n_baskets nb
"""


@register(
    "q_basket_frequent_pairs",
    oracle=_QBASKET_ORACLE,
    description=(
        f"market-basket mining: item pairs co-occurring in >= "
        f"{MIN_SUPPORT} orders with lift (support*N / (sup_a*sup_b))"
    ),
    tags=("basket", "association", "join", "analytics"),
)
def q_basket_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    n_baskets = baskets.agg(F.countDistinct("basket").alias("n"))
    item_sup = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("sup"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= MIN_SUPPORT)
    )
    sa = item_sup.select(
        F.col("item").alias("item_a"), F.col("sup").alias("sup_a")
    )
    sb = item_sup.select(
        F.col("item").alias("item_b"), F.col("sup").alias("sup_b")
    )
    lift = (
        F.floor(
            (F.col("support") * 1.0 * F.col("n") / (F.col("sup_a") * F.col("sup_b")))
            * 10000
            + 0.5
        )
        / 10000
    )
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            F.col("support").cast("long").alias("support"),
            lift.alias("lift"),
        )
    )
