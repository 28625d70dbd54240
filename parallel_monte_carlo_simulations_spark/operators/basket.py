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


MIN_CO = 2
CF_TOP_K = 3

_QITEMCF_ORACLE = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
),
supp AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS s FROM baskets GROUP BY item),
pairs AS (
  SELECT a.item AS ia, b.item AS ib, CAST(COUNT(*) AS BIGINT) AS co
  FROM baskets a JOIN baskets b
    ON b.basket = a.basket AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING COUNT(*) >= {MIN_CO}
),
sym AS (
  SELECT ia AS item, ib AS neighbor, co FROM pairs
  UNION ALL
  SELECT ib AS item, ia AS neighbor, co FROM pairs
),
scored AS (
  SELECT s.item, s.neighbor, s.co,
         CAST(s.co AS DOUBLE) / sqrt(CAST(sa.s * sb.s AS DOUBLE)) AS cos_raw
  FROM sym s
  JOIN supp sa ON sa.item = s.item
  JOIN supp sb ON sb.item = s.neighbor
),
ranked AS (
  SELECT item, neighbor, co, cos_raw,
         CAST(ROW_NUMBER() OVER (PARTITION BY item
                                 ORDER BY cos_raw DESC, neighbor)
              AS INTEGER) AS rk
  FROM scored
)
SELECT item, neighbor, co, FLOOR((cos_raw) * 1e6 + 0.5) / 1e6 AS cosine, rk
FROM ranked WHERE rk <= {CF_TOP_K}
ORDER BY item, rk
"""


@register(
    "q_itemcf_topk",
    oracle=_QITEMCF_ORACLE,
    description=(
        "item-item collaborative filtering: cosine-normalized basket "
        "co-occurrence, top-3 neighbors per item (min co-occurrence 2)"
    ),
    tags=("basket", "recommender", "item-cf", "similarity"),
)
def q_itemcf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recommender step past q_basket_frequent_pairs: co-occurrence
    normalized by sqrt(support_a * support_b) (cosine over implicit
    binary baskets) separates affinity from popularity, then a per-item
    top-k window yields each item's neighbor list — the precompute
    behind "customers also bought". Ranking uses the UNROUNDED cosine
    (identical doubles both engines — sqrt of an exact integer product)
    with neighbor-id tie-breaks, so the top-k cut is deterministic.
    Scale shape: same basket self-join as the pair miner (bounded by
    basket size), supports broadcast, one window on the item key."""
    li = table(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    supp = baskets.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("s")
    )
    a = baskets.select("basket", F.col("item").alias("ia"))
    b = baskets.select("basket", F.col("item").alias("ib"))
    pairs = (
        a.join(b, on="basket")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).cast("long").alias("co"))
        .where(F.col("co") >= MIN_CO)
    )
    sym = pairs.select(
        F.col("ia").alias("item"), F.col("ib").alias("neighbor"), "co"
    ).unionAll(
        pairs.select(
            F.col("ib").alias("item"), F.col("ia").alias("neighbor"), "co"
        )
    )
    scored = (
        sym.join(
            supp.select(F.col("item"), F.col("s").alias("sa")), on="item"
        )
        .join(
            supp.select(
                F.col("item").alias("neighbor"), F.col("s").alias("sb")
            ),
            on="neighbor",
        )
        .select(
            "item",
            "neighbor",
            "co",
            (
                F.col("co").cast("double")
                / F.sqrt((F.col("sa") * F.col("sb")).cast("double"))
            ).alias("cos_raw"),
        )
    )
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("item").orderBy(F.col("cos_raw").desc(), "neighbor")
    )
    return (
        scored.withColumn("rk", rk.cast("int"))
        .where(F.col("rk") <= CF_TOP_K)
        .select("item", "neighbor", "co", (F.floor((F.col("cos_raw")) * 1e6 + 0.5) / 1e6).alias("cosine"), "rk")
        .orderBy("item", "rk")
    )
