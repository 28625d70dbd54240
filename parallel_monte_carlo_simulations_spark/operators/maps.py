"""Map higher-order functions: the map-typed half of the HOF surface.

Array higher-order functions are covered elsewhere
(``q_higher_order_predicates``, ``q_array_functions``); this query
exercises the MAP family — ``map_from_arrays``, ``transform_values``,
``map_filter``, ``map_zip_with`` — which is how per-document keyed
feature bags (per-language counts, per-field scores) are manipulated
without exploding to rows first. All JVM-side expressions.

Cross-engine note: DuckDB's map functions differ enough (and map
ordering is engine-defined) that the oracle normalizes by EXPLODING the
final map to (doc_id, key, value) rows and replaying the same
arithmetic per key — order-insensitive row compare does the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QMAPS_ORACLE = """
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents,
       LATERAL (SELECT unnest(string_split(text, ' ')) AS tok) t
  WHERE doc_id < 200 AND t.tok <> ''
),
counts AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM toks GROUP BY doc_id, tok
),
totals AS (
  SELECT doc_id, SUM(c) AS total FROM counts GROUP BY doc_id
)
SELECT c.doc_id,
       c.tok                                          AS token,
       CAST(c.c * 2 AS BIGINT)                        AS doubled,
       FLOOR((c.c * 1000.0 / t.total) * 10 + 0.5e0) / 10 AS permille
FROM counts c JOIN totals t USING (doc_id)
WHERE c.c >= 3
"""


@register(
    "q_map_higher_order",
    oracle=_QMAPS_ORACLE,
    description=(
        "map HOFs: token-count map per doc via map_from_arrays, "
        "transform_values (x2), map_filter (count>=3), map_zip_with "
        "(per-mille vs doc total), exploded back to rows"
    ),
    tags=("scalar", "map", "higher_order", "complex"),
)
def q_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    # per-doc map tok -> count, built from collected arrays
    bag = counts.groupBy("doc_id").agg(
        F.map_from_arrays(
            F.collect_list("tok"), F.collect_list("c")
        ).alias("bag")
    )
    total = F.aggregate(
        F.map_values("bag"), F.lit(0).cast("long"), lambda a, v: a + v
    )
    enriched = (
        bag.withColumn("total", total)
        # transform_values: doubled counts
        .withColumn(
            "doubled_map",
            F.transform_values("bag", lambda k, v: v * 2),
        )
        # map_filter: keep frequent tokens only
        .withColumn(
            "frequent",
            F.map_filter("bag", lambda k, v: v >= 3),
        )
    )
    # map_zip_with: join the doubled and raw maps into per-mille shares
    permille = F.map_zip_with(
        "frequent",
        F.map_filter("doubled_map", lambda k, v: v >= 6),
        lambda k, v1, v2: F.floor(
            (v1 * 1000.0 / F.col("total")) * 10 + 0.5
        )
        / 10,
    )
    exploded = enriched.select(
        "doc_id",
        "total",
        F.explode(F.map_zip_with(
            "frequent", permille, lambda k, a, b: F.struct(
                a.alias("c"), b.alias("pm")
            )
        )).alias("token", "v"),
    )
    return exploded.select(
        "doc_id",
        "token",
        (F.col("v.c") * 2).cast("long").alias("doubled"),
        F.col("v.pm").alias("permille"),
    )
