"""Complex type coverage: struct, map, array-of-struct, explode of map
entries — built and consumed inside the engine, verified by flattening
to primitives the oracle can hash."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QSTRUCT_ORACLE = """
SELECT
  c_custkey,
  c_name                 AS profile_name,
  c_mktsegment           AS profile_segment,
  FLOOR((c_acctbal) * 1e2 + 0.5) / 1e2    AS profile_balance
FROM customer
WHERE c_custkey % 25 = 0
"""


@register(
    "q_complex_struct",
    oracle=_QSTRUCT_ORACLE,
    description="named_struct build + field access roundtrip",
    tags=("complex", "struct"),
)
def q_complex_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 25 == 0)
    packed = c.select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
            (F.floor((F.col("c_acctbal")) * 1e2 + 0.5) / 1e2).alias("balance"),
        ).alias("profile"),
    )
    return packed.select(
        "c_custkey",
        F.col("profile.name").alias("profile_name"),
        F.col("profile.segment").alias("profile_segment"),
        F.col("profile.balance").alias("profile_balance"),
    )


_QMAP_ORACLE = """
WITH kv AS (
  SELECT o_orderkey,
         unnest(['status', 'priority']) AS k,
         unnest([o_orderstatus, o_orderpriority]) AS v
  FROM orders WHERE o_orderkey % 100 = 0
)
SELECT o_orderkey, k, v FROM kv
"""


@register(
    "q_complex_map_explode",
    oracle=_QMAP_ORACLE,
    description="map build + explode to (key, value) rows",
    tags=("complex", "map", "explode"),
)
def q_complex_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    mapped = o.select(
        "o_orderkey",
        F.create_map(
            F.lit("status"), F.col("o_orderstatus"),
            F.lit("priority"), F.col("o_orderpriority"),
        ).alias("attrs"),
    )
    return mapped.select("o_orderkey", F.explode("attrs").alias("k", "v"))


_QARRSTRUCT_ORACLE = """
WITH items AS (
  SELECT l_orderkey,
         list_sort(list({'l_linenumber': l_linenumber,
                         'price': FLOOR((l_extendedprice) * 1e2 + 0.5) / 1e2})) AS lines
  FROM lineitem
  WHERE l_orderkey % 200 = 0
  GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(len(lines) AS INTEGER)        AS n_lines,
       lines[1].l_linenumber              AS first_linenumber,
       FLOOR((lines[1].price) * 1e2 + 0.5) / 1e2           AS first_price
FROM items
"""


@register(
    "q_complex_array_of_struct",
    oracle=_QARRSTRUCT_ORACLE,
    description="collect_list of structs + sort + element access",
    tags=("complex", "array", "struct"),
)
def q_complex_array_of_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 200 == 0)
    items = l.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber"),
                    (F.floor((F.col("l_extendedprice")) * 1e2 + 0.5) / 1e2).alias("price"),
                )
            )
        ).alias("lines")
    )
    return items.select(
        "l_orderkey",
        F.size("lines").alias("n_lines"),
        F.element_at("lines", 1)["l_linenumber"].alias("first_linenumber"),
        (F.floor((F.element_at("lines", 1)["price"]) * 1e2 + 0.5) / 1e2).alias("first_price"),
    )
