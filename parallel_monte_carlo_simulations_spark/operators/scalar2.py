"""Second scalar-function sweep: padding/formatting strings, higher-order
exists/forall/zip_with, sequence generation, JSON construction, data
cleaning (null handling), exact percentiles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

# --------------------------------------------------------------------------
# String sweep #2: pad/repeat/reverse/position/initcap-ish/format.
# --------------------------------------------------------------------------

_QSTR2_ORACLE = """
SELECT
  s_suppkey,
  lpad(CAST(s_suppkey AS VARCHAR), 8, '0')            AS key_padded,
  rpad(s_name, 20, '.')                               AS name_padded,
  reverse(s_name)                                     AS name_reversed,
  repeat('-', CAST(s_suppkey % 5 AS INTEGER))         AS dashes,
  CAST(strpos(s_name, '_') AS INTEGER)                AS underscore_pos,
  split_part(s_name, '_', 2)                          AS name_suffix,
  printf('%s#%d', s_name, s_suppkey)                  AS formatted,
  left(s_name, 4)                                     AS name_left,
  right(s_name, 3)                                    AS name_right
FROM supplier
"""


@register(
    "q_string_functions2",
    oracle=_QSTR2_ORACLE,
    description="string sweep 2: pad/repeat/reverse/strpos/split_part/printf/left/right",
    tags=("scalar", "string"),
)
def q_string_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.lpad(F.col("s_suppkey").cast("string"), 8, "0").alias("key_padded"),
        F.rpad("s_name", 20, ".").alias("name_padded"),
        F.reverse("s_name").alias("name_reversed"),
        F.repeat(F.lit("-"), (F.col("s_suppkey") % 5).cast("int")).alias("dashes"),
        F.instr("s_name", "_").alias("underscore_pos"),
        F.split_part("s_name", F.lit("_"), F.lit(2)).alias("name_suffix"),
        F.format_string("%s#%d", "s_name", "s_suppkey").alias("formatted"),
        F.substring("s_name", 1, 4).alias("name_left"),
        F.substring("s_name", -3, 3).alias("name_right"),
    )


# --------------------------------------------------------------------------
# Higher-order #2: exists / forall / zip_with / filter composition.
# --------------------------------------------------------------------------

_QHOF2_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
)
SELECT
  doc_id,
  CASE WHEN len(list_filter(toks, x -> length(x) > 8)) > 0
       THEN 1 ELSE 0 END                                       AS has_long_token,
  CASE WHEN len(list_filter(toks, x -> length(x) >= 1)) = len(toks)
       THEN 1 ELSE 0 END                                       AS all_nonempty,
  CAST(len(list_filter(toks, x -> x = 'data')) AS INTEGER)     AS data_count,
  CAST(list_sum(list_transform(range(1, LEAST(len(toks), 5) + 1),
       i -> length(toks[i]) * i)) AS BIGINT)                   AS weighted_head_len
FROM t
"""


@register(
    "q_higher_order_predicates",
    oracle=_QHOF2_ORACLE,
    description="exists/forall/filter/positional-transform over token arrays",
    tags=("scalar", "higher_order"),
)
def q_higher_order_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    head = F.slice(toks, 1, F.least(F.size(toks), F.lit(5)))
    weighted = F.aggregate(
        F.zip_with(
            head,
            F.sequence(F.lit(1), F.size(head)),
            lambda t, i: F.length(t) * i,
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return d.select(
        "doc_id",
        F.when(F.exists(toks, lambda x: F.length(x) > 8), 1).otherwise(0).alias(
            "has_long_token"
        ),
        F.when(F.forall(toks, lambda x: F.length(x) >= 1), 1).otherwise(0).alias(
            "all_nonempty"
        ),
        F.size(F.filter(toks, lambda x: x == "data")).alias("data_count"),
        weighted.alias("weighted_head_len"),
    )


# --------------------------------------------------------------------------
# Sequence generation + explode (lateral row generation).
# --------------------------------------------------------------------------

_QSEQ_ORACLE = """
SELECT r_regionkey,
       CAST(gs.g AS INTEGER) AS step,
       CAST(r_regionkey * gs.g AS INTEGER) AS product
FROM region, LATERAL (SELECT unnest(generate_series(1, 4)) AS g) gs
"""


@register(
    "q_sequence_explode",
    oracle=_QSEQ_ORACLE,
    description="sequence() generation + explode (lateral row fan-out)",
    tags=("scalar", "sequence", "explode"),
)
def q_sequence_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    return r.select(
        "r_regionkey",
        F.explode(F.sequence(F.lit(1), F.lit(4))).alias("step"),
    ).select(
        "r_regionkey",
        "step",
        (F.col("r_regionkey") * F.col("step")).cast("int").alias("product"),
    )


# --------------------------------------------------------------------------
# JSON construction: to_json over a struct of ints/strings (compact in
# both engines as long as no floats are involved).
# --------------------------------------------------------------------------

_QTOJSON_ORACLE = """
SELECT n_nationkey,
       to_json({'key': n_nationkey, 'name': n_name}) AS as_json
FROM nation
"""


@register(
    "q_json_construct",
    oracle=_QTOJSON_ORACLE,
    description="to_json(struct(...)) construction parity",
    tags=("scalar", "json"),
)
def q_json_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.to_json(
            F.struct(
                F.col("n_nationkey").alias("key"), F.col("n_name").alias("name")
            )
        ).alias("as_json"),
    )


# --------------------------------------------------------------------------
# Cleaning: inject nulls deterministically, then fillna/dropna/replace.
# --------------------------------------------------------------------------

_QCLEAN_ORACLE = """
WITH dirty AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS segment,
         CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_acctbal END   AS bal
  FROM customer
)
SELECT
  c_custkey,
  COALESCE(segment, 'UNKNOWN')                       AS segment_filled,
  FLOOR((COALESCE(bal, 0.0)) * 1e2 + 0.5) / 1e2                       AS bal_filled,
  CASE WHEN segment IS NULL OR bal IS NULL THEN 1 ELSE 0 END AS was_dirty
FROM dirty
"""


@register(
    "q_cleaning_nulls",
    oracle=_QCLEAN_ORACLE,
    description="null injection + fillna-style cleaning (dropna/fillna surface)",
    tags=("cleaning", "nulls"),
)
def q_cleaning_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    dirty = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
        F.when(F.col("c_custkey") % 11 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    was_dirty = (
        F.when(F.col("segment").isNull() | F.col("bal").isNull(), 1).otherwise(0)
    ).alias("was_dirty")
    filled = dirty.select("c_custkey", "segment", "bal", was_dirty).fillna(
        {"segment": "UNKNOWN", "bal": 0.0}
    )
    return filled.select(
        "c_custkey",
        F.col("segment").alias("segment_filled"),
        (F.floor((F.col("bal")) * 1e2 + 0.5) / 1e2).alias("bal_filled"),
        "was_dirty",
    )


# --------------------------------------------------------------------------
# Exact interpolated percentiles (percentile_cont family).
# --------------------------------------------------------------------------

_QPCT_ORACLE = """
SELECT
  l_returnflag,
  FLOOR((quantile_cont(l_quantity, 0.5)) * 1e4 + 0.5) / 1e4  AS p50_qty,
  FLOOR((quantile_cont(l_quantity, 0.9)) * 1e4 + 0.5) / 1e4  AS p90_qty,
  FLOOR((quantile_cont(l_extendedprice, 0.99)) * 1e4 + 0.5) / 1e4 AS p99_price
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "q_percentiles_exact",
    oracle=_QPCT_ORACLE,
    description="exact linear-interpolated percentiles (p50/p90/p99)",
    tags=("aggregate", "percentile"),
)
def q_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        (F.floor((F.percentile("l_quantity", F.lit(0.5))) * 1e4 + 0.5) / 1e4).alias("p50_qty"),
        (F.floor((F.percentile("l_quantity", F.lit(0.9))) * 1e4 + 0.5) / 1e4).alias("p90_qty"),
        (F.floor((F.percentile("l_extendedprice", F.lit(0.99))) * 1e4 + 0.5) / 1e4).alias("p99_price"),
    )
