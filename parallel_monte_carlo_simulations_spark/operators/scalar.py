"""Scalar function coverage: string, date, math, array (higher-order),
JSON, and conditional expressions.

Everything stays JVM-side in whole-stage codegen — no Python UDFs. Each
query returns deterministic values so the DuckDB oracle hash-matches;
engine-specific functions (e.g. dayofweek numbering) are normalized to a
common definition on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.microunit import rdiv_halfup_duck, rdiv_halfup_expr
from ..registry import register
from ..tables import table

# --------------------------------------------------------------------------
# String functions over part names.
# --------------------------------------------------------------------------

_QSTR_ORACLE = """
SELECT
  p_partkey,
  UPPER(p_brand)                                   AS brand_upper,
  LOWER(p_type)                                    AS type_lower,
  CAST(LENGTH(p_name) AS INTEGER)                  AS name_len,
  SUBSTR(p_name, 1, 8)                             AS name_prefix,
  CONCAT(p_brand, ':', p_type)                     AS brand_type,
  REPLACE(p_type, ' ', '_')                        AS type_snake,
  TRIM(p_name)                                     AS name_trim,
  regexp_extract(p_type, '([A-Z]+)', 1)            AS first_word,
  CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END    AS has_a
FROM part
"""


@register(
    "q_string_functions",
    oracle=_QSTR_ORACLE,
    description="string scalar sweep: case, length, substr, concat, regexp, LIKE",
    tags=("scalar", "string"),
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.expr("replace(p_type, ' ', '_')").alias("type_snake"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.regexp_extract("p_type", r"([A-Z]+)", 1).alias("first_word"),
        F.when(F.col("p_name").like("%a%"), 1).otherwise(0).alias("has_a"),
    )


# --------------------------------------------------------------------------
# Date/time functions over orders.
# --------------------------------------------------------------------------

_QDATE_ORACLE = """
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS INTEGER)                        AS order_year,
  CAST(month(o_orderdate) AS INTEGER)                       AS order_month,
  CAST(day(o_orderdate) AS INTEGER)                         AS order_day,
  CAST(quarter(o_orderdate) AS INTEGER)                     AS order_quarter,
  CAST(isodow(o_orderdate) AS INTEGER)                      AS iso_weekday,
  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')       AS due_date,
  CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_epoch0,
  strftime(o_orderdate, '%Y-%m')                            AS year_month
FROM orders
WHERE o_orderkey % 10 = 0
"""


@register(
    "q_date_functions",
    oracle=_QDATE_ORACLE,
    description="date scalar sweep: extract fields, iso weekday, last_day, arithmetic",
    tags=("scalar", "date"),
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        # Spark weekday(): 0=Monday; ISO dow: 1=Monday..7=Sunday.
        (F.weekday(d) + 1).alias("iso_weekday"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch0"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
    )


# --------------------------------------------------------------------------
# Math functions over lineitem.
# --------------------------------------------------------------------------

_QMATH_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  FLOOR((ln(l_extendedprice)) * 1e6 + 0.5) / 1e6                      AS log_price,
  FLOOR((log10(l_extendedprice)) * 1e6 + 0.5) / 1e6                   AS log10_price,
  FLOOR((sqrt(l_quantity)) * 1e6 + 0.5) / 1e6                         AS sqrt_qty,
  FLOOR((pow(l_discount, 2)) * 1e8 + 0.5) / 1e8                       AS disc_sq,
  ABS(l_quantity - 25)                               AS qty_dev,
  CAST(ceil(l_extendedprice / 1000) AS BIGINT)       AS price_kilo_ceil,
  CAST(floor(l_extendedprice / 1000) AS BIGINT)      AS price_kilo_floor,
  CAST(l_orderkey % 7 AS BIGINT)                     AS key_mod7,
  FLOOR((sin(l_discount) + cos(l_tax)) * 1e8 + 0.5) / 1e8             AS trig_mix,
  CAST(sign(l_quantity - 25) AS DOUBLE)              AS qty_sign
FROM lineitem
WHERE l_orderkey % 20 = 0
"""


@register(
    "q_math_functions",
    oracle=_QMATH_ORACLE,
    description="math scalar sweep: ln/log10/sqrt/pow/abs/ceil/floor/mod/trig/sign",
    tags=("scalar", "math"),
)
def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor((F.log("l_extendedprice")) * 1e6 + 0.5) / 1e6).alias("log_price"),
        (F.floor((F.log10("l_extendedprice")) * 1e6 + 0.5) / 1e6).alias("log10_price"),
        (F.floor((F.sqrt("l_quantity")) * 1e6 + 0.5) / 1e6).alias("sqrt_qty"),
        (F.floor((F.pow("l_discount", F.lit(2))) * 1e8 + 0.5) / 1e8).alias("disc_sq"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_kilo_ceil"),
        F.floor(F.col("l_extendedprice") / 1000)
        .cast("bigint")
        .alias("price_kilo_floor"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod7"),
        (F.floor((F.sin("l_discount") + F.cos("l_tax")) * 1e8 + 0.5) / 1e8).alias("trig_mix"),
        F.signum(F.col("l_quantity") - 25).cast("double").alias("qty_sign"),
    )


# --------------------------------------------------------------------------
# Array / higher-order functions over document tokens.
# --------------------------------------------------------------------------

_QARRAY_ORACLE = """
SELECT
  doc_id,
  CAST(len(string_split(text, ' ')) AS INTEGER)                          AS n_tokens,
  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)          AS n_unique_tokens,
  CASE WHEN list_contains(string_split(text, ' '), 'spark')
       THEN 1 ELSE 0 END                                                 AS mentions_spark,
  string_split(text, ' ')[1]                                             AS first_token,
  CAST(list_sum(list_transform(string_split(text, ' '),
                               t -> length(t))) AS BIGINT)               AS total_token_chars,
  array_to_string(list_sort(list_distinct(string_split(
      substr(text, 1, 40), ' '))), '|')                                  AS head_tokens_sorted
FROM documents
"""


@register(
    "q_array_functions",
    oracle=_QARRAY_ORACLE,
    description="array + higher-order functions: split/size/distinct/contains/transform/aggregate/sort",
    tags=("scalar", "array", "higher_order"),
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.when(F.array_contains(toks, "spark"), 1).otherwise(0).alias("mentions_spark"),
        F.element_at(toks, 1).alias("first_token"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        ).alias("total_token_chars"),
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.substring("text", 1, 40), " "))),
            "|",
        ).alias("head_tokens_sorted"),
    )


# --------------------------------------------------------------------------
# JSON extraction from events.props.
# --------------------------------------------------------------------------

_QJSON_ORACLE = f"""
SELECT
  event_type,
  COUNT(*)                                                       AS n_events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
       AS BIGINT)                                                AS sum_k,
  {rdiv_halfup_duck(
      "SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))",
      "COUNT(CAST(json_extract_string(props, '$.k') AS INTEGER))",
      4,
  )} AS avg_k
FROM events
GROUP BY event_type
"""


@register(
    "q_json_extract",
    oracle=_QJSON_ORACLE,
    description="JSON field extraction (events.props) + aggregate",
    tags=("scalar", "json"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).cast("bigint").alias("sum_k"),
            F.count(k).alias("n_k"),
        )
        .select(
            "event_type",
            "n_events",
            "sum_k",
            rdiv_halfup_expr("sum_k", "n_k", 4).alias("avg_k"),
        )
    )


# --------------------------------------------------------------------------
# Conditional / null-handling expressions.
# --------------------------------------------------------------------------

_QCOND_ORACLE = """
SELECT
  c_custkey,
  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER')   AS segment_masked,
  FLOOR((GREATEST(c_acctbal, 0.0)) * 1e2 + 0.5) / 1e2                    AS bal_floor0,
  FLOOR((LEAST(c_acctbal, 5000.0)) * 1e2 + 0.5) / 1e2                    AS bal_cap5k,
  CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END         AS bal_is_null,
  CAST(IF(c_acctbal < 0, 1, 0) AS INTEGER)              AS in_debt
FROM customer
"""


@register(
    "q_conditional_null",
    oracle=_QCOND_ORACLE,
    description="coalesce/nullif/greatest/least/if null-handling sweep",
    tags=("scalar", "conditional"),
)
def q_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("segment_masked"),
        (F.floor((F.greatest(F.col("c_acctbal"), F.lit(0.0))) * 1e2 + 0.5) / 1e2).alias("bal_floor0"),
        (F.floor((F.least(F.col("c_acctbal"), F.lit(5000.0))) * 1e2 + 0.5) / 1e2).alias("bal_cap5k"),
        F.when(F.col("c_acctbal").isNull(), 1).otherwise(0).alias("bal_is_null"),
        F.when(F.col("c_acctbal") < 0, 1).otherwise(0).alias("in_debt"),
    )
