"""Scalar/aggregate sweep 3: ordered string aggregation (LISTAGG),
deterministic mode, bitwise ops, posexplode (ordinality), regexp
extract-all, width_bucket histograms, URL parsing, ordered array_agg,
months_between. All JVM-side built-ins — no Python in the hot path.

The reference has no scalar-function surface at all (its only
expressions live inside user model callables,
parallel_simulations/parallel_simulations.py:80-95); this sweep is part
of the §2.B analytics capability surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.microunit import rdiv_halfup_duck, rdiv_halfup_expr
from ..registry import register
from ..tables import table

# --------------------------------------------------------------------------
# LISTAGG / string_agg with an explicit ORDER BY (deterministic).
# --------------------------------------------------------------------------

_QLISTAGG_ORACLE = """
SELECT n_regionkey,
       string_agg(n_name, '|' ORDER BY n_name) AS nations
FROM nation
GROUP BY n_regionkey
"""


@register(
    "q_listagg_ordered",
    oracle=_QLISTAGG_ORACLE,
    description="LISTAGG with deterministic ORDER BY (string_agg parity)",
    tags=("aggregate", "listagg", "string"),
)
def q_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    # sort_array(collect_list) instead of relying on input order: input
    # order after a shuffle is nondeterministic, sorting inside the agg
    # result makes the query retry/AQE-safe.
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias("nations")
    )


# --------------------------------------------------------------------------
# Deterministic mode: most frequent value per group, ties broken by the
# value itself (Spark's mode() breaks ties arbitrarily → argmax instead).
# --------------------------------------------------------------------------

_QMODE_ORACLE = """
SELECT o_orderpriority, freq_status
FROM (
  SELECT o_orderpriority, o_orderstatus AS freq_status,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY COUNT(*) DESC, o_orderstatus) AS rn
  FROM orders
  GROUP BY o_orderpriority, o_orderstatus
)
WHERE rn = 1
"""


@register(
    "q_mode_deterministic",
    oracle=_QMODE_ORACLE,
    description="mode per group via count-argmax with total tie-break",
    tags=("aggregate", "mode", "window"),
)
def q_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").count()
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("count").desc(), F.col("o_orderstatus")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderpriority", F.col("o_orderstatus").alias("freq_status"))
    )


# --------------------------------------------------------------------------
# Bitwise operators over integer keys.
# --------------------------------------------------------------------------

_QBITWISE_ORACLE = """
SELECT
  o_orderkey,
  CAST(o_orderkey & 255 AS BIGINT)  AS and_lo,
  CAST(o_orderkey | 4096 AS BIGINT) AS or_hi,
  CAST(xor(o_orderkey, 21845) AS BIGINT) AS xored,
  CAST(o_orderkey << 2 AS BIGINT)   AS shifted,
  CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
FROM orders
WHERE o_orderkey < 100
"""


@register(
    "q_bitwise_ops",
    oracle=_QBITWISE_ORACLE,
    description="bitwise AND/OR/XOR/shift/popcount sweep",
    tags=("scalar", "bitwise"),
)
def q_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("and_lo"),
        k.bitwiseOR(F.lit(4096)).alias("or_hi"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).cast("bigint").alias("shifted"),
        F.bit_count(k).alias("popcount"),
    )


# --------------------------------------------------------------------------
# posexplode: token position matters (ordinality join in SQL engines).
# --------------------------------------------------------------------------

_QPOSEXPLODE_ORACLE = """
SELECT doc_id,
       CAST(i - 1 AS INTEGER) AS pos,
       toks[i] AS tok
FROM (SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 20) t,
     LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) u
WHERE i <= 4
"""


@register(
    "q_posexplode_tokens",
    oracle=_QPOSEXPLODE_ORACLE,
    description="posexplode (explode with ordinality) over token arrays",
    tags=("scalar", "explode", "position"),
)
def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
        .filter(F.col("pos") < 4)
    )


# --------------------------------------------------------------------------
# regexp_extract_all: all numeric runs in the free-text column.
# --------------------------------------------------------------------------

_QREXALL_ORACLE = """
SELECT doc_id,
       COALESCE(array_to_string(regexp_extract_all(text, '[0-9]+'), ','), '') AS nums,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_nums
FROM documents
WHERE doc_id < 100
"""


@register(
    "q_regexp_extract_all",
    oracle=_QREXALL_ORACLE,
    description="regexp_extract_all: every numeric run per document",
    tags=("scalar", "regexp", "array"),
)
def q_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Flattened with array_join: the driver's canonicalizer hashes values
    # through pandas sort_values, which cannot hash raw array columns
    # (registry.py column discipline — top-level outputs must be atomic).
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    # Explicit capture group + idx=1: the 2-arg Spark form defaults to
    # group index 1, and a groupless pattern only survives until the
    # first actual match (Spark validates the index lazily per match) —
    # latent at SFs whose first 100 docs contain no digits, caught by
    # the sf1.0 sweep the moment one did. Group 1 of ([0-9]+) is the
    # full numeric run, identical to DuckDB's group-0 extraction.
    nums = F.regexp_extract_all("text", F.lit("([0-9]+)"), 1)
    return d.select(
        "doc_id",
        F.array_join(nums, ",").alias("nums"),
        F.size(nums).alias("n_nums"),
    )


# --------------------------------------------------------------------------
# width_bucket histogram of order totals (DuckDB lacks width_bucket —
# oracle emulates with the same floor arithmetic).
# --------------------------------------------------------------------------

_QWIDTHBUCKET_ORACLE = """
SELECT bucket, COUNT(*) AS n_orders
FROM (
  SELECT CASE WHEN o_totalprice < 0 THEN CAST(0 AS BIGINT)
              WHEN o_totalprice >= 600000.0 THEN CAST(7 AS BIGINT)
              ELSE CAST(FLOOR(o_totalprice / 100000.0) AS BIGINT) + 1 END AS bucket
  FROM orders
)
GROUP BY bucket
"""


@register(
    "q_width_bucket_histogram",
    oracle=_QWIDTHBUCKET_ORACLE,
    description="width_bucket equi-width histogram of order totals",
    tags=("scalar", "histogram", "width_bucket"),
)
def q_width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    b = F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(6))
    return o.select(b.alias("bucket")).groupBy("bucket").agg(
        F.count("*").alias("n_orders")
    )


# --------------------------------------------------------------------------
# URL parsing: parse_url on Spark, regexp emulation in the oracle.
# --------------------------------------------------------------------------

_QURL_ORACLE = """
SELECT doc_id,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '[?&]q=([^&#]*)', 1) AS q_param
FROM (
  SELECT doc_id,
         'https://host' || CAST(doc_id % 7 AS VARCHAR)
           || '.example.com/p/' || CAST(doc_id AS VARCHAR)
           || '?q=t' || CAST(doc_id % 3 AS VARCHAR) AS url
  FROM documents WHERE doc_id < 50
)
"""


@register(
    "q_url_parse",
    oracle=_QURL_ORACLE,
    description="parse_url host/path/query-param extraction",
    tags=("scalar", "url", "string"),
)
def q_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    url = F.concat(
        F.lit("https://host"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/p/"),
        F.col("doc_id").cast("string"),
        F.lit("?q=t"),
        (F.col("doc_id") % 3).cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("q")).alias("q_param"),
    )


# --------------------------------------------------------------------------
# Ordered array_agg: per-customer order dates as a sorted array column.
# --------------------------------------------------------------------------

_QARRAYAGG_ORACLE = """
SELECT c_custkey,
       array_to_string(list(strftime(o_orderdate, '%Y-%m-%d') ORDER BY o_orderdate), ',')
         AS order_dates,
       CAST(COUNT(*) AS INTEGER) AS n_orders
FROM customer JOIN orders ON c_custkey = o_custkey
WHERE c_custkey < 200
GROUP BY c_custkey
"""


@register(
    "q_array_agg_ordered",
    oracle=_QARRAYAGG_ORACLE,
    description=(
        "array_agg into a sorted array column (collect_list + sort_array),"
        " flattened with array_join per the registry column discipline"
    ),
    tags=("aggregate", "array", "collect"),
)
def q_array_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200).select(
        "c_custkey"
    )
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    dates = F.sort_array(
        F.collect_list(F.date_format("o_orderdate", "yyyy-MM-dd"))
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey")
        .agg(
            F.array_join(dates, ",").alias("order_dates"),
            F.count("*").cast("int").alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# months_between / add_months interval arithmetic.
# --------------------------------------------------------------------------

_QMONTHS_ORACLE = f"""
SELECT o_orderkey,
       {rdiv_halfup_duck(
           "datediff('day', TIMESTAMP '1995-01-01', o_orderdate) * 16",
           "487", 2)}
         AS approx_months,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m
FROM orders
WHERE o_orderkey < 50
"""


@register(
    "q_interval_months",
    oracle=_QMONTHS_ORACLE,
    description="interval arithmetic: elapsed months + add_months",
    tags=("scalar", "date", "interval"),
)
def q_interval_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 50)
    # months_between uses calendar months (31-day months count fractionally
    # differently than DuckDB) → use day-count / mean-month-length on both
    # sides; add_months is calendar-exact on both.
    # exact rational: days / 30.4375 == days * 16 / 487 (30.4375 = 487/16)
    elapsed = rdiv_halfup_expr(
        "datediff(o_orderdate, timestamp '1995-01-01') * 16", "487", 2
    )
    return o.select(
        "o_orderkey",
        elapsed.alias("approx_months"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus3m"),
    )
