"""Data-quality / warehouse-maintenance operators a training-data
pipeline runs before and after curation: corpus heavy hitters, column
profiling, boolean/bitwise aggregate sweeps, and SCD Type 2 history
construction.

All four are pure built-in-function plans (zero Python in the hot
path); the profiling query's multi-distinct aggregate relies on
Catalyst's Expand-based rewrite, and the others are single
groupBy/window shuffles — nothing here degrades at 100 TB beyond the
inherent shuffle on the grouping key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.microunit import (
    rdiv_halfup_duck,
    rdiv_halfup_expr,
    units_col,
    units_sql,
)
from ..registry import register
from ..tables import table

_HH_FACTOR = 200  # heavy hitter = token with frequency > total/_HH_FACTOR


_QHH_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
clean AS (
  SELECT token FROM toks WHERE token <> ''
),
counts AS (
  SELECT token, COUNT(*) AS cnt FROM clean GROUP BY token
),
total AS (
  SELECT COUNT(*) AS n FROM clean
)
SELECT c.token, CAST(c.cnt AS BIGINT) AS cnt
FROM counts c, total t
WHERE c.cnt * {_HH_FACTOR} > t.n
"""


@register(
    "q_heavy_hitters",
    oracle=_QHH_ORACLE,
    description=(
        f"exact corpus heavy hitters: tokens with frequency > "
        f"total/{_HH_FACTOR} (the ground truth a Misra-Gries/CMS sketch "
        "approximates)"
    ),
    tags=("profiling", "text", "heavy_hitters", "aggregate"),
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters over the document corpus. The plan is the
    map-side-combinable groupBy a frequency sketch would shortcut:
    explode is a narrow fan-out, the token count partial-aggregates
    before the single shuffle, and the scalar total joins in as a
    broadcast — at 100 TB the only full-width pass is the token count
    itself. ``test_properties`` checks ``df.stat.freqItems`` (the
    sketch path) returns a superset of these exact hitters."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = toks.agg(F.count("*").alias("n"))
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") * _HH_FACTOR > F.col("n"))
        .select("token", F.col("cnt").cast("long").alias("cnt"))
    )


_QPROFILE_ORACLE = """
WITH src AS (
  SELECT *, NULLIF(o_orderstatus, 'O') AS o_status_nullable FROM orders
)
SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(o_orderkey) AS n_nulls,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
FROM src
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
       COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM src
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM src
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice),
       CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
       CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
FROM src
UNION ALL
SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
       COUNT(DISTINCT o_orderdate),
       strftime(MIN(o_orderdate), '%Y-%m-%d'),
       strftime(MAX(o_orderdate), '%Y-%m-%d')
FROM src
UNION ALL
SELECT 'o_status_nullable', COUNT(*), COUNT(*) - COUNT(o_status_nullable),
       COUNT(DISTINCT o_status_nullable),
       MIN(o_status_nullable), MAX(o_status_nullable)
FROM src
"""


@register(
    "q_profile_columns",
    oracle=_QPROFILE_ORACLE,
    description=(
        "column profiling: per-column rows/nulls/exact-distinct/min/max "
        "over orders in long format (the pre-ingest data-quality report)"
    ),
    tags=("profiling", "quality", "aggregate", "distinct"),
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler: a single aggregate computes every
    column's null count, exact distinct count, and min/max (Catalyst
    rewrites the multi-distinct via Expand — one shuffle, not one scan
    per column), then a stack() pivots the wide row into the long
    (column_name, metrics) report. The NULLIF-derived column exercises
    the null-counting path on data that otherwise has none."""
    o = table(spark, sf_dir, "orders").withColumn(
        "o_status_nullable", F.expr("NULLIF(o_orderstatus, 'O')")
    )

    def _min_max(col: str) -> tuple:
        if col == "o_totalprice":
            return (
                F.min(col).cast("decimal(18,2)").cast("string"),
                F.max(col).cast("decimal(18,2)").cast("string"),
            )
        if col == "o_orderdate":
            return (
                F.date_format(F.min(col), "yyyy-MM-dd"),
                F.date_format(F.max(col), "yyyy-MM-dd"),
            )
        return F.min(col).cast("string"), F.max(col).cast("string")

    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_status_nullable",
    ]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        lo, hi = _min_max(c)
        aggs += [
            (F.count("*") - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            lo.alias(f"{c}__min"),
            hi.alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_val, max_val)"
        ),
        F.col("n_rows").cast("long").alias("n_rows"),
    ).select(
        "column_name", "n_rows",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_val", "max_val",
    )


_QBOOLBIT_ORACLE = """
SELECT o_orderstatus,
       bool_and(o_totalprice > 1000)            AS all_over_1k,
       bool_or(o_totalprice > 400000)           AS any_over_400k,
       CAST(bit_and(o_orderkey % 256) AS BIGINT) AS key_bit_and,
       CAST(bit_or(o_orderkey % 256) AS BIGINT)  AS key_bit_or,
       CAST(bit_xor(o_orderkey % 256) AS BIGINT) AS key_bit_xor
FROM orders
GROUP BY o_orderstatus
"""


@register(
    "q_bool_bit_aggs",
    oracle=_QBOOLBIT_ORACLE,
    description="boolean (bool_and/bool_or) and bitwise (bit_and/or/xor) aggregates per group",
    tags=("profiling", "aggregate", "bitwise", "boolean"),
)
def q_bool_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("bool_and(o_totalprice > 1000)").alias("all_over_1k"),
        F.expr("bool_or(o_totalprice > 400000)").alias("any_over_400k"),
        F.expr("bit_and(o_orderkey % 256)").cast("long").alias("key_bit_and"),
        F.expr("bit_or(o_orderkey % 256)").cast("long").alias("key_bit_or"),
        F.expr("bit_xor(o_orderkey % 256)").cast("long").alias("key_bit_xor"),
    )


_QSCD2_ORACLE = """
SELECT user_id,
       event_type AS attribute,
       CAST(ROW_NUMBER() OVER w AS BIGINT)    AS version,
       CAST(epoch_us(ts) AS BIGINT)           AS from_us,
       CAST(LEAD(epoch_us(ts)) OVER w AS BIGINT) AS to_us,
       (LEAD(ts) OVER w IS NULL)              AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register(
    "q_scd2_history",
    oracle=_QSCD2_ORACLE,
    description=(
        "SCD Type 2 history build: per-user versioned validity intervals "
        "(effective_from/to, is_current) from the event change log"
    ),
    tags=("warehouse", "scd2", "window", "timeseries"),
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) construction: each user's
    change events become versioned rows whose validity interval is
    [ts, next ts), the last one open-ended/current. One window over
    (user_id, ts, event_id) — the event_id tie-break keeps the interval
    chain deterministic under duplicate timestamps (the sessionize
    lesson). Timestamps surface as epoch microseconds on both engines."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return e.select(
        "user_id",
        F.col("event_type").alias("attribute"),
        F.row_number().over(w).cast("long").alias("version"),
        us.cast("long").alias("from_us"),
        F.lead(us).over(w).cast("long").alias("to_us"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


_QABC_ORACLE = """
WITH rev AS (
  SELECT l_partkey AS part,
         CAST(FLOOR((SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6)))) * 1e2 + 0.5) / 1e2
              AS DECIMAL(18,2)) AS revenue
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT part, revenue,
         SUM(revenue) OVER (ORDER BY revenue DESC, part
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(revenue) OVER () AS total
  FROM rev
),
classed AS (
  SELECT part, revenue,
         CASE WHEN cum * 100 <= 80 * total THEN 'A'
              WHEN cum * 100 <= 95 * total THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT)          AS n_parts,
       CAST(SUM(revenue) AS DOUBLE)      AS class_revenue
FROM classed
GROUP BY abc_class
"""


@register(
    "q_abc_pareto",
    oracle=_QABC_ORACLE,
    description=(
        "ABC/Pareto classification: parts bucketed A (first 80% of "
        "cumulative revenue) / B (to 95%) / C (tail) via one running-"
        "share window"
    ),
    tags=("profiling", "window", "pareto", "analytics"),
)
def q_abc_pareto(spark, sf_dir: str):
    """The inventory-management classic (80/20 rule operationalized):
    rank items by revenue, classify on the cumulative share. Money
    discipline (the tpch3 decimal lesson): per-item revenue is cast to
    DECIMAL(18,2) so the running and total sums are EXACT and
    summation-order independent — the 80/95% boundary comparisons are
    integer-scaled decimal arithmetic, and the class revenue converts
    decimal->double only at output (bit-identical both engines). One
    window over the ranked items, one aggregate."""
    li = table(spark, sf_dir, "lineitem")
    # each price product casts to DECIMAL(18,6) BEFORE the sum: the
    # per-part total is then exact, so parts whose true revenue sits on
    # an exact half-cent round the same way in both engines (a raw
    # double sum differs in last ulps and flips the half-cent).
    rev = li.groupBy(F.col("l_partkey").alias("part")).agg(
        (F.floor((F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )) * 1e2 + 0.5) / 1e2)
        .cast("decimal(18,2)")
        .alias("revenue")
    )
    # running share via the range-bucketed kernel (round 11): exact
    # decimal offsets + within-bucket decimal cumsum reproduce the
    # global running sum bit-for-bit with no single-partition sort;
    # the grand total is a broadcast scalar, not a whole-frame window.
    from .rankstats import bucketed_running

    cum = bucketed_running(
        rev,
        axis=-F.col("revenue").cast("double"),
        order=[F.desc("revenue"), F.col("part").asc()],
        cums={"cum": F.col("revenue")},
    )
    total = rev.agg(F.sum("revenue").alias("total"))
    classed = cum.crossJoin(F.broadcast(total)).select(
        "part",
        "revenue",
        F.when(F.col("cum") * 100 <= 80 * F.col("total"), "A")
        .when(F.col("cum") * 100 <= 95 * F.col("total"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("revenue").cast("double").alias("class_revenue"),
    )


_QRFM_ORACLE = f"""
WITH base AS (
  SELECT o_custkey AS cust,
         MAX(o_orderdate)                 AS last_order,
         COUNT(*)                         AS frequency,
         SUM({units_sql("o_totalprice", 2)}) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT cust,
         NTILE(5) OVER (ORDER BY last_order DESC, cust) AS r,
         NTILE(5) OVER (ORDER BY frequency DESC, cust)  AS f,
         NTILE(5) OVER (ORDER BY monetary DESC, cust)   AS m
  FROM base
)
SELECT CAST(r AS INTEGER) AS r, CAST(f AS INTEGER) AS f,
       CAST(m AS INTEGER) AS m,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM scored
GROUP BY r, f, m
"""


@register(
    "q_customer_rfm",
    oracle=_QRFM_ORACLE,
    description=(
        "RFM segmentation: recency/frequency/monetary quintiles via "
        "NTILE with deterministic tie-breaks; segment sizes"
    ),
    tags=("profiling", "window", "rfm", "segmentation", "analytics"),
)
def q_customer_rfm(spark, sf_dir: str):
    """Marketing's standard customer segmentation. Quintiles come from
    NTILE(5) with (metric, cust) tie-breaks — NTILE's bucket boundaries
    depend only on the ROW ORDER, which the tie-break pins, so both
    engines cut identical quintiles even over heavily tied frequency
    counts. Monetary is rounded to cents before ranking for the same
    reason."""
    o = table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        # cent-unit BIGINT: monetary is an ORDERING key only, so the
        # exact integer ranks identically in both engines (r13).
        F.sum(units_col(F.col("o_totalprice"), 2)).alias("monetary"),
    )
    # three NTILE(5) cuts without three global-sort windows (round 11):
    # chain the range-bucketed rank kernel once per metric (each pass
    # preserves the frame and appends a rank), then closed-form the
    # quintile from (rank, n) — identical cuts to the window form.
    from .rankstats import bucketed_running, sql_ntile

    nc = base.agg(F.count(F.lit(1)).cast("long").alias("n_cust"))
    ranked = bucketed_running(
        base,
        axis=-F.col("last_order").cast("timestamp").cast("double"),
        order=[F.desc("last_order"), F.col("cust").asc()],
        cums={"rank_r": F.lit(1)},
    )
    ranked = bucketed_running(
        ranked,
        axis=-F.col("frequency"),
        order=[F.desc("frequency"), F.col("cust").asc()],
        cums={"rank_f": F.lit(1)},
    )
    ranked = bucketed_running(
        ranked,
        axis=-F.col("monetary"),
        order=[F.desc("monetary"), F.col("cust").asc()],
        cums={"rank_m": F.lit(1)},
    )
    scored = ranked.crossJoin(F.broadcast(nc)).select(
        "cust",
        sql_ntile(F.col("rank_r"), F.col("n_cust"), 5).alias("r"),
        sql_ntile(F.col("rank_f"), F.col("n_cust"), 5).alias("f"),
        sql_ntile(F.col("rank_m"), F.col("n_cust"), 5).alias("m"),
    )
    return scored.groupBy(
        F.col("r").cast("int").alias("r"),
        F.col("f").cast("int").alias("f"),
        F.col("m").cast("int").alias("m"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
