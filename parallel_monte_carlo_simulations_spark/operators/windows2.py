"""Window functions batch 2: RANGE frames (value-based, not row-based)
and argmin/argmax aggregates (min_by/max_by)."""

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

# --------------------------------------------------------------------------
# RANGE frame: peers within a VALUE band, not a row count.
# --------------------------------------------------------------------------

_QRANGEF_ORACLE = f"""
WITH r AS (
  SELECT
    s_suppkey,
    FLOOR((s_acctbal) * 1e2 + 0.5) / 1e2 AS acctbal,
    CAST(COUNT(*) OVER (
      ORDER BY s_acctbal RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING
    ) AS BIGINT)        AS n_peers_within_500,
    SUM({units_sql("s_acctbal", 2)}) OVER (
      ORDER BY s_acctbal RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING
    )                   AS band_u2
  FROM supplier
)
SELECT s_suppkey, acctbal, n_peers_within_500,
       {rdiv_halfup_duck("band_u2", "n_peers_within_500 * 100", 4)}
         AS band_avg
FROM r
"""


@register(
    "q_window_range_frame",
    oracle=_QRANGEF_ORACLE,
    description="RANGE (value-based) frame: peers within an acctbal band",
    tags=("window", "range_frame"),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-RANGE frame without the global sort (round 11): tile the
    value axis into fixed 1000-wide grid cells (= 2x the 500 radius) and
    replicate each row into every cell its +-500 frame touches — a
    length-1000 closed interval spans at most TWO width-1000 cells, so
    each row gets <= 2 copies. The range frame then runs PER CELL: for a
    home row x, every peer within 500 has a copy in x's cell (floor is
    monotone), copies outside the frame are excluded by the RANGE bound
    itself, and results are kept only for home rows. Same frame row-set
    as the oracle's global window, cell-parallel."""
    s = table(spark, sf_dir, "supplier")
    cells = F.array_distinct(
        F.array(
            F.floor((F.col("s_acctbal") - 500) / 1000),
            F.floor((F.col("s_acctbal") + 500) / 1000),
        )
    )
    tiled = s.select(
        "s_suppkey",
        "s_acctbal",
        F.floor(F.col("s_acctbal") / 1000).alias("home"),
        F.explode(cells).alias("cell"),
    )
    w = (
        Window.partitionBy("cell")
        .orderBy("s_acctbal")
        .rangeBetween(-500, 500)
    )
    return (
        tiled.select(
            "s_suppkey",
            "home",
            "cell",
            (F.floor((F.col("s_acctbal")) * 1e2 + 0.5) / 1e2).alias("acctbal"),
            F.count(F.lit(1)).over(w).alias("n_peers_within_500"),
            F.sum(units_col(F.col("s_acctbal"), 2)).over(w).alias("band_u2"),
        )
        .filter(F.col("cell") == F.col("home"))
        .select(
            "s_suppkey",
            "acctbal",
            "n_peers_within_500",
            # signed string-form division: acctbal (and so the band sum)
            # can be negative — rdiv quantizes |num|/den and prefixes
            # the sign, never emitting -0.0000.
            rdiv_halfup_expr("band_u2", "n_peers_within_500 * 100", 4).alias(
                "band_avg"
            ),
        )
    )


# --------------------------------------------------------------------------
# min_by / max_by aggregates (argmin/argmax without a join-back).
# --------------------------------------------------------------------------

_QMINBY_ORACLE = """
SELECT
  o_orderpriority,
  arg_max(o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                      * 10000000000 + o_orderkey) AS priciest_order,
  arg_min(o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                      * 10000000000 + o_orderkey) AS cheapest_order,
  FLOOR((MAX(o_totalprice)) * 1e2 + 0.5) / 1e2       AS max_price,
  FLOOR((MIN(o_totalprice)) * 1e2 + 0.5) / 1e2       AS min_price
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "q_agg_min_max_by",
    oracle=_QMINBY_ORACLE,
    description=(
        "max_by/min_by argmin-argmax aggregates (no join-back) with an "
        "explicit composite tie-break"
    ),
    tags=("aggregate", "min_by"),
)
def q_agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The ordering value is the COMPOSITE cents(price)*1e10 + orderkey
    # (one exact BIGINT — DuckDB's arg_max can't order structs), never
    # the bare price: the r12 sf1.0 spot-sweep proved the old "no ties
    # at our SFs" assumption does not survive scale (the 10x-tiled data
    # duplicates every price), and argmin/argmax over a tied value is
    # engine-arbitrary. With the composite, ties pick the largest /
    # smallest orderkey deterministically in both engines. Headroom:
    # cents <= 5e7, so composite <= 5e17 < 2^63; orderkey < 1e10 by
    # construction at any tiled SF here.
    o = table(spark, sf_dir, "orders")
    tie = (
        F.round(F.col("o_totalprice") * 100, 0).cast("long")
        * F.lit(10_000_000_000).cast("long")
        + F.col("o_orderkey")
    )
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", tie).alias("priciest_order"),
        F.min_by("o_orderkey", tie).alias("cheapest_order"),
        (F.floor((F.max("o_totalprice")) * 1e2 + 0.5) / 1e2).alias("max_price"),
        (F.floor((F.min("o_totalprice")) * 1e2 + 0.5) / 1e2).alias("min_price"),
    )


# --------------------------------------------------------------------------
# Array set algebra between token arrays of adjacent docs.
# --------------------------------------------------------------------------

_QARRSET_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_distinct(string_split(text, ' ')) AS toks
  FROM documents WHERE doc_id < 50
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.toks AS ta, b.toks AS tb
  FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
)
SELECT
  doc_a,
  doc_b,
  CAST(len(list_intersect(ta, tb)) AS INTEGER)                    AS n_common,
  CAST(len(list_distinct(list_concat(ta, tb))) AS INTEGER)        AS n_union,
  CAST(len(list_filter(ta, x -> NOT list_contains(tb, x)))
       AS INTEGER)                                                AS n_only_a
FROM p
"""


@register(
    "q_array_set_ops",
    oracle=_QARRSET_ORACLE,
    description="array set algebra: intersect/union/except on token sets",
    tags=("scalar", "array", "setops"),
)
def q_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    t = d.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    a = t.alias("a")
    b = t.alias("b")
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.size(F.array_intersect("a.toks", "b.toks")).alias("n_common"),
            F.size(F.array_union("a.toks", "b.toks")).alias("n_union"),
            F.size(F.array_except("a.toks", "b.toks")).alias("n_only_a"),
        )
    )


_QSHARE_ORACLE = f"""
WITH sums AS (
  SELECT o_orderpriority, o_orderstatus,
         SUM({units_sql("o_totalprice", 2)}) AS grp_u2
  FROM orders
  GROUP BY o_orderpriority, o_orderstatus
)
SELECT o_orderpriority, o_orderstatus,
       {rdiv_halfup_duck("grp_u2", "100", 2)} AS grp_total,
       {rdiv_halfup_duck(
           "grp_u2",
           "SUM(grp_u2) OVER (PARTITION BY o_orderpriority)",
           6,
       )} AS share_of_priority,
       {rdiv_halfup_duck("grp_u2", "SUM(grp_u2) OVER ()", 6)}
         AS share_of_total
FROM sums
"""


@register(
    "q_window_share_of_total",
    oracle=_QSHARE_ORACLE,
    description=(
        "ratio-to-report: each group's revenue share of its parent level "
        "and of the grand total via unpartitioned window sums"
    ),
    tags=("window", "share", "aggregate", "report"),
)
def q_window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ratio-to-report reporting shape: aggregate once, then two
    window sums — one per parent level, one over the whole frame — give
    each row its contribution share without re-scanning or self-joining.
    The unpartitioned window is a single-partition exchange of the
    ALREADY-AGGREGATED rows (group count, not fact count), which is the
    only reason it is scale-safe. Cent-unit BIGINT group sums keep the
    shares' numerators exact, and the string-form half-up division
    renders identical 6-digit shares in both engines (r13 raw-double
    ratio elimination)."""
    o = table(spark, sf_dir, "orders")
    sums = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.sum(units_col(F.col("o_totalprice"), 2)).alias("grp_u2")
    )
    w_pri = Window.partitionBy("o_orderpriority")
    w_all = Window.partitionBy()
    return sums.select(
        "o_orderpriority",
        "o_orderstatus",
        "grp_u2",
        F.sum("grp_u2").over(w_pri).alias("pri_u2"),
        F.sum("grp_u2").over(w_all).alias("all_u2"),
    ).select(
        "o_orderpriority",
        "o_orderstatus",
        rdiv_halfup_expr("grp_u2", "100", 2).alias("grp_total"),
        rdiv_halfup_expr("grp_u2", "pri_u2", 6).alias("share_of_priority"),
        rdiv_halfup_expr("grp_u2", "all_u2", 6).alias("share_of_total"),
    )


_QFILTER_AGG_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
       CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_large,
       CAST(FLOOR((SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  FILTER (WHERE o_orderstatus = 'O')) * 1e2 + 0.5) / 1e2 AS DOUBLE) AS open_value
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "q_agg_filter_clause",
    oracle=_QFILTER_AGG_ORACLE,
    description=(
        "ANSI FILTER (WHERE ...) aggregates: per-predicate counts and a "
        "filtered decimal sum in one pass (identical SQL both engines)"
    ),
    tags=("aggregate", "filter_clause", "sql"),
)
def q_agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI FILTER clause — several differently-predicated
    aggregates in ONE scan and one shuffle, where the naive formulation
    unions per-predicate subqueries. Same SQL text on both engines via
    the SQL front-end."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_QFILTER_AGG_ORACLE)


_QCUMDIST_ORACLE = """
WITH f AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
),
newu AS (
  SELECT d0 AS day, CAST(COUNT(*) AS BIGINT) AS n_new FROM f GROUP BY d0
),
act AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
  FROM events GROUP BY CAST(ts AS DATE)
)
SELECT STRFTIME(a.day, '%Y-%m-%d') AS day, a.n_active,
       COALESCE(n.n_new, 0) AS n_new_users,
       CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY a.day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_distinct_users
FROM act a LEFT JOIN newu n ON n.day = a.day
ORDER BY a.day
"""


@register(
    "q_cumulative_distinct_users",
    oracle=_QCUMDIST_ORACLE,
    description=(
        "distinct-users-to-date per day via the first-seen trick: "
        "cumulative distinct as one groupBy + running sum, no growing "
        "per-day state"
    ),
    tags=("window", "incremental", "distinct", "timeseries", "scale"),
)
def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-to-date is the canonical "needs a sketch" metric — the
    naive form re-counts a growing set per day (O(days x users) work).
    The first-seen rewrite is exact with BOUNDED work: MIN(event date)
    per user (one groupBy), daily new-user counts, one running sum over
    the (tiny) day spine. At 100 TB this is two shuffles on keys that
    aggregate DOWN (users, then days) — the pattern every growth
    dashboard should compile to."""
    from ..tables import table as _t

    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    f = ev.groupBy("user_id").agg(F.min("day").alias("d0"))
    newu = f.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    act = ev.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("n_active")
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        act.join(newu, on="day", how="left")
        .select(
            "day",
            "n_active",
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new_users"),
        )
        .withColumn(
            "cum_distinct_users",
            F.sum("n_new_users").over(w).cast("long"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_active",
            "n_new_users",
            "cum_distinct_users",
        )
        .orderBy("day")
    )
