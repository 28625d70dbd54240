"""Data-quality expectation suite: declarative constraint checks as one
unioned aggregation pass (the Deequ / Great Expectations pattern).

Each expectation is a named rule evaluated to (checked, violations):

- **uniqueness**: o_orderkey has no duplicates; (l_orderkey,
  l_linenumber) is a proper composite key.
- **referential integrity**: every lineitem points at an existing
  order; every order at an existing customer (anti-join counts).
- **completeness**: no NULL order dates.
- **range**: prices positive; discount within [0, 1]; shipdate not
  before orderdate (cross-table temporal sanity).
- **accepted values**: order status within its domain.

All counts are exact integers; the result is the audit table a 100 TB
nightly pipeline would write per partition. Scale: every rule is a
grouped count or an anti-join on the table's natural key — one shuffle
each, assembled with unionByName; Spark runs the rules as independent
stages of one job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QDQ_ORACLE = """
WITH dup_orders AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS checked,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS violations
  FROM orders
),
dup_lineitem_key AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS checked,
         CAST(COUNT(*) - (SELECT COUNT(*) FROM
           (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem) d)
           AS BIGINT) AS violations
  FROM lineitem
),
orphan_lineitems AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS checked,
         CAST(COUNT(*) AS BIGINT) AS violations
  FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
),
orphan_orders AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS checked,
         CAST(COUNT(*) AS BIGINT) AS violations
  FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
),
null_orderdate AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS checked,
         CAST(COUNT(*) FILTER (o_orderdate IS NULL) AS BIGINT) AS violations
  FROM orders
),
price_positive AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS checked,
         CAST(COUNT(*) FILTER (o_totalprice <= 0) AS BIGINT) AS violations
  FROM orders
),
discount_range AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS checked,
         CAST(COUNT(*) FILTER (l_discount < 0 OR l_discount > 1)
              AS BIGINT) AS violations
  FROM lineitem
),
ship_after_order AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS checked,
         CAST(COUNT(*) FILTER (l.l_shipdate < o.o_orderdate)
              AS BIGINT) AS violations
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
status_domain AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS checked,
         CAST(COUNT(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P'))
              AS BIGINT) AS violations
  FROM orders
)
SELECT rule, checked, violations,
       CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
FROM (
  SELECT 'unique_order_key' AS rule, * FROM dup_orders
  UNION ALL SELECT 'unique_lineitem_composite_key', * FROM dup_lineitem_key
  UNION ALL SELECT 'lineitem_fk_orders', * FROM orphan_lineitems
  UNION ALL SELECT 'orders_fk_customer', * FROM orphan_orders
  UNION ALL SELECT 'orderdate_not_null', * FROM null_orderdate
  UNION ALL SELECT 'price_positive', * FROM price_positive
  UNION ALL SELECT 'discount_in_unit_range', * FROM discount_range
  UNION ALL SELECT 'shipdate_after_orderdate', * FROM ship_after_order
  UNION ALL SELECT 'orderstatus_in_domain', * FROM status_domain
) all_rules
ORDER BY rule
"""


def _rule(name: str, checked: Column, violations: Column, df: DataFrame) -> DataFrame:
    return df.agg(
        F.lit(name).alias("rule"),
        checked.alias("checked"),
        violations.alias("violations"),
    )


@register(
    "q_dq_expectations",
    oracle=_QDQ_ORACLE,
    description=(
        "data-quality expectation suite (Deequ-style): uniqueness, "
        "referential integrity, completeness, ranges, accepted values — "
        "one exact audit table"
    ),
    tags=("data-quality", "audit", "anti-join", "aggregate", "llm-pipeline"),
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    c = table(spark, sf_dir, "customer")

    cnt = F.count("*")
    rules = [
        _rule(
            "unique_order_key",
            cnt,
            cnt - F.countDistinct("o_orderkey"),
            o,
        ),
        _rule(
            "unique_lineitem_composite_key",
            cnt,
            cnt
            - F.countDistinct(
                F.struct("l_orderkey", "l_linenumber")
            ),
            l,
        ),
        # FK rules: 'checked' (the referencing table's size) is patched
        # in after the union, since the anti-join frame only carries
        # violating rows.
        _rule(
            "lineitem_fk_orders",
            F.lit(None).cast("long"),
            cnt,
            l.join(o, l.l_orderkey == o.o_orderkey, "left_anti"),
        ),
        _rule(
            "orders_fk_customer",
            F.lit(None).cast("long"),
            cnt,
            o.join(c, o.o_custkey == c.c_custkey, "left_anti"),
        ),
        _rule(
            "orderdate_not_null",
            cnt,
            F.count(F.when(F.col("o_orderdate").isNull(), 1)),
            o,
        ),
        _rule(
            "price_positive",
            cnt,
            F.count(F.when(F.col("o_totalprice") <= 0, 1)),
            o,
        ),
        _rule(
            "discount_in_unit_range",
            cnt,
            F.count(
                F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
            ),
            l,
        ),
        _rule(
            "shipdate_after_orderdate",
            cnt,
            F.count(F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1)),
            l.join(o, l.l_orderkey == o.o_orderkey),
        ),
        _rule(
            "orderstatus_in_domain",
            cnt,
            F.count(
                F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
            ),
            o,
        ),
    ]
    checks = rules[0]
    for r in rules[1:]:
        checks = checks.unionByName(r)
    # the two FK rules report the referencing table's size as 'checked'
    l_total = l.agg(F.count("*").alias("lt"))
    o_total = o.agg(F.count("*").alias("ot"))
    checks = (
        checks.crossJoin(F.broadcast(l_total))
        .crossJoin(F.broadcast(o_total))
        .select(
            "rule",
            F.when(F.col("rule") == "lineitem_fk_orders", F.col("lt"))
            .when(F.col("rule") == "orders_fk_customer", F.col("ot"))
            .otherwise(F.col("checked"))
            .alias("checked"),
            "violations",
        )
    )
    return checks.select(
        "rule",
        "checked",
        "violations",
        F.when(F.col("violations") == 0, F.lit("pass"))
        .otherwise(F.lit("fail"))
        .alias("status"),
    ).orderBy("rule")


# --------------------------------------------------------------------------
# Financial reconciliation: header totals vs line-level recomputation.
# --------------------------------------------------------------------------

_QRECON_ORACLE = """
WITH lines AS (
  SELECT l_orderkey AS okey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS line_cents
  FROM lineitem
  GROUP BY l_orderkey
),
recon AS (
  SELECT o.o_orderkey,
         CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS header_cents,
         COALESCE(l.line_cents, 0) AS line_cents
  FROM orders o LEFT JOIN lines l ON l.okey = o.o_orderkey
),
scored AS (
  SELECT *,
         ABS(header_cents - line_cents) AS delta_cents,
         CASE WHEN line_cents = 0 THEN 'no_lines'
              WHEN ABS(header_cents - line_cents) * 100
                     <= header_cents THEN 'within_1pct'
              ELSE 'mismatch' END AS bucket
  FROM recon
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       FLOOR((CAST(SUM(delta_cents) AS DOUBLE) / 100.0e0) * 1e2 + 0.5) / 1e2
         AS total_abs_delta,
       FLOOR((CAST(MAX(delta_cents) AS DOUBLE) / 100.0e0) * 1e2 + 0.5) / 1e2 AS max_abs_delta
FROM scored
GROUP BY bucket
ORDER BY bucket
"""


@register(
    "q_dq_reconciliation",
    oracle=_QRECON_ORACLE,
    description=(
        "financial reconciliation audit: order header totals vs "
        "line-level recomputation (sum of discounted extended prices), "
        "bucketed by within-1%/mismatch/no-lines — exact cent deltas"
    ),
    tags=("data-quality", "reconciliation", "audit", "join", "aggregate"),
)
def q_dq_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The double-entry check every billing warehouse runs nightly: the
    denormalized header amount must re-derive from its lines. Exact
    cent-integer arithmetic; the integer cross-multiplied 1% band
    (delta*100 <= header) avoids float rates. One groupBy on the order
    key + one broadcast-free equi-join keyed the same way."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    lines = l.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
            ).cast("long")
        ).alias("line_cents")
    )
    recon = o.join(lines, o.o_orderkey == F.col("okey"), "left").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias(
            "header_cents"
        ),
        F.coalesce(F.col("line_cents"), F.lit(0)).alias("line_cents"),
    )
    scored = recon.select(
        "*",
        F.abs(F.col("header_cents") - F.col("line_cents")).alias(
            "delta_cents"
        ),
    ).select(
        "*",
        F.when(F.col("line_cents") == 0, F.lit("no_lines"))
        .when(
            F.col("delta_cents") * 100 <= F.col("header_cents"),
            F.lit("within_1pct"),
        )
        .otherwise(F.lit("mismatch"))
        .alias("bucket"),
    )
    return (
        scored.groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            (F.floor((F.sum("delta_cents").cast("double") / F.lit(100.0)) * 1e2 + 0.5) / 1e2).alias("total_abs_delta"),
            (F.floor((F.max("delta_cents").cast("double") / F.lit(100.0)) * 1e2 + 0.5) / 1e2).alias("max_abs_delta"),
        )
        .orderBy("bucket")
    )
