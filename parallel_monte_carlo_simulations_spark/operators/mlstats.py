"""Closed-form OLS regression from EXACT sufficient statistics.

Distributed linear regression is one aggregation: the per-group
sufficient statistics (n, Σx, Σy, Σxx, Σxy, Σyy) commute and associate,
so the whole fit is a map-side-combined ``groupBy`` shipping six numbers
per group — the canonical "training at 100 TB is an agg" pattern (same
shape as the LSMC regression rounds in ``mc/lsmc.py``, which ship nine).

Cross-engine exactness is engineered, not hoped for: floating-point SUM
is order-dependent (Spark's partial aggregation order is
nondeterministic, DuckDB's is sequential), and the slope's
``n·Σxy − Σx·Σy`` numerator is a catastrophic-cancellation amplifier for
those last-ulp differences. So both engines aggregate *integers*:
quantity is integral already, price is converted to integer cents, and
the sums run in Spark DECIMAL / DuckDB HUGEINT — both exact, therefore
identical. Only then do both engines convert to DOUBLE and evaluate the
same expression tree with the same association, so every intermediate
IEEE operation — and the rounded result — matches bit-for-bit.

Query: price ~ quantity per return flag (slope, intercept, R², and the
fitted value at quantity 25), over lineitem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_OLS_ORACLE = """
WITH cents AS (
  SELECT l_returnflag,
         CAST(l_quantity AS HUGEINT) AS x,
         CAST(ROUND(l_extendedprice * 100, 0) AS HUGEINT) AS y
  FROM lineitem
),
stats AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(y * y) AS DOUBLE) AS syy,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM cents GROUP BY l_returnflag
),
fit AS (
  SELECT l_returnflag, n_rows,
         (n * sxy) - (sx * sy) AS cov_n,
         (n * sxx) - (sx * sx) AS var_x,
         (n * syy) - (sy * sy) AS var_y,
         n, sx, sy
  FROM stats
)
SELECT l_returnflag,
       n_rows,
       FLOOR(((cov_n / var_x) / 100.0e0) * 1e6 + 0.5) / 1e6 AS slope,
       FLOOR((((sy - ((cov_n / var_x) * sx)) / n) / 100.0e0) * 1e6 + 0.5) / 1e6 AS intercept,
       FLOOR(((cov_n * cov_n) / (var_x * var_y)) * 1e6 + 0.5) / 1e6 AS r2,
       FLOOR(((((sy - ((cov_n / var_x) * sx)) / n) / 100.0e0)
             + (((cov_n / var_x) / 100.0e0) * 25.0e0)) * 1e4 + 0.5) / 1e4 AS yhat_at_25
FROM fit
ORDER BY l_returnflag
"""


@register(
    "q_ols_regression",
    oracle=_OLS_ORACLE,
    description=(
        "closed-form OLS of extendedprice on quantity per return flag from "
        "exact integer sufficient statistics (slope, intercept, R², fit at 25)"
    ),
    tags=("ml", "regression", "statistics", "aggregate", "scale"),
)
def q_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # Integer sufficient statistics: x is integral quantity, y is price in
    # cents. DECIMAL(38,0) sums are exact, like the oracle's HUGEINT.
    x = F.col("l_quantity").cast("decimal(18,0)")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("decimal(18,0)")
    stats = (
        li.select(
            "l_returnflag",
            x.alias("x"),
            y.alias("y"),
            (x * x).alias("xx"),
            (x * y).alias("xy"),
            (y * y).alias("yy"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("x").cast("double").alias("sx"),
            F.sum("y").cast("double").alias("sy"),
            F.sum("xx").cast("double").alias("sxx"),
            F.sum("xy").cast("double").alias("sxy"),
            F.sum("yy").cast("double").alias("syy"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
    cov_n = (F.col("n") * F.col("sxy")) - (F.col("sx") * F.col("sy"))
    var_x = (F.col("n") * F.col("sxx")) - (F.col("sx") * F.col("sx"))
    var_y = (F.col("n") * F.col("syy")) - (F.col("sy") * F.col("sy"))
    fit = stats.select(
        "l_returnflag", "n_rows", "n", "sx", "sy",
        cov_n.alias("cov_n"), var_x.alias("var_x"), var_y.alias("var_y"),
    )
    slope_c = F.col("cov_n") / F.col("var_x")  # cents per unit quantity
    intercept_c = (F.col("sy") - (slope_c * F.col("sx"))) / F.col("n")
    return fit.select(
        "l_returnflag",
        "n_rows",
        (F.floor((slope_c / 100.0) * 1e6 + 0.5) / 1e6).alias("slope"),
        (F.floor(((intercept_c / 100.0)) * 1e6 + 0.5) / 1e6).alias("intercept"),
        (F.floor(((F.col("cov_n") * F.col("cov_n")) / (F.col("var_x") * F.col("var_y"))) * 1e6 + 0.5) / 1e6).alias("r2"),
        (F.floor(((intercept_c / 100.0) + ((slope_c / 100.0) * 25.0)) * 1e4 + 0.5) / 1e4).alias(
            "yhat_at_25"
        ),
    ).orderBy("l_returnflag")


_QGINI_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT v,
         ROW_NUMBER() OVER (ORDER BY v, o_custkey) AS i,
         COUNT(*) OVER () AS n,
         SUM(v) OVER () AS tv
  FROM spend
),
agg AS (
  SELECT CAST(SUM(i * v) AS BIGINT) AS siv,
         CAST(MAX(n) AS BIGINT) AS n,
         CAST(MAX(tv) AS BIGINT) AS tv,
         CAST(SUM(CASE WHEN i > n - ((n + 99) // 100) THEN v ELSE 0 END)
              AS BIGINT) AS top1
  FROM ranked
)
SELECT n AS n_customers, tv AS total_cents,
       FLOOR((((2.0e0 * CAST(siv AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(tv AS DOUBLE)))
             - ((CAST(n AS DOUBLE) + 1.0e0) / CAST(n AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS gini,
       FLOOR(((CAST(top1 AS DOUBLE) / CAST(tv AS DOUBLE)) * 100.0e0) * 1e4 + 0.5) / 1e4
         AS top1pct_share_pct
FROM agg
"""


@register(
    "q_gini_concentration",
    oracle=_QGINI_ORACLE,
    description=(
        "Gini coefficient and top-1% share of customer spend — exact "
        "integer rank-weighted sums, ranks via the range-bucketed kernel"
    ),
    tags=("statistics", "gini", "concentration", "curation", "window"),
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration metrics are a dataset-curation staple (how skewed
    are per-domain/per-author contributions?) as much as an economics
    one. Gini from the rank formula 2·Σ(i·x_i)/(n·Σx) − (n+1)/n: ranks,
    rank-weighted sums and the top-ceil(n/100) selection are all exact
    integers (the threshold is integer (n+99) div 100, never a float
    percent), so only the two final divisions run in doubles — mirrored
    association, exact oracle. Ranks come from the range-bucketed kernel
    (rankstats.py) over per-customer aggregates — no global-sort
    window; the oracle keeps the window form."""
    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("v")
    )
    # rank via the range-bucketed kernel (round 11) — no global-sort
    # window; n/tv come from a broadcast scalar, not whole-frame windows.
    from .rankstats import bucketed_running

    tot = spend.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("tv"),
    )
    ranked = bucketed_running(
        spend,
        axis="v",
        order=[F.col("v").asc(), F.col("o_custkey").asc()],
        cums={"i": F.lit(1)},
    ).crossJoin(F.broadcast(tot))
    agg = ranked.agg(
        F.sum(F.col("i") * F.col("v")).cast("long").alias("siv"),
        F.max("n").cast("long").alias("n"),
        F.max("tv").cast("long").alias("tv"),
        F.sum(
            F.when(
                F.col("i") > F.col("n") - F.expr("(n + 99) div 100"),
                F.col("v"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("top1"),
    )
    nd, tvd = F.col("n").cast("double"), F.col("tv").cast("double")
    return agg.select(
        F.col("n").alias("n_customers"),
        F.col("tv").alias("total_cents"),
        (F.floor((((F.lit(2.0) * F.col("siv").cast("double")) / (nd * tvd))
            - ((nd + F.lit(1.0)) / nd)) * 1e6 + 0.5) / 1e6).alias("gini"),
        (F.floor(((F.col("top1").cast("double") / tvd) * 100.0) * 1e4 + 0.5) / 1e4).alias(
            "top1pct_share_pct"
        ),
    )
