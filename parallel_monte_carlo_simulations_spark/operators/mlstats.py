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
       ROUND((cov_n / var_x) / 100.0e0, 6) AS slope,
       ROUND(((sy - ((cov_n / var_x) * sx)) / n) / 100.0e0, 6) AS intercept,
       ROUND((cov_n * cov_n) / (var_x * var_y), 6) AS r2,
       ROUND((((sy - ((cov_n / var_x) * sx)) / n) / 100.0e0)
             + (((cov_n / var_x) / 100.0e0) * 25.0e0), 4) AS yhat_at_25
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
        F.round(slope_c / 100.0, 6).alias("slope"),
        F.round((intercept_c / 100.0), 6).alias("intercept"),
        F.round(
            (F.col("cov_n") * F.col("cov_n")) / (F.col("var_x") * F.col("var_y")), 6
        ).alias("r2"),
        F.round((intercept_c / 100.0) + ((slope_c / 100.0) * 25.0), 4).alias(
            "yhat_at_25"
        ),
    ).orderBy("l_returnflag")
