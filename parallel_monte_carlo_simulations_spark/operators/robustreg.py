"""Huber robust regression by IRLS, exactly DuckDB-oracled.

Ordinary least squares is wrecked by heavy-tailed outliers; Huber's
M-estimator (Huber 1964) downweights residuals beyond a threshold k:
``w_i = min(1, k / |r_i|)``. Two IRLS steps over the lineitem
(quantity -> extended price) relation, with the same cross-engine
machinery as the logistic IRLS (``logreg.py``):

- x = l_quantity is ALREADY discrete (integer 1..50), so the exact
  integer moments of step 0 (plain OLS via Cramer) need no bucketing;
- step-0 coefficients are one division of exact-integer-derived doubles
  (IEEE-exact cross-engine);
- steps 1-2 compute per-row Huber weights from the previous line's
  residuals (all +,-,*,/,ABS,LEAST on identical doubles), then
  floor-quantize each weighted moment TERM at 1e4 scale and sum as
  BIGINT — order-independent exact sums;
- one shared SQL text for both engines.

Scale: each IRLS step is one map-side expression + one 5-number
aggregation; nothing but the quantized moments crosses the wire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import table

#: Huber threshold in price units (dollars).
HUBER_K = 20_000.0


def _mom(pref: str, w: str, src: str) -> str:
    """Five quantized weighted moments as BIGINT sums (TERM-quantized)."""
    q = "CAST(floor({t} * 1e4 + 0.5e0) AS BIGINT)"
    terms = {
        "sw": f"({w})",
        "swx": f"(({w}) * x)",
        "swxx": f"(({w}) * x * x)",
        "swy": f"(({w}) * y)",
        "swxy": f"(({w}) * x * y)",
    }
    cols = ", ".join(
        f"CAST(SUM({q.format(t=t)}) AS DOUBLE) / 1e4 AS {pref}{name}"
        for name, t in terms.items()
    )
    return f"SELECT {cols} FROM {src}"


def _beta(pref: str) -> tuple[str, str]:
    det = f"({pref}sw * {pref}swxx - {pref}swx * {pref}swx)"
    b = f"(({pref}sw * {pref}swxy - {pref}swx * {pref}swy) / {det})"
    a = f"(({pref}swxx * {pref}swy - {pref}swx * {pref}swxy) / {det})"
    return a, b


def _body() -> str:
    a0, b0 = _beta("m0.")
    a1, b1 = _beta("m1.")
    a2, b2 = _beta("m2.")
    w1 = f"LEAST(1e0, {HUBER_K!r}e0 / ABS(y - ({a0} + {b0} * x)))"
    w2 = f"LEAST(1e0, {HUBER_K!r}e0 / ABS(y - ({a1} + {b1} * x)))"
    return f"""
WITH pts AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
         CAST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS DOUBLE)
           / 100e0 AS y
  FROM lineitem
),
m0 AS ({_mom('', '1e0', 'pts')}),
w1t AS (
  SELECT pts.x, pts.y, {w1} AS w
  FROM pts CROSS JOIN m0
),
m1 AS ({_mom('', 'w', 'w1t')}),
w2t AS (
  SELECT pts.x, pts.y,
         (SELECT {w2.replace('m1.', '')} FROM m1) AS w
  FROM pts
),
m2 AS ({_mom('', 'w', 'w2t')})
SELECT FLOOR(((SELECT {a2.replace('m2.', '')} FROM m2)) * 1e4 + 0.5) / 1e4 AS intercept,
       FLOOR(((SELECT {b2.replace('m2.', '')} FROM m2)) * 1e4 + 0.5) / 1e4 AS slope,
       FLOOR(((SELECT {a0.replace('m0.', '')} FROM m0)) * 1e4 + 0.5) / 1e4 AS ols_intercept,
       FLOOR(((SELECT {b0.replace('m0.', '')} FROM m0)) * 1e4 + 0.5) / 1e4 AS ols_slope,
       (SELECT CAST(sw AS BIGINT) FROM m0) AS n_rows
"""


_ORACLE = _body()


@register(
    "q_ml_huber_regression",
    oracle=_ORACLE,
    description=(
        "Huber robust regression (2 IRLS steps, k=20000) of extended "
        "price on quantity: exact-integer OLS start, per-row weights on "
        "identical doubles, term-quantized moment sums — vs the plain "
        "OLS fit side by side"
    ),
    tags=("ml", "robust", "huber", "irls", "statistics", "aggregate"),
)
def q_ml_huber_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_ORACLE)
