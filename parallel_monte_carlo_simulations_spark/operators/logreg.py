"""Logistic regression by IRLS, exactly DuckDB-oracled.

Two Newton/IRLS iterations of a binary logistic model — P(order is
high-priority | price) — computed entirely as SQL aggregations, using
the same cross-engine exactness machinery as the LSMC pricer
(``mc/lsmc.py``): one generated SQL text runs on BOTH engines, and
every place engines could drift is pinned:

- **Feature discretization first**: prices are bucketed to 256 integer
  bins ``((cents - lo) * 256) DIV (hi - lo + 1)``; the IRLS sums then
  run over per-bucket EXACT counts (n_b, pos_b). This is the scale
  design too — at 100 TB the first aggregation reduces the data to 256
  rows, and Newton steps cost one broadcast each.
- **Exact first iteration**: from beta = 0 the working weights are
  rational binary numbers (p = 1/2, w = 1/4, x = (2k+1)/512), so every
  iteration-1 moment is an exactly-representable double — no
  quantization needed, any summation order agrees.
- **Quantized second iteration**: iteration 2 evaluates exp() (the one
  libm call, ~1 ulp cross-engine): p is floor-quantized to 9 dp, and
  each per-bucket moment TERM is floor-quantized to an integer at 1e6
  scale and summed as BIGINT — order-independent exact sums.
- **Closed-form 2x2 solve**: Cramer's rule on identical doubles. IEEE
  +,-,*,/ are correctly rounded in both engines, so identical inputs +
  identical expression trees give bit-identical coefficients.

The model itself is standard (McCullagh & Nelder GLM IRLS); the
binned-feature variant is the WOE/scorecard formulation used in
credit-risk practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import table

N_BINS = 256


def _body() -> str:
    """One SQL text for both engines (Spark spelling; the oracle swaps
    ``DIV`` for ``//``)."""
    return f"""
WITH raw AS (
  SELECT CAST(floor(o_totalprice * 100e0 + 0.5e0) AS BIGINT) AS cents,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y
  FROM orders
),
bounds AS (
  SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM raw
),
buckets AS (
  SELECT ((r.cents - b.lo) * {N_BINS}) DIV (b.hi - b.lo + 1) AS bk,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(r.y) AS BIGINT) AS pos
  FROM raw r CROSS JOIN bounds b
  GROUP BY ((r.cents - b.lo) * {N_BINS}) DIV (b.hi - b.lo + 1)
),
x AS (
  SELECT bk, n, pos,
         (CAST(bk AS DOUBLE) + 0.5e0) / {float(N_BINS)!r}e0 AS xv
  FROM buckets
),
-- Iteration 1 from beta=(0,0): p=1/2, w=1/4. Every term below is an
-- exact binary rational — the sums agree under any association.
m1 AS (
  SELECT SUM(0.25e0 * n * xv * xv) AS sxx,
         SUM(0.25e0 * n * xv) AS sx,
         SUM(0.25e0 * n) AS s1,
         SUM((pos - 0.5e0 * n) * xv) AS gx,
         SUM(pos - 0.5e0 * n) AS g1
  FROM x
),
beta1 AS (
  SELECT (gx * s1 - g1 * sx) / (sxx * s1 - sx * sx) AS b1,
         (sxx * g1 - sx * gx) / (sxx * s1 - sx * sx) AS b0
  FROM m1
),
-- Iteration 2: p from exp() is floor-quantized to 9 dp; each moment
-- term is floor-quantized to an integer at 1e6 scale and summed as
-- BIGINT (order-independent exact sums).
p2 AS (
  SELECT x.bk, x.n, x.pos, x.xv,
         floor((1e0 / (1e0 + exp(-(beta1.b0 + beta1.b1 * x.xv)))) * 1e9
               + 0.5e0) / 1e9 AS p
  FROM x CROSS JOIN beta1
),
m2 AS (
  SELECT SUM(CAST(floor(n * p * (1e0 - p) * xv * xv * 1e6 + 0.5e0) AS BIGINT))
           AS isxx,
         SUM(CAST(floor(n * p * (1e0 - p) * xv * 1e6 + 0.5e0) AS BIGINT))
           AS isx,
         SUM(CAST(floor(n * p * (1e0 - p) * 1e6 + 0.5e0) AS BIGINT)) AS is1,
         SUM(CAST(floor((pos - n * p) * xv * 1e6 + 0.5e0) AS BIGINT)) AS igx,
         SUM(CAST(floor((pos - n * p) * 1e6 + 0.5e0) AS BIGINT)) AS ig1
  FROM p2
),
m2d AS (
  SELECT CAST(isxx AS DOUBLE) / 1e6 AS sxx,
         CAST(isx AS DOUBLE) / 1e6 AS sx,
         CAST(is1 AS DOUBLE) / 1e6 AS s1,
         CAST(igx AS DOUBLE) / 1e6 AS gx,
         CAST(ig1 AS DOUBLE) / 1e6 AS g1
  FROM m2
),
beta2 AS (
  SELECT beta1.b0 + (m.sxx * m.g1 - m.sx * m.gx)
                      / (m.sxx * m.s1 - m.sx * m.sx) AS b0,
         beta1.b1 + (m.gx * m.s1 - m.g1 * m.sx)
                      / (m.sxx * m.s1 - m.sx * m.sx) AS b1
  FROM m2d m CROSS JOIN beta1
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_buckets,
         CAST(SUM(pos) AS BIGINT) AS n_positive
  FROM x
)
SELECT FLOOR((beta2.b0) * 1e6 + 0.5) / 1e6 AS b0,
       FLOOR((beta2.b1) * 1e6 + 0.5) / 1e6 AS b1,
       FLOOR((floor((1e0 / (1e0 + exp(-(beta2.b0 + beta2.b1 * 0.5e0)))) * 1e9
                   + 0.5e0) / 1e9) * 1e6 + 0.5) / 1e6 AS p_at_mid,
       tot.n_rows, tot.n_buckets, tot.n_positive
FROM beta2 CROSS JOIN tot
"""


_ORACLE = _body().replace(" DIV ", " // ")


@register(
    "q_ml_logistic_irls",
    oracle=_ORACLE,
    description=(
        "logistic regression (2 IRLS/Newton iterations) of order "
        "priority on binned price: exact-rational first step, quantized "
        "exp second step, Cramer 2x2 solves — bit-identical cross-engine"
    ),
    tags=("ml", "logistic-regression", "irls", "statistics", "aggregate"),
)
def q_ml_logistic_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_body())
