"""Poisson regression by IRLS, exactly DuckDB-oracled — completing the
GLM set (logistic: ``logreg.py``, robust Gaussian: ``robustreg.py``).

Model: per-customer order COUNT ~ Poisson(exp(b0 + b1 * x)) with x the
customer's account balance scaled to [0, 1) by 256-bin discretization
(the ``logreg.py`` strata trick — at 100 TB the first exact aggregation
reduces everything to 256 rows, and each Newton step is one broadcast).

Cross-engine exactness, per the shared IRLS discipline:

- initialization at the canonical b0 = ln(mean y), b1 = 0 (one
  quantized ln) — starting at beta = 0 would make the first Newton
  step overshoot by ~e^(ybar-1);
- each iteration evaluates exp() once per bucket: mu is floor-quantized
  to 9 dp and each moment term to an integer at 1e6 scale, summed as
  BIGINT (order-independent);
- Cramer 2x2 solves on identical doubles (IEEE-exact cross-engine);
- one SQL text for both engines (``DIV`` respelled ``//``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import table

N_BINS = 256


def _body() -> str:
    return f"""
WITH raw AS (
  SELECT c.c_custkey,
         CAST(floor(c.c_acctbal * 100e0 + 0.5e0) AS BIGINT) AS bal_cents,
         CAST(COUNT(o.o_orderkey) AS BIGINT) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_acctbal
),
bounds AS (
  SELECT MIN(bal_cents) AS lo, MAX(bal_cents) AS hi FROM raw
),
buckets AS (
  SELECT ((r.bal_cents - b.lo) * {N_BINS}) DIV (b.hi - b.lo + 1) AS bk,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(r.y) AS BIGINT) AS ytot
  FROM raw r CROSS JOIN bounds b
  GROUP BY ((r.bal_cents - b.lo) * {N_BINS}) DIV (b.hi - b.lo + 1)
),
x AS (
  SELECT bk, n, ytot,
         (CAST(bk AS DOUBLE) + 0.5e0) / {float(N_BINS)!r}e0 AS xv
  FROM buckets
),
-- Initialization at the canonical Poisson start: b0 = ln(mean y),
-- b1 = 0 (one quantized ln; starting at beta = 0 makes Newton
-- overshoot by e^(ybar-1)). mu0 is then one shared quantized constant.
init AS (
  SELECT floor(ln(CAST((SELECT SUM(ytot) FROM x) AS DOUBLE)
               / CAST((SELECT SUM(n) FROM x) AS DOUBLE)) * 1e9 + 0.5e0)
         / 1e9 AS b0i
  FROM (SELECT 1) one
),
p1 AS (
  SELECT x.bk, x.n, x.ytot, x.xv,
         floor(exp(init.b0i) * 1e9 + 0.5e0) / 1e9 AS mu
  FROM x CROSS JOIN init
),
m1q AS (
  SELECT SUM(CAST(floor(n * mu * xv * xv * 1e6 + 0.5e0) AS BIGINT)) AS isxx,
         SUM(CAST(floor(n * mu * xv * 1e6 + 0.5e0) AS BIGINT)) AS isx,
         SUM(CAST(floor(n * mu * 1e6 + 0.5e0) AS BIGINT)) AS is1,
         SUM(CAST(floor((ytot - n * mu) * xv * 1e6 + 0.5e0) AS BIGINT)) AS igx,
         SUM(CAST(floor((ytot - n * mu) * 1e6 + 0.5e0) AS BIGINT)) AS ig1
  FROM p1
),
m1 AS (
  SELECT CAST(isxx AS DOUBLE) / 1e6 AS sxx,
         CAST(isx AS DOUBLE) / 1e6 AS sx,
         CAST(is1 AS DOUBLE) / 1e6 AS s1,
         CAST(igx AS DOUBLE) / 1e6 AS gx,
         CAST(ig1 AS DOUBLE) / 1e6 AS g1
  FROM m1q
),
beta1 AS (
  SELECT (gx * s1 - g1 * sx) / (sxx * s1 - sx * sx) AS b1,
         init.b0i + (sxx * g1 - sx * gx) / (sxx * s1 - sx * sx) AS b0
  FROM m1 CROSS JOIN init
),
-- Iteration 2: mu = exp(eta) floor-quantized to 9 dp per bucket; each
-- moment term floor-quantized to an integer at 1e6 and summed as BIGINT.
p2 AS (
  SELECT x.bk, x.n, x.ytot, x.xv,
         floor(exp(beta1.b0 + beta1.b1 * x.xv) * 1e9 + 0.5e0) / 1e9 AS mu
  FROM x CROSS JOIN beta1
),
m2 AS (
  SELECT SUM(CAST(floor(n * mu * xv * xv * 1e6 + 0.5e0) AS BIGINT)) AS isxx,
         SUM(CAST(floor(n * mu * xv * 1e6 + 0.5e0) AS BIGINT)) AS isx,
         SUM(CAST(floor(n * mu * 1e6 + 0.5e0) AS BIGINT)) AS is1,
         SUM(CAST(floor((ytot - n * mu) * xv * 1e6 + 0.5e0) AS BIGINT)) AS igx,
         SUM(CAST(floor((ytot - n * mu) * 1e6 + 0.5e0) AS BIGINT)) AS ig1
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
  SELECT CAST(SUM(n) AS BIGINT) AS n_customers,
         CAST(SUM(ytot) AS BIGINT) AS n_orders
  FROM x
)
SELECT FLOOR((beta2.b0) * 1e6 + 0.5) / 1e6 AS b0,
       FLOOR((beta2.b1) * 1e6 + 0.5) / 1e6 AS b1,
       FLOOR((floor(exp(beta2.b0 + beta2.b1 * 0.5e0) * 1e9 + 0.5e0) / 1e9) * 1e6 + 0.5) / 1e6
         AS rate_at_mid,
       tot.n_customers, tot.n_orders
FROM beta2 CROSS JOIN tot
"""


_ORACLE = _body().replace(" DIV ", " // ")


@register(
    "q_ml_poisson_irls",
    oracle=_ORACLE,
    description=(
        "Poisson regression (2 IRLS iterations) of order counts on "
        "binned account balance: ln(mean) start, quantized-exp Newton "
        "steps — completes the exactly-oracled GLM set"
    ),
    tags=("ml", "poisson", "glm", "irls", "statistics", "aggregate"),
)
def q_ml_poisson_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_body())
