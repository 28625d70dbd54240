"""Gradient-boosted regression stumps, exactly DuckDB-oracled.

Two rounds of gradient boosting (Friedman 2001) with depth-1 trees over
the discrete quantity feature, predicting line-item price:

  f0      = floor(mean(y))                 (integer base score)
  round r: fit a stump to the residuals — the split threshold t*
           maximizes the SSE reduction  S_L^2/n_L + S_R^2/n_R  over all
           49 candidate thresholds; leaf values are the residual means,
           shrunk by the 1/2 learning rate; f_{r} = f_{r-1} + leaf(x).

Exactness: y is scaled to an integer grid (1e4 per dollar), so ALL
residuals, per-threshold prefix sums (n_L, S_L), and MAE totals are
exact integers; the split score is a fixed double expression over those
integers (identical cross-engine), and every division that could see a
negative numerator goes through ``floor(CAST(a AS DOUBLE) / b)`` —
floor semantics agree between engines where truncating integer division
would not. The argmax tie-breaks on the threshold, so the learned trees
are bit-identical.

Scale: each round is one groupBy on the (50-value) feature + a window
over the 50-row aggregate + a broadcast of the 1-row split back onto
the fact table. The fact table is scanned once per round; everything
else is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import table

#: y scale: integer units of 1e-4 dollars.
YSCALE = 10_000
#: learning-rate denominator (lr = 1/2).
LR_DEN = 2


def _floordiv(a: str, b: str) -> str:
    return f"CAST(floor(CAST({a} AS DOUBLE) / CAST({b} AS DOUBLE)) AS BIGINT)"


def _stump(r: int, resid: str) -> str:
    """CTEs fitting stump ``r`` on residual column ``resid`` of pts{r-1}
    and producing pts{r} with updated predictions."""
    prev = f"pts{r - 1}"
    score_l = f"CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)"
    score_r = (
        "CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)"
        " / CAST(nt - nl AS DOUBLE)"
    )
    return f"""
agg{r} AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM({resid}) AS BIGINT) AS s
  FROM {prev} GROUP BY x
),
pre{r} AS (
  SELECT x,
         SUM(n) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
         SUM(s) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sl,
         SUM(n) OVER () AS nt,
         SUM(s) OVER () AS st
  FROM agg{r}
),
cand{r} AS (
  SELECT x AS t, CAST(nl AS BIGINT) AS nl, CAST(sl AS BIGINT) AS sl,
         CAST(nt AS BIGINT) AS nt, CAST(st AS BIGINT) AS st,
         ({score_l}) + ({score_r}) AS score
  FROM pre{r} WHERE nl < nt
),
best{r} AS (
  SELECT t, nl, sl, nt, st,
         {_floordiv(f"{_floordiv('sl', 'nl')}", str(LR_DEN))} AS leaf_l,
         {_floordiv(f"{_floordiv('(st - sl)', '(nt - nl)')}", str(LR_DEN))}
           AS leaf_r
  FROM cand{r}
  ORDER BY score DESC, t LIMIT 1
),
pts{r} AS (
  SELECT p.x,
         p.yq,
         p.f + CASE WHEN p.x <= b.t THEN b.leaf_l ELSE b.leaf_r END AS f,
         p.yq - (p.f + CASE WHEN p.x <= b.t THEN b.leaf_l ELSE b.leaf_r END)
           AS r{r + 1}
  FROM {prev} p CROSS JOIN best{r} b
)"""


def _body() -> str:
    rounds = "".join("," + _stump(r, f"r{r}") for r in (1, 2))
    summaries = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, b.t AS split_t, b.nl AS n_left, "
        f"FLOOR((CAST(b.leaf_l AS DOUBLE) / {YSCALE}e0) * 1e4 + 0.5) / 1e4 AS leaf_left, "
        f"FLOOR((CAST(b.leaf_r AS DOUBLE) / {YSCALE}e0) * 1e4 + 0.5) / 1e4 AS leaf_right, "
        f"(SELECT FLOOR((CAST(SUM(ABS(r{r + 1})) AS DOUBLE) "
        f"  / (COUNT(*) * {YSCALE}e0)) * 1e4 + 0.5) / 1e4 FROM pts{r}) AS mae_after "
        f"FROM best{r} b"
        for r in (1, 2)
    )
    return f"""
WITH base AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) * {YSCALE // 100}
           AS yq
  FROM lineitem
),
f0c AS (
  SELECT {_floordiv("SUM(yq)", "COUNT(*)")} AS f0 FROM base
),
pts0 AS (
  SELECT b.x, b.yq, f0c.f0 AS f, b.yq - f0c.f0 AS r1
  FROM base b CROSS JOIN f0c
){rounds}
{summaries}
ORDER BY round
"""


_ORACLE = _body()


@register(
    "q_ml_gradient_boosted_stumps",
    oracle=_ORACLE,
    description=(
        "gradient boosting (2 rounds of depth-1 stumps, lr=1/2) of "
        "price on quantity: integer-exact residuals/prefix sums, "
        "deterministic SSE-reduction argmax, per-round MAE"
    ),
    tags=("ml", "boosting", "tree", "iterative", "window", "aggregate"),
)
def q_ml_gradient_boosted_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_body())
