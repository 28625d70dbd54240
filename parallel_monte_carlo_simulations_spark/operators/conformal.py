"""Split-conformal prediction intervals — distribution-free uncertainty
for any point predictor, as three exact aggregations.

The split-conformal recipe (Vovk et al.; Lei et al. JASA 2018):

1. Split the data by a deterministic hash parity: train / calibration.
2. Fit any predictor on train — here the per-segment mean price (the
   simplest useful regressor, exact in cent-integers).
3. Score calibration residuals |y - yhat|; the (ceil((n+1)(1-alpha)))-th
   smallest residual is the conformal quantile q_hat — a pure integer
   rank, no interpolation.
4. Intervals yhat +/- q_hat then cover new points with probability
   >= 1-alpha, whatever the true distribution.

Everything is exact: the split is the portable md5 hash, the predictor
is a ratio of exact integer sums (rounded once, mirrored), residual
ranking is an integer sort. Scale: one groupBy for the fit (broadcast
back), one window-free ordered rank for the quantile (a top-k over the
calibration slice), no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60, sql_hash60
from ..registry import register
from ..tables import table

#: Miscoverage level: 90% intervals.
ALPHA_NUM, ALPHA_DEN = 1, 10

_HASH_EXPR = sql_hash60("'split:' || CAST(o_orderkey AS VARCHAR)")

_QCONF_ORACLE = f"""
WITH tagged AS (
  SELECT o.o_orderkey,
         c.c_mktsegment AS segment,
         CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
         {_HASH_EXPR} % 2 AS fold
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
fit AS (
  SELECT segment,
         CAST(SUM(cents) AS BIGINT) AS sum_cents,
         CAST(COUNT(*) AS BIGINT) AS n_train
  FROM tagged WHERE fold = 0 GROUP BY segment
),
pred AS (
  SELECT segment, sum_cents, n_train,
         FLOOR((CAST(sum_cents AS DOUBLE) / (100.0e0 * n_train)) * 1e4 + 0.5) / 1e4 AS yhat
  FROM fit
),
resid AS (
  SELECT t.segment,
         ABS(CAST(t.cents AS DOUBLE) / 100.0e0 - p.yhat) AS r
  FROM tagged t JOIN pred p ON t.segment = p.segment
  WHERE t.fold = 1
),
ncal AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM resid),
qhat AS (
  SELECT r AS q
  FROM (
    SELECT r, ROW_NUMBER() OVER (ORDER BY r, segment) AS rk
    FROM resid
  ) ranked CROSS JOIN ncal
  WHERE rk = CAST(ceil((ncal.n + 1) * ({ALPHA_DEN} - {ALPHA_NUM})
                       / CAST({ALPHA_DEN} AS DOUBLE)) AS BIGINT)
)
SELECT p.segment,
       p.n_train,
       p.yhat,
       FLOOR((p.yhat - q.q) * 1e4 + 0.5) / 1e4 AS lo,
       FLOOR((p.yhat + q.q) * 1e4 + 0.5) / 1e4 AS hi,
       FLOOR((q.q) * 1e4 + 0.5) / 1e4 AS q_hat
FROM pred p CROSS JOIN qhat q
ORDER BY p.segment
"""


@register(
    "q_ml_conformal_interval",
    oracle=_QCONF_ORACLE,
    description=(
        "split-conformal 90% prediction intervals: hash-split "
        "train/calibration, per-segment mean predictor, integer-ranked "
        "residual quantile — distribution-free coverage"
    ),
    tags=("ml", "conformal", "uncertainty", "statistics", "aggregate"),
)
def q_ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    tagged = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        (
            hash60(F.concat(F.lit("split:"), F.col("o_orderkey").cast("string")))
            % 2
        ).alias("fold"),
    )
    fit = (
        tagged.where(F.col("fold") == 0)
        .groupBy("segment")
        .agg(
            F.sum("cents").alias("sum_cents"),
            F.count("*").alias("n_train"),
        )
    )
    pred = fit.select(
        "segment",
        "n_train",
        (F.floor((F.col("sum_cents").cast("double")
            / (F.lit(100.0) * F.col("n_train"))) * 1e4 + 0.5) / 1e4).alias("yhat"),
    )
    resid = (
        tagged.where(F.col("fold") == 1)
        .join(F.broadcast(pred), "segment")
        .select(
            "segment",
            F.abs(
                F.col("cents").cast("double") / 100.0 - F.col("yhat")
            ).alias("r"),
        )
    )
    ncal = resid.agg(F.count("*").alias("n"))
    # calibration-residual rank via the range-bucketed kernel
    # (round 11): the quantile pick needs ranks, not a global sort.
    from .rankstats import bucketed_running

    ranked = bucketed_running(
        resid,
        axis="r",
        order=[F.col("r").asc(), F.col("segment").asc()],
        cums={"rk": F.lit(1)},
    )
    target_rk = F.ceil(
        (F.col("n") + 1)
        * (ALPHA_DEN - ALPHA_NUM)
        / F.lit(ALPHA_DEN).cast("double")
    ).cast("long")
    qhat = (
        ranked.crossJoin(F.broadcast(ncal))
        .where(F.col("rk") == target_rk)
        .select(F.col("r").alias("q"))
    )
    return (
        pred.crossJoin(F.broadcast(qhat))
        .select(
            "segment",
            "n_train",
            "yhat",
            (F.floor((F.col("yhat") - F.col("q")) * 1e4 + 0.5) / 1e4).alias("lo"),
            (F.floor((F.col("yhat") + F.col("q")) * 1e4 + 0.5) / 1e4).alias("hi"),
            (F.floor((F.col("q")) * 1e4 + 0.5) / 1e4).alias("q_hat"),
        )
        .orderBy("segment")
    )
