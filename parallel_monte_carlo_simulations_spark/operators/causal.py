"""Causal-inference estimators over observational warehouse data.

**Difference-in-differences**: the workhorse quasi-experimental
estimator — compare the outcome change of a treated group to the change
of a control group over the same period, cancelling group-level and
period-level confounds (Card & Krueger 1994 canon):

    DiD = (E[y | treat, post] - E[y | treat, pre])
        - (E[y | ctrl,  post] - E[y | ctrl,  pre])

Groups and periods are derived deterministically: treatment = the
BUILDING market segment, pre/post split at the series midpoint date.
All four cell means are exact cent-integer sums divided once; the DiD
is one mirrored double expression over the four rounded means, so the
estimate is bit-identical cross-engine.

Scale: a single groupBy producing four cells — the estimator is one
shuffle regardless of fact-table size, and the per-cell partial sums
combine map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Pre/post boundary: midpoint of the order-date span.
SPLIT_DATE = "1998-01-01"
TREAT_SEGMENT = "BUILDING"

_QDID_ORACLE = f"""
WITH tagged AS (
  SELECT CASE WHEN c.c_mktsegment = '{TREAT_SEGMENT}' THEN 1 ELSE 0 END
           AS treated,
         CASE WHEN o.o_orderdate >= TIMESTAMP '{SPLIT_DATE}' THEN 1 ELSE 0 END
           AS post,
         CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cells AS (
  SELECT treated, post,
         CAST(COUNT(*) AS BIGINT) AS n,
         FLOOR((CAST(SUM(cents) AS DOUBLE) / (100.0e0 * COUNT(*))) * 1e4 + 0.5) / 1e4
           AS mean_price
  FROM tagged
  GROUP BY treated, post
),
wide AS (
  SELECT
    MAX(CASE WHEN treated = 1 AND post = 1 THEN mean_price END) AS t_post,
    MAX(CASE WHEN treated = 1 AND post = 0 THEN mean_price END) AS t_pre,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN mean_price END) AS c_post,
    MAX(CASE WHEN treated = 0 AND post = 0 THEN mean_price END) AS c_pre,
    CAST(SUM(n) AS BIGINT) AS n_total
  FROM cells
)
SELECT t_pre, t_post, c_pre, c_post, n_total,
       FLOOR(((t_post - t_pre) - (c_post - c_pre)) * 1e4 + 0.5) / 1e4 AS did_estimate
FROM wide
"""


@register(
    "q_causal_diff_in_diff",
    oracle=_QDID_ORACLE,
    description=(
        "difference-in-differences estimator: treated segment vs "
        "control, pre/post the series midpoint — four exact cell means, "
        "one mirrored DiD expression"
    ),
    tags=("causal", "statistics", "ab-testing", "aggregate", "analytics"),
)
def q_causal_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    tagged = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.when(F.col("c_mktsegment") == TREAT_SEGMENT, F.lit(1))
        .otherwise(F.lit(0))
        .alias("treated"),
        F.when(
            F.col("o_orderdate") >= F.lit(SPLIT_DATE).cast("timestamp"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("post"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    cells = tagged.groupBy("treated", "post").agg(
        F.count("*").alias("n"),
        (F.floor((F.sum("cents").cast("double") / (F.lit(100.0) * F.count("*"))) * 1e4 + 0.5) / 1e4).alias("mean_price"),
    )
    wide = cells.agg(
        F.max(
            F.when((F.col("treated") == 1) & (F.col("post") == 1), F.col("mean_price"))
        ).alias("t_post"),
        F.max(
            F.when((F.col("treated") == 1) & (F.col("post") == 0), F.col("mean_price"))
        ).alias("t_pre"),
        F.max(
            F.when((F.col("treated") == 0) & (F.col("post") == 1), F.col("mean_price"))
        ).alias("c_post"),
        F.max(
            F.when((F.col("treated") == 0) & (F.col("post") == 0), F.col("mean_price"))
        ).alias("c_pre"),
        F.sum("n").alias("n_total"),
    )
    return wide.select(
        "t_pre",
        "t_post",
        "c_pre",
        "c_post",
        "n_total",
        (F.floor(((F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre"))) * 1e4 + 0.5) / 1e4).alias("did_estimate"),
    )


# --------------------------------------------------------------------------
# CUPED variance reduction (Deng et al. WSDM 2013): adjust the
# experiment metric with pre-period covariates.
# --------------------------------------------------------------------------

_QCUPED_ORACLE = f"""
WITH per_cust AS (
  -- thousand-cent (10-dollar) units keep every squared-moment BIGINT
  -- sum inside 2^63 at any SF
  SELECT o_custkey AS cust,
         CAST(SUM(CASE WHEN o_orderdate <  TIMESTAMP '{SPLIT_DATE}'
                       THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) // 1000 AS pre_m,
         CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '{SPLIT_DATE}'
                       THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) // 1000 AS post_m
  FROM orders
  GROUP BY o_custkey
),
-- exact integer moments of (pre, post) over all customers
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pre_m) AS BIGINT) AS sx,
         CAST(SUM(post_m) AS BIGINT) AS sy,
         CAST(SUM(pre_m * pre_m) AS BIGINT) AS sxx,
         CAST(SUM(pre_m * post_m) AS BIGINT) AS sxy,
         CAST(SUM(post_m * post_m) AS BIGINT) AS syy
  FROM per_cust
),
-- theta = cov(pre, post) / var(pre): one mirrored double expression
-- over exact integers (scale-invariant in cents).
theta AS (
  SELECT n, sx, sy,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS th
  FROM mom
),
-- adjusted metric per customer, quantized before cross-row variance
adj AS (
  SELECT p.cust,
         CAST(floor((CAST(p.post_m AS DOUBLE)
                     - t.th * (CAST(p.pre_m AS DOUBLE)
                               - CAST(t.sx AS DOUBLE) / CAST(t.n AS DOUBLE)))
                    * 10e0 + 0.5e0) AS BIGINT) AS y_adj_e1,
         p.post_m * 10 AS y_raw_e1
  FROM per_cust p CROSS JOIN theta t
),
var_cmp AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y_raw_e1) AS BIGINT) AS sr,
         CAST(SUM(y_raw_e1 * y_raw_e1) AS BIGINT) AS srr,
         CAST(SUM(y_adj_e1) AS BIGINT) AS sa,
         CAST(SUM(y_adj_e1 * y_adj_e1) AS BIGINT) AS saa
  FROM adj
)
SELECT n,
       FLOOR(((CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)
              - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e2)) * 1e2 + 0.5) / 1e2
         AS var_raw,
       FLOOR(((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
              - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e2)) * 1e2 + 0.5) / 1e2
         AS var_cuped,
       FLOOR((1e0 - ((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                     - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)
                       - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)))) * 1e6 + 0.5) / 1e6
         AS variance_reduction
FROM var_cmp
"""


@register(
    "q_causal_cuped",
    oracle=_QCUPED_ORACLE,
    description=(
        "CUPED variance reduction: theta = cov(pre,post)/var(pre) from "
        "exact integer moments, quantized adjusted metric, measured "
        "variance reduction vs the raw metric"
    ),
    tags=("causal", "ab-testing", "cuped", "statistics", "aggregate"),
)
def q_causal_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Deng et al. 2013): subtracting theta * (pre - mean(pre))
    from the experiment metric removes the pre-period-explained variance
    — the standard trick that shrinks A/B confidence intervals without
    touching the estimand. theta and both variances come from exact
    integer moment sums (one groupBy + one global agg); the adjusted
    per-customer metric is floor-quantized at one decimal before the cross-row
    variance so summation order is irrelevant. (On this synthetic data
    pre/post spends are nearly independent, so the measured
    reduction is honestly tiny — the estimator, not the dataset, is
    what's under test.)"""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    per_cust = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.expr(
            f"CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{SPLIT_DATE}' "
            "THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) ELSE 0 END) "
            "AS BIGINT) DIV 1000"
        ).alias("pre_m"),
        F.expr(
            f"CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '{SPLIT_DATE}' "
            "THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) ELSE 0 END) "
            "AS BIGINT) DIV 1000"
        ).alias("post_m"),
    )
    mom = per_cust.agg(
        F.count("*").alias("n"),
        F.sum("pre_m").alias("sx"),
        F.sum("post_m").alias("sy"),
        F.sum(F.col("pre_m") * F.col("pre_m")).alias("sxx"),
        F.sum(F.col("pre_m") * F.col("post_m")).alias("sxy"),
        F.sum(F.col("post_m") * F.col("post_m")).alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    theta = mom.select(
        "n",
        "sx",
        "sy",
        (
            (d("n") * d("sxy") - d("sx") * d("sy"))
            / (d("n") * d("sxx") - d("sx") * d("sx"))
        ).alias("th"),
    )
    adj = per_cust.crossJoin(F.broadcast(theta)).select(
        F.floor(
            (
                d("post_m")
                - F.col("th") * (d("pre_m") - d("sx") / d("n"))
            )
            * F.lit(10.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("y_adj_e1"),
        (F.col("post_m") * 10).alias("y_raw_e1"),
    )
    var_cmp = adj.agg(
        F.count("*").alias("n"),
        F.sum("y_raw_e1").alias("sr"),
        F.sum(F.col("y_raw_e1") * F.col("y_raw_e1")).alias("srr"),
        F.sum("y_adj_e1").alias("sa"),
        F.sum(F.col("y_adj_e1") * F.col("y_adj_e1")).alias("saa"),
    )
    return var_cmp.select(
        "n",
        (F.floor(((d("n") * d("srr") - d("sr") * d("sr"))
            / (d("n") * d("n") * F.lit(1e2))) * 1e2 + 0.5) / 1e2).alias("var_raw"),
        (F.floor(((d("n") * d("saa") - d("sa") * d("sa"))
            / (d("n") * d("n") * F.lit(1e2))) * 1e2 + 0.5) / 1e2).alias("var_cuped"),
        (F.floor((F.lit(1.0)
            - (
                (d("n") * d("saa") - d("sa") * d("sa"))
                / (d("n") * d("srr") - d("sr") * d("sr"))
            )) * 1e6 + 0.5) / 1e6).alias("variance_reduction"),
    )


# --------------------------------------------------------------------------
# Propensity-score stratification (subclassification): Cochran 1968,
# Rosenbaum & Rubin 1984 — the third leg of the causal family.
# --------------------------------------------------------------------------

_QPSTRATA_ORACLE = f"""
WITH cells AS (
  SELECT c.c_nationkey AS stratum,
         CAST(COUNT(*) FILTER (WHERE c.c_mktsegment = '{TREAT_SEGMENT}')
              AS BIGINT) AS nt,
         CAST(COUNT(*) FILTER (WHERE c.c_mktsegment <> '{TREAT_SEGMENT}')
              AS BIGINT) AS nc,
         CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
              FILTER (WHERE c.c_mktsegment = '{TREAT_SEGMENT}'), 0)
              AS BIGINT) AS st,
         CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
              FILTER (WHERE c.c_mktsegment <> '{TREAT_SEGMENT}'), 0)
              AS BIGINT) AS sc
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey
),
used AS (SELECT * FROM cells WHERE nt > 0 AND nc > 0),
tot AS (SELECT CAST(SUM(nt + nc) AS BIGINT) AS n_used FROM used),
terms AS (
  SELECT u.nt, u.nc,
         FLOOR((CAST(u.nt AS DOUBLE) / (u.nt + u.nc)) * 1e4 + 0.5) / 1e4 AS p_hat,
         CAST(FLOOR((CAST(u.nt + u.nc AS DOUBLE) / t.n_used
           * (FLOOR((CAST(u.st AS DOUBLE) / (100.0e0 * u.nt)) * 1e4 + 0.5) / 1e4
              - FLOOR((CAST(u.sc AS DOUBLE) / (100.0e0 * u.nc)) * 1e4 + 0.5) / 1e4)) * 1e8 + 0.5) / 1e8 AS DECIMAL(30,8)) AS term
  FROM used u CROSS JOIN tot t
),
naive AS (
  SELECT CAST(SUM(nt + nc) AS BIGINT) AS n_total,
         CAST(COUNT(*) AS BIGINT) AS n_strata,
         FLOOR((CAST(SUM(st) AS DOUBLE) / (100.0e0 * SUM(nt))
               - CAST(SUM(sc) AS DOUBLE) / (100.0e0 * SUM(nc))) * 1e4 + 0.5) / 1e4
           AS naive_diff
  FROM cells
)
SELECT n.n_total, n.n_strata,
       CAST(COUNT(*) AS BIGINT) AS n_strata_used,
       FLOOR((MIN(t.p_hat)) * 1e4 + 0.5) / 1e4 AS min_propensity,
       FLOOR((MAX(t.p_hat)) * 1e4 + 0.5) / 1e4 AS max_propensity,
       n.naive_diff,
       FLOOR((CAST(SUM(t.term) AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS stratified_ate
FROM terms t CROSS JOIN naive n
GROUP BY n.n_total, n.n_strata, n.naive_diff
"""


@register(
    "q_causal_propensity_strata",
    oracle=_QPSTRATA_ORACLE,
    description=(
        "propensity-score stratification (subclassification) ATE: "
        "nation strata, within-stratum propensity and treated-control "
        "mean gap, stratum-share-weighted estimate vs the naive "
        "difference — exact cent cells, decimal-quantized term sum"
    ),
    tags=("causal", "propensity", "statistics", "ab-testing", "aggregate"),
)
def q_causal_propensity_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subclassification (Cochran 1968; Rosenbaum & Rubin 1984): stratify
    units on a confounder, estimate the treatment-control outcome gap
    within each stratum, and weight the per-stratum gaps by stratum
    share. Within a stratum the empirical propensity nt/(nt+nc) is
    constant, so this IS propensity stratification with exact strata.
    Every cell is an exact cent sum; per-stratum terms quantize to
    DECIMAL(30,8) before the cross-stratum sum so addition order is
    irrelevant. One groupBy to 25 stratum cells, then scalar frames —
    one shuffle regardless of fact-table size. (TPC-H segments are
    assigned independently of nation, so the stratified and naive
    estimates honestly agree — the estimator, not the dataset, is what's
    under test; cf. q_causal_cuped's note.)"""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    treated = F.col("c_mktsegment") == TREAT_SEGMENT
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    cells = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("stratum"))
        .agg(
            F.count(F.when(treated, 1)).cast("long").alias("nt"),
            F.count(F.when(~treated, 1)).cast("long").alias("nc"),
            F.coalesce(F.sum(F.when(treated, cents)), F.lit(0))
            .cast("long")
            .alias("st"),
            F.coalesce(F.sum(F.when(~treated, cents)), F.lit(0))
            .cast("long")
            .alias("sc"),
        )
    )
    used = cells.filter((F.col("nt") > 0) & (F.col("nc") > 0))
    tot = used.agg(F.sum(F.col("nt") + F.col("nc")).cast("long").alias("n_used"))
    d = lambda c_: F.col(c_).cast("double")  # noqa: E731
    terms = used.crossJoin(F.broadcast(tot)).select(
        (F.floor((d("nt") / (F.col("nt") + F.col("nc"))) * 1e4 + 0.5) / 1e4).alias("p_hat"),
        (F.floor(((F.col("nt") + F.col("nc")).cast("double")
            / F.col("n_used")
            * (
                (F.floor((d("st") / (F.lit(100.0) * F.col("nt"))) * 1e4 + 0.5) / 1e4)
                - (F.floor((d("sc") / (F.lit(100.0) * F.col("nc"))) * 1e4 + 0.5) / 1e4)
            )) * 1e8 + 0.5) / 1e8)
        .cast("decimal(30,8)")
        .alias("term"),
    )
    naive = cells.agg(
        F.sum(F.col("nt") + F.col("nc")).cast("long").alias("n_total"),
        F.count("*").cast("long").alias("n_strata"),
        (F.floor((F.sum("st").cast("double") / (F.lit(100.0) * F.sum("nt"))
            - F.sum("sc").cast("double") / (F.lit(100.0) * F.sum("nc"))) * 1e4 + 0.5) / 1e4).alias("naive_diff"),
    )
    agg = terms.agg(
        F.count("*").cast("long").alias("n_strata_used"),
        (F.floor((F.min("p_hat")) * 1e4 + 0.5) / 1e4).alias("min_propensity"),
        (F.floor((F.max("p_hat")) * 1e4 + 0.5) / 1e4).alias("max_propensity"),
        (F.floor((F.sum("term").cast("double")) * 1e4 + 0.5) / 1e4).alias("stratified_ate"),
    )
    return naive.crossJoin(F.broadcast(agg)).select(
        "n_total",
        "n_strata",
        "n_strata_used",
        "min_propensity",
        "max_propensity",
        "naive_diff",
        "stratified_ate",
    )
