"""Hypothesis-test surface, second batch (round 10): one-way ANOVA,
Welch's t, Brown-Forsythe, Cramér's V, and mutual information.

House float discipline throughout: every statistic derives from EXACT
integer sufficient statistics (l_quantity is integer-valued 1..50, so
Σx and Σx² are exact in doubles far past sf1.0), and wherever a sum
crosses grouped rows the per-group terms are quantized to DECIMAL
before summing, so the cross-engine result is order-independent — the
same pattern as :mod:`.stattests`'s chi-square. Each test is ONE
grouped aggregation over the scan: partial aggregation map-side, a
k-row (k <= 6) reduce, scalar math on the driver plan — the shape that
holds at 100 TB because the shuffle carries group sums, never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.microunit import rdiv_halfup_duck, rdiv_halfup_expr
from ..registry import register
from ..tables import table

# --------------------------------------------------------------------------
# One-way ANOVA F: does mean l_quantity differ across l_returnflag groups?
# --------------------------------------------------------------------------

_QANOVA_ORACLE = """
WITH g AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT)                 AS n,
         CAST(SUM(l_quantity) AS DOUBLE)          AS s,
         CAST(SUM(l_quantity * l_quantity) AS DOUBLE) AS ss
  FROM lineitem GROUP BY l_returnflag
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_tot, SUM(s) AS s_tot,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM g
),
terms AS (
  SELECT CAST(FLOOR((g.s * g.s / g.n) * 1e8 + 0.5) / 1e8 AS DECIMAL(28,8))        AS between_q,
         CAST(FLOOR((g.ss - g.s * g.s / g.n) * 1e8 + 0.5) / 1e8 AS DECIMAL(28,8)) AS within_q
  FROM g
),
sums AS (
  SELECT CAST(SUM(between_q) AS DOUBLE) AS bsum,
         CAST(SUM(within_q) AS DOUBLE)  AS ssw
  FROM terms
)
SELECT t.k, t.n_tot,
       FLOOR((s2.bsum - t.s_tot * t.s_tot / t.n_tot) * 1e4 + 0.5) / 1e4 AS ss_between,
       FLOOR((s2.ssw) * 1e4 + 0.5) / 1e4                                AS ss_within,
       FLOOR((((s2.bsum - t.s_tot * t.s_tot / t.n_tot) / (t.k - 1))
             / (s2.ssw / (t.n_tot - t.k))) * 1e6 + 0.5) / 1e6          AS f_stat
FROM tot t CROSS JOIN sums s2
"""


@register(
    "q_stat_anova_f",
    oracle=_QANOVA_ORACLE,
    description=(
        "one-way ANOVA F-test of mean l_quantity across the 3 "
        "l_returnflag groups from exact integer sufficient statistics "
        "(n, sum, sum-of-squares per group); per-group terms quantized "
        "to DECIMAL before the cross-group sum"
    ),
    tags=("statistics", "anova", "hypothesis-test", "aggregate"),
)
def q_stat_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("l_quantity").cast("double").alias("s"),
        F.sum(F.col("l_quantity") * F.col("l_quantity"))
        .cast("double")
        .alias("ss"),
    )
    terms = g.select(
        "n",
        "s",
        (F.floor((F.col("s") * F.col("s") / F.col("n")) * 1e8 + 0.5) / 1e8)
        .cast("decimal(28,8)")
        .alias("between_q"),
        (F.floor((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) * 1e8 + 0.5) / 1e8)
        .cast("decimal(28,8)")
        .alias("within_q"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_tot"),
        F.sum("s").alias("s_tot"),
        F.sum("between_q").cast("double").alias("bsum"),
        F.sum("within_q").cast("double").alias("ssw"),
    )
    ssb = F.col("bsum") - F.col("s_tot") * F.col("s_tot") / F.col("n_tot")
    return agg.select(
        "k",
        "n_tot",
        (F.floor((ssb) * 1e4 + 0.5) / 1e4).alias("ss_between"),
        (F.floor((F.col("ssw")) * 1e4 + 0.5) / 1e4).alias("ss_within"),
        (F.floor(((ssb / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("n_tot") - F.col("k")))) * 1e6 + 0.5) / 1e6).alias("f_stat"),
    )


# --------------------------------------------------------------------------
# Welch's t-test: unequal-variance two-sample t across l_linestatus.
# --------------------------------------------------------------------------

_QWELCH_ORACLE = """
WITH piv AS (
  SELECT
    CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT)  AS n1,
    CAST(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS s1,
    CAST(SUM(l_quantity * l_quantity)
         FILTER (WHERE l_linestatus = 'O') AS DOUBLE)           AS ss1,
    CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT)  AS n2,
    CAST(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS s2,
    CAST(SUM(l_quantity * l_quantity)
         FILTER (WHERE l_linestatus = 'F') AS DOUBLE)           AS ss2
  FROM lineitem
),
v AS (
  SELECT n1, n2,
         s1 / n1 AS m1, s2 / n2 AS m2,
         (ss1 - s1 * s1 / n1) / (n1 - 1) AS v1,
         (ss2 - s2 * s2 / n2) / (n2 - 1) AS v2
  FROM piv
)
SELECT n1, n2,
       FLOOR((m1) * 1e6 + 0.5) / 1e6 AS mean_o,
       FLOOR((m2) * 1e6 + 0.5) / 1e6 AS mean_f,
       FLOOR(((m1 - m2) / SQRT(v1 / n1 + v2 / n2)) * 1e6 + 0.5) / 1e6 AS t_stat,
       FLOOR(((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
         / ((v1 / n1) * (v1 / n1) / (n1 - 1)
            + (v2 / n2) * (v2 / n2) / (n2 - 1))) * 1e4 + 0.5) / 1e4 AS welch_df
FROM v
"""


@register(
    "q_stat_welch_ttest",
    oracle=_QWELCH_ORACLE,
    description=(
        "Welch's unequal-variance two-sample t-test of l_quantity across "
        "l_linestatus O vs F, with the Welch-Satterthwaite df — the "
        "sufficient statistics pivot into ONE row via FILTER aggregates, "
        "so every downstream float op is fixed-order deterministic"
    ),
    tags=("statistics", "t-test", "hypothesis-test", "aggregate"),
)
def q_stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    q2 = F.col("l_quantity") * F.col("l_quantity")

    def _f(expr, status):
        # conditional aggregate == SQL's FILTER clause (sum skips nulls)
        return F.sum(F.when(F.col("l_linestatus") == status, expr))

    piv = li.agg(
        _f(F.lit(1), "O").cast("long").alias("n1"),
        _f(F.col("l_quantity"), "O").cast("double").alias("s1"),
        _f(q2, "O").cast("double").alias("ss1"),
        _f(F.lit(1), "F").cast("long").alias("n2"),
        _f(F.col("l_quantity"), "F").cast("double").alias("s2"),
        _f(q2, "F").cast("double").alias("ss2"),
    )
    m1, m2 = F.col("s1") / F.col("n1"), F.col("s2") / F.col("n2")
    v1 = (F.col("ss1") - F.col("s1") * F.col("s1") / F.col("n1")) / (
        F.col("n1") - 1
    )
    v2 = (F.col("ss2") - F.col("s2") * F.col("s2") / F.col("n2")) / (
        F.col("n2") - 1
    )
    se1, se2 = v1 / F.col("n1"), v2 / F.col("n2")
    return piv.select(
        "n1",
        "n2",
        (F.floor((m1) * 1e6 + 0.5) / 1e6).alias("mean_o"),
        (F.floor((m2) * 1e6 + 0.5) / 1e6).alias("mean_f"),
        (F.floor(((m1 - m2) / F.sqrt(se1 + se2)) * 1e6 + 0.5) / 1e6).alias("t_stat"),
        (F.floor(((se1 + se2) * (se1 + se2)
            / (se1 * se1 / (F.col("n1") - 1) + se2 * se2 / (F.col("n2") - 1))) * 1e4 + 0.5) / 1e4).alias("welch_df"),
    )


# --------------------------------------------------------------------------
# Brown-Forsythe: variance homogeneity via ANOVA on |x - group median|.
# --------------------------------------------------------------------------

_QBF_ORACLE = """
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS md
  FROM lineitem GROUP BY l_returnflag
),
z AS (
  SELECT li.l_returnflag, ABS(li.l_quantity - m.md) AS z
  FROM lineitem li JOIN med m USING (l_returnflag)
),
g AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(z) AS DOUBLE)   AS s,
         CAST(SUM(z * z) AS DOUBLE) AS ss
  FROM z GROUP BY l_returnflag
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_tot, SUM(s) AS s_tot,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM g
),
terms AS (
  SELECT CAST(FLOOR((g.s * g.s / g.n) * 1e8 + 0.5) / 1e8 AS DECIMAL(28,8))        AS between_q,
         CAST(FLOOR((g.ss - g.s * g.s / g.n) * 1e8 + 0.5) / 1e8 AS DECIMAL(28,8)) AS within_q
  FROM g
),
sums AS (
  SELECT CAST(SUM(between_q) AS DOUBLE) AS bsum,
         CAST(SUM(within_q) AS DOUBLE)  AS ssw
  FROM terms
)
SELECT t.k, t.n_tot,
       FLOOR((((s2.bsum - t.s_tot * t.s_tot / t.n_tot) / (t.k - 1))
             / (s2.ssw / (t.n_tot - t.k))) * 1e6 + 0.5) / 1e6 AS bf_stat
FROM tot t CROSS JOIN sums s2
"""


@register(
    "q_stat_brown_forsythe",
    oracle=_QBF_ORACLE,
    description=(
        "Brown-Forsythe variance-homogeneity test: one-way ANOVA F on "
        "|l_quantity - group median| across l_returnflag — the "
        "median-based robust Levene variant; medians interpolate on "
        "integer data so every deviation is an exact multiple of 0.5"
    ),
    tags=("statistics", "levene", "hypothesis-test", "aggregate"),
)
def q_stat_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("md")
    )
    # med is a 3-row frame — broadcast is bounded by the group-key
    # cardinality, not the corpus.
    z = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag", F.abs(F.col("l_quantity") - F.col("md")).alias("z")
    )
    g = z.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z").cast("double").alias("s"),
        F.sum(F.col("z") * F.col("z")).cast("double").alias("ss"),
    )
    terms = g.select(
        "n",
        "s",
        (F.floor((F.col("s") * F.col("s") / F.col("n")) * 1e8 + 0.5) / 1e8)
        .cast("decimal(28,8)")
        .alias("between_q"),
        (F.floor((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) * 1e8 + 0.5) / 1e8)
        .cast("decimal(28,8)")
        .alias("within_q"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_tot"),
        F.sum("s").alias("s_tot"),
        F.sum("between_q").cast("double").alias("bsum"),
        F.sum("within_q").cast("double").alias("ssw"),
    )
    ssb = F.col("bsum") - F.col("s_tot") * F.col("s_tot") / F.col("n_tot")
    return agg.select(
        "k",
        "n_tot",
        (F.floor(((ssb / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("n_tot") - F.col("k")))) * 1e6 + 0.5) / 1e6).alias("bf_stat"),
    )


# --------------------------------------------------------------------------
# Cramér's V: chi-square effect size for l_returnflag x l_linestatus.
# --------------------------------------------------------------------------

_QCRAMER_ORACLE = """
WITH cells AS (
  SELECT l_returnflag AS rv, l_linestatus AS cv,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM lineitem GROUP BY l_returnflag, l_linestatus
),
rs AS (SELECT rv, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY rv),
cs AS (SELECT cv, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY cv),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
terms AS (
  SELECT CAST(FLOOR((((CAST(cells.o AS DOUBLE) * t.n) - (CAST(rs.r AS DOUBLE) * cs.c))
           * ((CAST(cells.o AS DOUBLE) * t.n) - (CAST(rs.r AS DOUBLE) * cs.c))
           / (CAST(t.n AS DOUBLE) * CAST(rs.r AS DOUBLE) * cs.c)) * 1e8 + 0.5) / 1e8 AS DECIMAL(24,8)) AS tq
  FROM cells
  JOIN rs USING (rv) JOIN cs USING (cv) CROSS JOIN tot t
),
dims AS (
  SELECT CAST(COUNT(DISTINCT rv) AS BIGINT) AS nr,
         CAST(COUNT(DISTINCT cv) AS BIGINT) AS nc
  FROM cells
)
SELECT t2.n AS n_rows,
       d.nr, d.nc,
       FLOOR((CAST((SELECT SUM(tq) FROM terms) AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS chi2,
       FLOOR((SQRT(CAST((SELECT SUM(tq) FROM terms) AS DOUBLE)
                  / (t2.n * LEAST(d.nr - 1, d.nc - 1)))) * 1e6 + 0.5) / 1e6 AS cramers_v
FROM tot t2 CROSS JOIN dims d
"""


@register(
    "q_stat_cramers_v",
    oracle=_QCRAMER_ORACLE,
    description=(
        "Cramér's V association strength for l_returnflag x l_linestatus "
        "— chi-square from one contingency aggregation (exact-decimal "
        "summands) normalized to [0,1] by n*min(r-1, c-1)"
    ),
    tags=("statistics", "chi-square", "effect-size", "aggregate"),
)
def q_stat_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("rv"), F.col("l_linestatus").alias("cv")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    rs = cells.groupBy("rv").agg(F.sum("o").cast("long").alias("r"))
    cs = cells.groupBy("cv").agg(F.sum("o").cast("long").alias("c"))
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    dims = cells.agg(
        F.countDistinct("rv").cast("long").alias("nr"),
        F.countDistinct("cv").cast("long").alias("nc"),
    )
    diff = F.col("o").cast("double") * F.col("n") - F.col("r").cast(
        "double"
    ) * F.col("c")
    terms = (
        cells.join(F.broadcast(rs), "rv")
        .join(F.broadcast(cs), "cv")
        .crossJoin(F.broadcast(tot))
        .select(
            (F.floor((diff
                * diff
                / (
                    F.col("n").cast("double")
                    * F.col("r").cast("double")
                    * F.col("c")
                )) * 1e8 + 0.5) / 1e8)
            .cast("decimal(24,8)")
            .alias("tq")
        )
    )
    chi2 = terms.agg(F.sum("tq").cast("double").alias("chi2"))
    return (
        tot.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(chi2))
        .select(
            F.col("n").alias("n_rows"),
            "nr",
            "nc",
            (F.floor((F.col("chi2")) * 1e4 + 0.5) / 1e4).alias("chi2"),
            (F.floor((F.sqrt(
                    F.col("chi2")
                    / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))
                )) * 1e6 + 0.5) / 1e6).alias("cramers_v"),
        )
    )


# --------------------------------------------------------------------------
# Mutual information: quantity bucket vs returned flag (feature screen).
# --------------------------------------------------------------------------

_QMI_ORACLE = """
WITH rows_t AS (
  SELECT CAST(CEIL(l_quantity / 10.0) AS BIGINT) AS bucket,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem
),
cells AS (
  SELECT bucket, y, CAST(COUNT(*) AS BIGINT) AS nxy
  FROM rows_t GROUP BY bucket, y
),
margx AS (SELECT bucket, CAST(SUM(nxy) AS BIGINT) AS nx FROM cells GROUP BY bucket),
margy AS (SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny FROM cells GROUP BY y),
tot AS (SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM cells),
terms AS (
  SELECT CAST(FLOOR(((CAST(c.nxy AS DOUBLE) / t.n)
           * LN(CAST(c.nxy AS DOUBLE) * t.n
                / (CAST(mx.nx AS DOUBLE) * my.ny))) * 1e10 + 0.5) / 1e10 AS DECIMAL(24,10))
         AS tq
  FROM cells c
  JOIN margx mx USING (bucket) JOIN margy my USING (y) CROSS JOIN tot t
)
SELECT t2.n AS n_rows,
       FLOOR((CAST((SELECT SUM(tq) FROM terms) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS mi_nats
FROM tot t2
"""


@register(
    "q_feat_mutual_information",
    oracle=_QMI_ORACLE,
    description=(
        "mutual information (nats) between the quantity bucket and the "
        "returned flag — the model-free feature-relevance screen "
        "complementing q_feat_woe_iv; per-cell plogp terms quantized to "
        "DECIMAL before the cross-cell sum"
    ),
    tags=("feature-engineering", "statistics", "information", "aggregate"),
)
def q_feat_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    rows_t = li.select(
        F.ceil(F.col("l_quantity") / 10.0).cast("long").alias("bucket"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    cells = rows_t.groupBy("bucket", "y").agg(
        F.count(F.lit(1)).cast("long").alias("nxy")
    )
    margx = cells.groupBy("bucket").agg(F.sum("nxy").cast("long").alias("nx"))
    margy = cells.groupBy("y").agg(F.sum("nxy").cast("long").alias("ny"))
    tot = cells.agg(F.sum("nxy").cast("long").alias("n"))
    term = (F.col("nxy").cast("double") / F.col("n")) * F.log(
        F.col("nxy").cast("double")
        * F.col("n")
        / (F.col("nx").cast("double") * F.col("ny"))
    )
    terms = (
        cells.join(F.broadcast(margx), "bucket")
        .join(F.broadcast(margy), "y")
        .crossJoin(F.broadcast(tot))
        .select((F.floor((term) * 1e10 + 0.5) / 1e10).cast("decimal(24,10)").alias("tq"))
    )
    mi = terms.agg(F.sum("tq").cast("double").alias("mi"))
    return tot.crossJoin(F.broadcast(mi)).select(
        F.col("n").alias("n_rows"),
        (F.floor((F.col("mi")) * 1e6 + 0.5) / 1e6).alias("mi_nats"),
    )


# --------------------------------------------------------------------------
# Jarque-Bera normality test from exact raw power sums.
# --------------------------------------------------------------------------

_QJB_ORACLE = """
WITH sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(l_quantity) AS DOUBLE) AS s1,
         CAST(SUM(l_quantity * l_quantity) AS DOUBLE) AS s2,
         CAST(SUM(l_quantity * l_quantity * l_quantity) AS DOUBLE) AS s3,
         CAST(SUM(l_quantity * l_quantity * l_quantity * l_quantity)
              AS DOUBLE) AS s4
  FROM lineitem
),
mom AS (
  SELECT n,
         s1 / n AS m,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3 * (s1 / n) * (s2 / n)
           + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
         s4 / n - 4 * (s1 / n) * (s3 / n)
           + 6 * (s1 / n) * (s1 / n) * (s2 / n)
           - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM sums
)
SELECT n,
       FLOOR((m) * 1e6 + 0.5) / 1e6                                   AS mean_q,
       FLOOR((m3 / POW(m2, 1.5)) * 1e6 + 0.5) / 1e6                   AS skewness,
       FLOOR((m4 / (m2 * m2) - 3) * 1e6 + 0.5) / 1e6                  AS excess_kurtosis,
       FLOOR((n / 6.0 * ((m3 / POW(m2, 1.5)) * (m3 / POW(m2, 1.5))
             + (m4 / (m2 * m2) - 3) * (m4 / (m2 * m2) - 3) / 4.0)) * 1e4 + 0.5) / 1e4
                                                     AS jarque_bera
FROM mom
"""


@register(
    "q_stat_jarque_bera",
    oracle=_QJB_ORACLE,
    description=(
        "Jarque-Bera normality test of l_quantity: skewness, excess "
        "kurtosis, and the JB statistic from exact integer raw power "
        "sums (quantity^4 sums stay exact in doubles far past sf1.0) — "
        "one scan, one row, fixed-order arithmetic"
    ),
    tags=("statistics", "normality", "hypothesis-test", "aggregate"),
)
def q_stat_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    sums = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"),
        F.sum(q * q * q).cast("double").alias("s3"),
        F.sum(q * q * q * q).cast("double").alias("s4"),
    )
    m = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - m * m
    m3 = F.col("s3") / F.col("n") - 3 * m * (F.col("s2") / F.col("n")) + 2 * m * m * m
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * m * (F.col("s3") / F.col("n"))
        + 6 * m * m * (F.col("s2") / F.col("n"))
        - 3 * m * m * m * m
    )
    skew = m3 / F.pow(m2, 1.5)
    exk = m4 / (m2 * m2) - 3
    return sums.select(
        "n",
        (F.floor((m) * 1e6 + 0.5) / 1e6).alias("mean_q"),
        (F.floor((skew) * 1e6 + 0.5) / 1e6).alias("skewness"),
        (F.floor((exk) * 1e6 + 0.5) / 1e6).alias("excess_kurtosis"),
        (F.floor((F.col("n") / 6.0 * (skew * skew + exk * exk / 4.0)) * 1e4 + 0.5) / 1e4).alias(
            "jarque_bera"
        ),
    )


# --------------------------------------------------------------------------
# Pearson correlation matrix over integer-valued lineitem features.
# --------------------------------------------------------------------------

#: (name, SQL expression, Spark column factory) — integer-valued so all
#: sufficient statistics are exact. extendedprice is deliberately
#: excluded: its cents-squared sums exceed 2^53 at scale.
_PAIR_VARS = ("qty", "disc", "tax", "lineno")
_SQL_VAR = {
    "qty": "CAST(l_quantity AS BIGINT)",
    "disc": "CAST(ROUND(l_discount * 100, 0) AS BIGINT)",
    "tax": "CAST(ROUND(l_tax * 100, 0) AS BIGINT)",
    "lineno": "CAST(l_linenumber AS BIGINT)",
}
_PAIRS = [
    (a, b)
    for i, a in enumerate(_PAIR_VARS)
    for b in _PAIR_VARS[i + 1 :]
]


def _sql_corr(a: str, b: str) -> str:
    return (
        f"FLOOR(((n * s_{a}_{b} - s_{a} * s_{b}) / "
        f"(SQRT(n * s_{a}_{a} - s_{a} * s_{a}) * "
        f"SQRT(n * s_{b}_{b} - s_{b} * s_{b}))) * 1e6 + 0.5) / 1e6"
    )


def _sql_sums() -> str:
    cols = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for v in _PAIR_VARS:
        cols.append(f"CAST(SUM({_SQL_VAR[v]}) AS DOUBLE) AS s_{v}")
    for i, a in enumerate(_PAIR_VARS):
        for b in _PAIR_VARS[i:]:
            cols.append(
                f"CAST(SUM({_SQL_VAR[a]} * {_SQL_VAR[b]}) AS DOUBLE) AS s_{a}_{b}"
            )
    return ", ".join(cols)


_QPEARSON_ORACLE = (
    f"WITH sums AS (SELECT {_sql_sums()} FROM lineitem)\n"
    + "\nUNION ALL\n".join(
        f"SELECT '{a}' AS var_x, '{b}' AS var_y, {_sql_corr(a, b)} AS pearson_r "
        "FROM sums"
        for a, b in _PAIRS
    )
)


@register(
    "q_stat_pearson_matrix",
    oracle=_QPEARSON_ORACLE,
    description=(
        "Pearson correlation matrix over the integer-valued lineitem "
        "features (quantity, discount%, tax%, linenumber): all 6 pairs "
        "from ONE scan's exact sufficient statistics (sums and cross "
        "products of small integers), fixed-order arithmetic per pair"
    ),
    tags=("statistics", "correlation", "profiling", "aggregate"),
)
def q_stat_pearson_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    var = {
        "qty": F.col("l_quantity").cast("long"),
        "disc": F.round(F.col("l_discount") * 100, 0).cast("long"),
        "tax": F.round(F.col("l_tax") * 100, 0).cast("long"),
        "lineno": F.col("l_linenumber").cast("long"),
    }
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for v in _PAIR_VARS:
        aggs.append(F.sum(var[v]).cast("double").alias(f"s_{v}"))
    for i, a in enumerate(_PAIR_VARS):
        for b in _PAIR_VARS[i:]:
            aggs.append(
                F.sum(var[a] * var[b]).cast("double").alias(f"s_{a}_{b}")
            )
    sums = li.agg(*aggs)

    def _corr(a: str, b: str):
        n = F.col("n")
        num = n * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        da = F.sqrt(n * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
        db = F.sqrt(n * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
        return (F.floor((num / (da * db)) * 1e6 + 0.5) / 1e6)

    frames = [
        sums.select(
            F.lit(a).alias("var_x"),
            F.lit(b).alias("var_y"),
            _corr(a, b).alias("pearson_r"),
        )
        for a, b in _PAIRS
    ]
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out


# --------------------------------------------------------------------------
# Cochran-Armitage trend test: ordered categories vs a binary response
# (round 11) — the trend companion the chi-square independence test
# cannot answer ("is the F-rate MONOTONE in priority?" vs "dependent?").
# --------------------------------------------------------------------------

_QCATREND_ORACLE = """
WITH g AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f
  FROM orders GROUP BY 1
),
s AS (
  SELECT CAST(SUM(n) AS BIGINT)      AS nn,
         CAST(SUM(f) AS BIGINT)      AS r,
         CAST(SUM(w * f) AS BIGINT)  AS swf,
         CAST(SUM(w * n) AS BIGINT)  AS swn,
         CAST(SUM(w * w * n) AS BIGINT) AS swwn,
         CAST(COUNT(*) AS BIGINT)    AS k
  FROM g
)
SELECT k AS n_groups, nn AS n_orders, r AS n_responders,
       FLOOR((CAST(nn * swf - r * swn AS DOUBLE)
             / CAST(nn AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS trend_t,
       CASE WHEN r > 0 AND r < nn AND nn * swwn - swn * swn > 0
            THEN FLOOR((CAST(nn * swf - r * swn AS DOUBLE)
                       * sqrt(CAST(nn AS DOUBLE))
                       / sqrt(CAST(r AS DOUBLE) * CAST(nn - r AS DOUBLE)
                              * CAST(nn * swwn - swn * swn AS DOUBLE))) * 1e6 + 0.5) / 1e6
            END AS z_trend,
       CASE WHEN r > 0 AND r < nn AND nn * swwn - swn * swn > 0
            THEN CAST(ABS(CAST(nn * swf - r * swn AS DOUBLE)
                          * sqrt(CAST(nn AS DOUBLE))
                          / sqrt(CAST(r AS DOUBLE) * CAST(nn - r AS DOUBLE)
                                 * CAST(nn * swwn - swn * swn AS DOUBLE)))
                      > 1.96e0 AS INT)
            END AS significant_05
FROM s
"""


@register(
    "q_stat_cochran_armitage",
    oracle=_QCATREND_ORACLE,
    description=(
        "Cochran-Armitage trend test: is the 'F'-status rate monotone "
        "in order priority (scores 1..5)? T = sum w_i (f_i - n_i R/N) "
        "with variance R(N-R)[N sum(w^2 n) - (sum w n)^2] / N^3 — all "
        "sufficient statistics exact integers, z in one mirrored double "
        "expression"
    ),
    tags=("statistics", "trend", "hypothesis-test", "ordinal", "aggregate"),
)
def q_stat_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The missing ordered-categories test: chi-square asks "are
    priority and status dependent at all?"; Cochran-Armitage asks the
    sharper monotone question with 1 dof. Scaled to integers:
    T*N = N*sum(w f) - R*sum(w n) and Var*N^3 = R(N-R)(N*sum(w^2 n) -
    (sum w n)^2) are exact BIGINTs, so z = T*N*sqrt(N)/sqrt(R(N-R)V)
    is one mirrored double expression over exact integers. One 5-row
    grouped rollup — the 100 TB shape (shuffle carries 5 group sums)."""
    o = table(spark, sf_dir, "orders")
    g = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("w")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1))
        .cast("long")
        .alias("f"),
    )
    s = g.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("f").cast("long").alias("r"),
        F.sum(F.col("w") * F.col("f")).cast("long").alias("swf"),
        F.sum(F.col("w") * F.col("n")).cast("long").alias("swn"),
        F.sum(F.col("w") * F.col("w") * F.col("n"))
        .cast("long")
        .alias("swwn"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    tn = (F.col("nn") * F.col("swf") - F.col("r") * F.col("swn")).cast(
        "double"
    )
    v = (
        F.col("r").cast("double")
        * (F.col("nn") - F.col("r")).cast("double")
        * (F.col("nn") * F.col("swwn") - F.col("swn") * F.col("swn")).cast(
            "double"
        )
    )
    z = tn * F.sqrt(F.col("nn").cast("double")) / F.sqrt(v)
    # degenerate-variance guard mirrored with the oracle's CASE WHEN
    # (r=0, r=N, or constant w => v=0): NULL in both engines rather than
    # Spark-NULL-vs-DuckDB-inf drift (r11 ADVICE; same class as the
    # McNemar and runs-test guards).
    ok = (
        (F.col("r") > 0)
        & (F.col("r") < F.col("nn"))
        & (F.col("nn") * F.col("swwn") - F.col("swn") * F.col("swn") > 0)
    )
    return s.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_orders"),
        F.col("r").alias("n_responders"),
        (F.floor((tn / F.col("nn").cast("double")) * 1e4 + 0.5) / 1e4).alias("trend_t"),
        F.when(ok, (F.floor((z) * 1e6 + 0.5) / 1e6)).alias("z_trend"),
        # INT (not BOOLEAN): a nullable boolean round-trips as
        # None-vs-NaN across the two engines' pandas bridges; a nullable
        # int lands as NaN in both.
        F.when(ok, (F.abs(z) > F.lit(1.96)).cast("int")).alias(
            "significant_05"
        ),
    )


# --------------------------------------------------------------------------
# Cohen's kappa (round 11): chance-corrected agreement between two
# binary "raters" — here the repetition screen (type-token diversity
# < 0.5) and the exact-duplicate label. The curation audit question:
# does the cheap heuristic AGREE with ground-truth duplication beyond
# chance? Raw accuracy flatters imbalanced labels; kappa doesn't.
# --------------------------------------------------------------------------

_QKAPPA_ORACLE = f"""
WITH lab AS (
  SELECT doc_id,
         CASE WHEN len(list_distinct(string_split(text, ' '))) * 2
                   < len(string_split(text, ' ')) THEN 1 ELSE 0 END AS a,
         CASE WHEN COUNT(*) OVER (PARTITION BY text) > 1 THEN 1 ELSE 0 END
           AS b
  FROM documents
),
cells AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE a = 1 AND b = 1) AS BIGINT) AS n11,
         CAST(COUNT(*) FILTER (WHERE a = 1 AND b = 0) AS BIGINT) AS n10,
         CAST(COUNT(*) FILTER (WHERE a = 0 AND b = 1) AS BIGINT) AS n01,
         CAST(COUNT(*) FILTER (WHERE a = 0 AND b = 0) AS BIGINT) AS n00
  FROM lab
)
SELECT n AS n_docs, n11, n10, n01, n00,
       {rdiv_halfup_duck("n11 + n00", "n", 6)} AS observed_agreement,
       CASE WHEN n * n - ((n11 + n10) * (n11 + n01)
                          + (n01 + n00) * (n10 + n00)) <> 0
            THEN {rdiv_halfup_duck(
                "n * (n11 + n00) - ((n11 + n10) * (n11 + n01)"
                " + (n01 + n00) * (n10 + n00))",
                "n * n - ((n11 + n10) * (n11 + n01)"
                " + (n01 + n00) * (n10 + n00))", 6)}
            END AS cohens_kappa
FROM cells
"""


@register(
    "q_stat_cohens_kappa",
    oracle=_QKAPPA_ORACLE,
    description=(
        "Cohen's kappa between the repetition screen (type-token "
        "diversity < 0.5, an integer comparison) and the exact-duplicate "
        "label: kappa reduces to ONE exact integer ratio "
        "(n(n11+n00) - sum(r_i c_i)) / (n^2 - sum(r_i c_i)) — "
        "chance-corrected agreement for curation-rule audits"
    ),
    tags=("statistics", "agreement", "kappa", "curation", "aggregate"),
)
def q_stat_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kappa = (p_o - p_e)/(1 - p_e) with p_o = (n11+n00)/n and
    p_e = (r1 c1 + r0 c0)/n^2 clears denominators into a single exact
    integer fraction — ONE double division total, so the statistic is
    order-independent and oracles bit-for-bit. Degenerate chance
    agreement (p_e = 1: a rater is constant) yields a mirrored NULL in
    both engines rather than NULL-vs-NaN drift. Everything before the
    division is two corpus aggregations (the dup label is a text-keyed
    window count in the oracle; the engine uses the equivalent groupBy
    + join)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    a = F.when(
        F.size(F.array_distinct(toks)) * 2 < F.size(toks), 1
    ).otherwise(0)
    dup = (
        d.groupBy(F.col("text").alias("__dup_text"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_same"))
    )
    # null-safe equi-join key: the oracle's COUNT(*) OVER (PARTITION BY
    # text) groups NULL texts into one retained partition, so the engine
    # must not drop them through a plain inner join (r11 ADVICE).
    lab = d.join(dup, F.col("text").eqNullSafe(F.col("__dup_text"))).select(
        a.alias("a"),
        F.when(F.col("n_same") > 1, 1).otherwise(0).alias("b"),
    )
    cells = lab.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when((F.col("a") == 1) & (F.col("b") == 1), 1))
        .cast("long")
        .alias("n11"),
        F.count(F.when((F.col("a") == 1) & (F.col("b") == 0), 1))
        .cast("long")
        .alias("n10"),
        F.count(F.when((F.col("a") == 0) & (F.col("b") == 1), 1))
        .cast("long")
        .alias("n01"),
        F.count(F.when((F.col("a") == 0) & (F.col("b") == 0), 1))
        .cast("long")
        .alias("n00"),
    )
    n = F.col("n")
    chance = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    num = n * (F.col("n11") + F.col("n00")) - chance
    den = n * n - chance
    return cells.select(
        n.alias("n_docs"),
        "n11",
        "n10",
        "n01",
        "n00",
        rdiv_halfup_expr("n11 + n00", "n", 6).alias(
            "observed_agreement"
        ),
        F.when(
            den != 0,
            rdiv_halfup_expr(
                "n * (n11 + n00) - ((n11 + n10) * (n11 + n01)"
                " + (n01 + n00) * (n10 + n00))",
                "n * n - ((n11 + n10) * (n11 + n01)"
                " + (n01 + n00) * (n10 + n00))",
                6,
            ),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("cohens_kappa"),
    )


# --------------------------------------------------------------------------
# Partial correlation (round 11): does the qty-discount association
# survive controlling for tax? r_xy.z from the three pairwise Pearson
# r's — the confounder-adjusted companion to q_stat_pearson_matrix.
# --------------------------------------------------------------------------

_QPARTIAL_ORACLE = """
WITH v AS (
  SELECT CAST(l_quantity AS HUGEINT) AS x,
         CAST(ROUND(l_discount * 100, 0) AS HUGEINT) AS y,
         CAST(ROUND(l_tax * 100, 0) AS HUGEINT) AS z
  FROM lineitem
),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(z) AS DOUBLE) AS sz,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy,
         CAST(SUM(z * z) AS DOUBLE) AS szz,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(x * z) AS DOUBLE) AS sxz,
         CAST(SUM(y * z) AS DOUBLE) AS syz,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM v
),
r AS (
  SELECT n_rows,
         CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
              THEN (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx)
                                          * sqrt(n * syy - sy * sy))
              END AS rxy,
         CASE WHEN n * sxx - sx * sx > 0 AND n * szz - sz * sz > 0
              THEN (n * sxz - sx * sz) / (sqrt(n * sxx - sx * sx)
                                          * sqrt(n * szz - sz * sz))
              END AS rxz,
         CASE WHEN n * syy - sy * sy > 0 AND n * szz - sz * sz > 0
              THEN (n * syz - sy * sz) / (sqrt(n * syy - sy * sy)
                                          * sqrt(n * szz - sz * sz))
              END AS ryz
  FROM s
)
SELECT n_rows,
       FLOOR((rxy) * 1e6 + 0.5) / 1e6 AS r_xy,
       FLOOR((rxz) * 1e6 + 0.5) / 1e6 AS r_xz,
       FLOOR((ryz) * 1e6 + 0.5) / 1e6 AS r_yz,
       CASE WHEN rxz * rxz < 1.0e0 AND ryz * ryz < 1.0e0
            THEN FLOOR(((rxy - rxz * ryz)
                       / (sqrt(1.0e0 - rxz * rxz)
                          * sqrt(1.0e0 - ryz * ryz))) * 1e6 + 0.5) / 1e6
            END AS r_xy_given_z
FROM r
"""


@register(
    "q_stat_partial_corr",
    oracle=_QPARTIAL_ORACLE,
    description=(
        "partial correlation r_xy.z of quantity vs discount controlling "
        "for tax: (r_xy - r_xz r_yz)/sqrt((1-r_xz^2)(1-r_yz^2)) over "
        "exact integer moments — the confounder-adjusted companion to "
        "the Pearson matrix"
    ),
    tags=("statistics", "correlation", "partial", "aggregate"),
)
def q_stat_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One aggregation ships ten exact integer moments (the variables
    are small integers, so the double sums are exact far past sf1.0);
    the three pairwise r's and the partial r evaluate as ONE mirrored
    double expression tree in both engines — same association, rounded
    once. The statistic every 'X drives Y' claim needs before anyone
    believes it (here: qty-discount net of the tax bracket)."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_discount") * 100, 0).cast("long")
    z = F.round(F.col("l_tax") * 100, 0).cast("long")
    s = li.select(
        x.alias("x"), y.alias("y"), z.alias("z")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("z").cast("double").alias("sz"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("z") * F.col("z")).cast("double").alias("szz"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("z")).cast("double").alias("sxz"),
        F.sum(F.col("y") * F.col("z")).cast("double").alias("syz"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    n = F.col("n")

    def _r(sab, sa, sb, saa, sbb):
        # zero-variance guard mirrored with the oracle's CASE WHEN
        # (constant column => denominator 0): NULL in both engines
        # rather than Spark-NULL-vs-DuckDB-inf drift (r11 ADVICE).
        va = n * F.col(saa) - F.col(sa) * F.col(sa)
        vb = n * F.col(sbb) - F.col(sb) * F.col(sb)
        return F.when(
            (va > 0) & (vb > 0),
            (n * F.col(sab) - F.col(sa) * F.col(sb))
            / (F.sqrt(va) * F.sqrt(vb)),
        )

    rxy = _r("sxy", "sx", "sy", "sxx", "syy")
    rxz = _r("sxz", "sx", "sz", "sxx", "szz")
    ryz = _r("syz", "sy", "sz", "syy", "szz")
    partial = F.when(
        (rxz * rxz < 1.0) & (ryz * ryz < 1.0),
        (rxy - rxz * ryz)
        / (F.sqrt(F.lit(1.0) - rxz * rxz) * F.sqrt(F.lit(1.0) - ryz * ryz)),
    )
    return s.select(
        "n_rows",
        (F.floor((rxy) * 1e6 + 0.5) / 1e6).alias("r_xy"),
        (F.floor((rxz) * 1e6 + 0.5) / 1e6).alias("r_xz"),
        (F.floor((ryz) * 1e6 + 0.5) / 1e6).alias("r_yz"),
        (F.floor((partial) * 1e6 + 0.5) / 1e6).alias("r_xy_given_z"),
    )
