"""Statistical hypothesis tests and inference as aggregations.

Data-quality/fraud screening and inference at warehouse scale reduce to
exact counts plus closed-form statistics. The determinism discipline is
shared: counts/ranks are exact integers, each floating term is either a
single mirrored-association double expression over exact integers or is
quantized to DECIMAL before a cross-cell SUM, so every statistic is
order-independent and oracles exactly.

- **Benford**: leading-digit distribution of order totals vs the
  log10(1 + 1/d) law. Real transactional amounts follow it; fabricated
  numbers rarely do.
- **Chi-square independence**: event_type × day-of-week contingency,
  integer-scaled summands ``(o·n − rs·cs)² / (n·rs·cs)``.
- **Kolmogorov-Smirnov two-sample**: integer D numerator
  ``max |c1·n2 − c2·n1|`` over one sorted pooled walk.
- **Bootstrap CI of the mean**: counter-hash resampling (no RNG state),
  exact integer replica sums, integer-ranked percentile bounds.
- **Mann-Whitney U**: doubled midranks keep the rank-sum statistic
  integer-exact; tie-corrected z enters doubles last.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import sql_hash60
from ..registry import register
from ..tables import table

_QBENFORD_ORACLE = """
WITH v AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders
),
obs AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS o FROM v GROUP BY digit),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
cells AS (
  SELECT obs.digit, obs.o, tot.n,
         CAST(tot.n AS DOUBLE) * log10(1.0e0 + (1.0e0 / obs.digit)) AS e
  FROM obs CROSS JOIN tot
),
terms AS (
  SELECT digit, o, n, e,
         CAST(FLOOR((((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)) / e) * 1e8 + 0.5) / 1e8
              AS DECIMAL(24,8)) AS t
  FROM cells
),
chi AS (SELECT CAST(SUM(t) AS DOUBLE) AS chi2 FROM terms)
SELECT t.digit,
       t.o AS observed,
       FLOOR((t.e) * 1e2 + 0.5) / 1e2 AS expected,
       FLOOR(((CAST(t.o AS DOUBLE) / CAST(t.n AS DOUBLE)) * 100.0e0) * 1e4 + 0.5) / 1e4
         AS observed_pct,
       FLOOR((c.chi2) * 1e4 + 0.5) / 1e4 AS chi2_total
FROM terms t CROSS JOIN chi c
ORDER BY t.digit
"""


@register(
    "q_benford_leading_digit",
    oracle=_QBENFORD_ORACLE,
    description=(
        "Benford's-law screen: leading-digit distribution of order totals "
        "vs log10(1+1/d), with an exact-decimal chi-square statistic"
    ),
    tags=("statistics", "benford", "data-quality", "fraud", "aggregate"),
)
def q_benford_leading_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"),
        1,
        1,
    ).cast("int")
    obs = (
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    tot = o.agg(F.count(F.lit(1)).cast("long").alias("n"))
    e = F.col("n").cast("double") * F.log10(
        F.lit(1.0) + (F.lit(1.0) / F.col("digit"))
    )
    cells = obs.crossJoin(F.broadcast(tot)).select(
        "digit", "o", "n", e.alias("e")
    )
    od = F.col("o").cast("double")
    terms = cells.select(
        "digit",
        "o",
        "n",
        "e",
        (F.floor((((od - F.col("e")) * (od - F.col("e"))) / F.col("e")) * 1e8 + 0.5) / 1e8)
        .cast("decimal(24,8)")
        .alias("t"),
    )
    chi = terms.agg(F.sum("t").cast("double").alias("chi2"))
    return (
        terms.crossJoin(F.broadcast(chi))
        .select(
            "digit",
            F.col("o").alias("observed"),
            (F.floor((F.col("e")) * 1e2 + 0.5) / 1e2).alias("expected"),
            (F.floor(((F.col("o").cast("double") / F.col("n").cast("double"))
                * 100.0) * 1e4 + 0.5) / 1e4).alias("observed_pct"),
            (F.floor((F.col("chi2")) * 1e4 + 0.5) / 1e4).alias("chi2_total"),
        )
        .orderBy("digit")
    )


_QCHI2_ORACLE = """
WITH cells AS (
  SELECT event_type, dayofweek(CAST(ts AS DATE)) AS dow,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY event_type, dayofweek(CAST(ts AS DATE))
),
rs AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY event_type),
cs AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY dow),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
terms AS (
  SELECT cells.event_type, cells.dow,
         CAST(FLOOR((((CAST(cells.o AS DOUBLE) * CAST(t.n AS DOUBLE))
            - (CAST(rs.r AS DOUBLE) * CAST(cs.c AS DOUBLE)))
           * ((CAST(cells.o AS DOUBLE) * CAST(t.n AS DOUBLE))
              - (CAST(rs.r AS DOUBLE) * CAST(cs.c AS DOUBLE)))
           / (CAST(t.n AS DOUBLE) * (CAST(rs.r AS DOUBLE) * CAST(cs.c AS DOUBLE)))) * 1e8 + 0.5) / 1e8 AS DECIMAL(24,8)) AS t
  FROM cells
  JOIN rs ON rs.event_type = cells.event_type
  JOIN cs ON cs.dow = cells.dow
  CROSS JOIN tot t
),
dims AS (
  SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nr,
         CAST(COUNT(DISTINCT dow) AS BIGINT) AS nc
  FROM cells
)
SELECT t2.n AS n_events,
       d.nr AS n_rows_dim, d.nc AS n_cols_dim,
       (d.nr - 1) * (d.nc - 1) AS dof,
       FLOOR((CAST((SELECT SUM(t) FROM terms) AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS chi2
FROM tot t2 CROSS JOIN dims d
"""


@register(
    "q_chi_square_independence",
    oracle=_QCHI2_ORACLE,
    description=(
        "chi-square independence test of event_type vs day-of-week from "
        "one contingency aggregation; integer-scaled exact-decimal summands"
    ),
    tags=("statistics", "chi-square", "hypothesis-test", "aggregate"),
)
def q_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.dayofweek(F.to_date("ts")).alias("dow")
    )
    cells = ev.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rs = cells.groupBy("event_type").agg(F.sum("o").cast("long").alias("r"))
    cs = cells.groupBy("dow").agg(F.sum("o").cast("long").alias("c"))
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    dims = cells.agg(
        F.countDistinct("event_type").cast("long").alias("nr"),
        F.countDistinct("dow").cast("long").alias("nc"),
    )
    od, nd = F.col("o").cast("double"), F.col("n").cast("double")
    rd, cd = F.col("r").cast("double"), F.col("c").cast("double")
    num = (od * nd) - (rd * cd)
    terms = (
        cells.join(F.broadcast(rs), on="event_type")
        .join(F.broadcast(cs), on="dow")
        .crossJoin(F.broadcast(tot))
        .select(
            (F.floor((num * num / (nd * (rd * cd))) * 1e8 + 0.5) / 1e8)
            .cast("decimal(24,8)")
            .alias("t")
        )
    )
    chi = terms.agg(F.sum("t").cast("double").alias("chi2"))
    return (
        tot.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(chi))
        .select(
            F.col("n").alias("n_events"),
            F.col("nr").alias("n_rows_dim"),
            F.col("nc").alias("n_cols_dim"),
            ((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof"),
            (F.floor((F.col("chi2")) * 1e4 + 0.5) / 1e4).alias("chi2"),
        )
    )


_QKS_ORACLE = """
WITH pooled AS (
  SELECT event_id, value,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_a,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_b
  FROM events WHERE event_type IN ('view', 'purchase')
),
tot AS (
  SELECT CAST(SUM(is_a) AS BIGINT) AS n1, CAST(SUM(is_b) AS BIGINT) AS n2
  FROM pooled
),
walk AS (
  SELECT SUM(is_a) OVER (ORDER BY value, is_a, event_id
                         ROWS UNBOUNDED PRECEDING) AS c1,
         SUM(is_b) OVER (ORDER BY value, is_a, event_id
                         ROWS UNBOUNDED PRECEDING) AS c2
  FROM pooled
),
d AS (
  SELECT CAST(MAX(ABS((c1 * t.n2) - (c2 * t.n1))) AS BIGINT) AS d_num
  FROM walk CROSS JOIN tot t
)
SELECT t.n1 AS n_view, t.n2 AS n_purchase,
       d.d_num,
       FLOOR((CAST(d.d_num AS DOUBLE)
             / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS ks_d,
       FLOOR((1.358e0 * sqrt((CAST(t.n1 AS DOUBLE) + CAST(t.n2 AS DOUBLE))
                            / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)))) * 1e6 + 0.5) / 1e6
         AS ks_crit_05,
       (CAST(d.d_num AS DOUBLE)
        / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)))
       > (1.358e0 * sqrt((CAST(t.n1 AS DOUBLE) + CAST(t.n2 AS DOUBLE))
                         / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE))))
         AS reject_05
FROM tot t CROSS JOIN d
"""


@register(
    "q_ks_two_sample",
    oracle=_QKS_ORACLE,
    description=(
        "two-sample Kolmogorov-Smirnov (view vs purchase values): exact "
        "integer D numerator max|c1*n2 - c2*n1| from per-value tie-group "
        "checkpoints via the range-bucketed rank kernel (no global sort)"
    ),
    tags=("statistics", "ks-test", "hypothesis-test", "window"),
)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KS distance is a max over the pooled sorted walk. The oracle
    (and the engine through round 10) expresses it as ONE GLOBAL WINDOW
    over raw pooled events — correct, but the sort serializes through a
    single window partition at 100 TB. The engine now computes the same
    integer D numerator from the DISTINCT-VALUE frame with the
    range-bucketed running-sum kernel (operators/rankstats.py):

    within a tie group the oracle's walk order (value, is_a, event_id)
    adds all is_b rows then all is_a rows, and |c1*n2 - c2*n1| is
    |linear| in each counter — maximized at the sub-phase ENDPOINTS. So
    the walk's max equals, per distinct value, the max of the two
    checkpoints (after b's: c1=ca-ta, c2=cb) and (group end: ca, cb),
    where ca/cb are bucketed cumulative per-value counts. The event_id
    tiebreak never matters (same-counter increments are endpoint-
    dominated). D stays INTEGER (exact in both engines); the 5% critical
    value is the asymptotic c(alpha)=1.358 mirrored literal."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    pooled = ev.select(
        "value",
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("is_a"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_b"),
    )
    tot = pooled.agg(
        F.sum("is_a").cast("long").alias("n1"),
        F.sum("is_b").cast("long").alias("n2"),
    )
    byval = pooled.groupBy("value").agg(
        F.sum("is_a").cast("long").alias("ta"),
        F.sum("is_b").cast("long").alias("tb"),
    )
    from .rankstats import bucketed_running

    cum = bucketed_running(
        byval,
        axis="value",
        order=[F.col("value").asc()],
        cums={"ca": F.col("ta"), "cb": F.col("tb")},
    )
    mid = F.abs(
        ((F.col("ca") - F.col("ta")) * F.col("n2"))
        - (F.col("cb") * F.col("n1"))
    )
    end = F.abs((F.col("ca") * F.col("n2")) - (F.col("cb") * F.col("n1")))
    d = cum.crossJoin(F.broadcast(tot)).agg(
        F.max(F.greatest(mid, end)).cast("long").alias("d_num")
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    ks = F.col("d_num").cast("double") / (n1d * n2d)
    crit = F.lit(1.358) * F.sqrt((n1d + n2d) / (n1d * n2d))
    return tot.crossJoin(F.broadcast(d)).select(
        F.col("n1").alias("n_view"),
        F.col("n2").alias("n_purchase"),
        "d_num",
        (F.floor((ks) * 1e6 + 0.5) / 1e6).alias("ks_d"),
        (F.floor((crit) * 1e6 + 0.5) / 1e6).alias("ks_crit_05"),
        (ks > crit).alias("reject_05"),
    )


# --- Bootstrap confidence interval ------------------------------------------
#
# Resampling WITHOUT an RNG: bootstrap replica b draws its i-th sample
# as row hash(b:i) mod n — the counter-hash discipline of mc/hashrng
# applied to inference. Every draw is a pure function of (replica, i),
# so the procedure is reproducible under retries/repartitioning AND
# replayable by the oracle. The distributed shape: rows x B replicas is
# one generated join (n·B rows, embarrassingly parallel), replica sums
# are exact integer cents, and the CI bounds come from integer-ranked
# replica sums — no float enters until the final means.

BOOT_B = 40  # replicas; ranks 2 and 39 ~ the 2.5/97.5 percentile bounds
_RK_LO, _RK_HI = 2, 39

_QBOOT_ORACLE = f"""
WITH rows0 AS (
  SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
         ROW_NUMBER() OVER (ORDER BY event_id) AS rn
  FROM events
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv FROM rows0),
reps AS (SELECT gs.g AS b FROM generate_series(1, {BOOT_B}) AS gs(g)),
draws AS (
  SELECT r.b,
         ({sql_hash60("CONCAT(CAST(r.b AS VARCHAR), ':', CAST(x.rn AS VARCHAR))")}
          % t.n) + 1 AS idx
  FROM rows0 x CROSS JOIN reps r CROSS JOIN tot t
),
sums AS (
  SELECT d.b, CAST(SUM(r2.v) AS BIGINT) AS s
  FROM draws d JOIN rows0 r2 ON r2.rn = d.idx
  GROUP BY d.b
),
ranked AS (SELECT b, s, ROW_NUMBER() OVER (ORDER BY s, b) AS rk FROM sums)
SELECT t.n AS n_rows, {BOOT_B} AS n_replicas,
       FLOOR(((CAST(t.sv AS DOUBLE) / CAST(t.n AS DOUBLE)) / 100.0e0) * 1e4 + 0.5) / 1e4
         AS mean_full,
       FLOOR(((CAST((SELECT s FROM ranked WHERE rk = {_RK_LO}) AS DOUBLE)
              / CAST(t.n AS DOUBLE)) / 100.0e0) * 1e4 + 0.5) / 1e4 AS ci_lo,
       FLOOR(((CAST((SELECT s FROM ranked WHERE rk = {_RK_HI}) AS DOUBLE)
              / CAST(t.n AS DOUBLE)) / 100.0e0) * 1e4 + 0.5) / 1e4 AS ci_hi
FROM tot t
"""


@register(
    "q_bootstrap_ci_mean",
    oracle=_QBOOT_ORACLE,
    description=(
        "bootstrap 95% CI of the mean event value: 40 counter-hash "
        "resampled replicas, exact integer replica sums, integer-ranked "
        "percentile bounds — reproducible with no RNG state"
    ),
    tags=("statistics", "bootstrap", "inference", "hash-rng", "scale"),
)
def q_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from ..functions.hashing import hash60
    from .rankstats import bucketed_running

    ev = table(spark, sf_dir, "events").select("event_id", "value")
    # rn = ROW_NUMBER() OVER (ORDER BY event_id), computed as the
    # range-bucketed two-pass rank (operators/rankstats.py) so no
    # corpus-sized frame serializes through one window partition; the
    # oracle keeps the window form and the rn values are identical.
    rows0 = bucketed_running(
        ev,
        axis="event_id",
        order=[F.col("event_id").asc()],
        cums={"rn": F.lit(1)},
    ).select(
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        F.col("rn").cast("int").alias("rn"),
    )
    tot = rows0.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("sv"),
    )
    reps = spark.range(1, BOOT_B + 1).select(F.col("id").alias("b"))
    draw_key = F.concat(
        F.col("b").cast("string"), F.lit(":"), F.col("rn").cast("string")
    )
    draws = (
        rows0.select("rn")
        .crossJoin(F.broadcast(reps))
        .crossJoin(F.broadcast(tot.select("n")))
        .select("b", ((hash60(draw_key) % F.col("n")) + 1).alias("idx"))
    )
    sums = (
        draws.join(
            rows0.select(F.col("rn").alias("idx"), "v"), on="idx"
        )
        .groupBy("b")
        .agg(F.sum("v").cast("long").alias("s"))
    )
    ranked = sums.select(
        "s", F.row_number().over(Window.orderBy("s", "b")).alias("rk")
    )
    lo = ranked.where(F.col("rk") == _RK_LO).select(
        F.col("s").alias("s_lo")
    )
    hi = ranked.where(F.col("rk") == _RK_HI).select(
        F.col("s").alias("s_hi")
    )
    nd = F.col("n").cast("double")
    return (
        tot.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            F.col("n").alias("n_rows"),
            F.lit(BOOT_B).cast("int").alias("n_replicas"),
            (F.floor(((F.col("sv").cast("double") / nd) / 100.0) * 1e4 + 0.5) / 1e4).alias(
                "mean_full"
            ),
            (F.floor(((F.col("s_lo").cast("double") / nd) / 100.0) * 1e4 + 0.5) / 1e4).alias(
                "ci_lo"
            ),
            (F.floor(((F.col("s_hi").cast("double") / nd) / 100.0) * 1e4 + 0.5) / 1e4).alias(
                "ci_hi"
            ),
        )
    )


# --- Mann-Whitney U (Wilcoxon rank-sum) -------------------------------------
#
# The nonparametric difference-of-location test: U depends only on
# RANKS, so the whole statistic is exact integer arithmetic — midranks
# for ties are carried DOUBLED (lo+hi per tie group, an integer), the
# doubled U and its doubled mean n1·n2 stay integers, and the
# tie-corrected variance enters doubles only in the final z. One
# grouped-by-value aggregation plus one cumulative window — the same
# cost envelope as the exact percentiles.

_QMWU_ORACLE = """
WITH pooled AS (
  SELECT value,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_a
  FROM events WHERE event_type IN ('view', 'purchase')
),
tot AS (
  SELECT CAST(SUM(is_a) AS BIGINT) AS n1,
         CAST(COUNT(*) - SUM(is_a) AS BIGINT) AS n2,
         CAST(COUNT(*) AS BIGINT) AS nn
  FROM pooled
),
byval AS (
  SELECT value, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(is_a) AS BIGINT) AS ta
  FROM pooled GROUP BY value
),
cum AS (
  SELECT value, t, ta,
         SUM(t) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS hi
  FROM byval
),
agg AS (
  SELECT CAST(SUM(ta * ((hi - t + 1) + hi)) AS BIGINT) AS sum_rank2_a,
         CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
  FROM cum
)
SELECT t.n1, t.n2,
       FLOOR(((CAST(a.sum_rank2_a AS DOUBLE)
              - CAST(t.n1 * (t.n1 + 1) AS DOUBLE)) / 2.0e0) * 1e1 + 0.5) / 1e1 AS u_stat,
       FLOOR((((CAST(a.sum_rank2_a AS DOUBLE)
               - CAST(t.n1 * (t.n1 + 1) AS DOUBLE))
              - CAST(t.n1 * t.n2 AS DOUBLE))
             / (2.0e0 * sqrt((CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)
                              / 12.0e0)
                             * ((CAST(t.nn + 1 AS DOUBLE))
                                - (CAST(a.tie_term AS DOUBLE)
                                   / (CAST(t.nn AS DOUBLE)
                                      * CAST(t.nn - 1 AS DOUBLE))))))) * 1e4 + 0.5) / 1e4
         AS z_score,
       ABS(((CAST(a.sum_rank2_a AS DOUBLE)
             - CAST(t.n1 * (t.n1 + 1) AS DOUBLE))
            - CAST(t.n1 * t.n2 AS DOUBLE))
           / (2.0e0 * sqrt((CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)
                            / 12.0e0)
                           * ((CAST(t.nn + 1 AS DOUBLE))
                              - (CAST(a.tie_term AS DOUBLE)
                                 / (CAST(t.nn AS DOUBLE)
                                    * CAST(t.nn - 1 AS DOUBLE))))))) > 1.96e0
         AS significant_05
FROM tot t CROSS JOIN agg a
"""


@register(
    "q_mann_whitney_u",
    oracle=_QMWU_ORACLE,
    description=(
        "Mann-Whitney U (view vs purchase values): doubled midranks keep "
        "the statistic integer-exact, tie-corrected normal z enters "
        "doubles only at the end"
    ),
    tags=("statistics", "rank-sum", "hypothesis-test", "nonparametric"),
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U depends only on per-value tie-group ranks, so the cumulative
    count over distinct values is the whole ordered computation — and
    since round 11 it runs through the range-bucketed running-sum
    kernel (operators/rankstats.py) instead of a single global window:
    same hi values bit-for-bit, parallelism = n_buckets instead of 1.
    The oracle keeps the window form."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    pooled = ev.select(
        "value",
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("is_a"),
    )
    tot = pooled.agg(
        F.sum("is_a").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("is_a")).cast("long").alias("n2"),
        F.count(F.lit(1)).cast("long").alias("nn"),
    )
    byval = pooled.groupBy("value").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("is_a").cast("long").alias("ta"),
    )
    from .rankstats import bucketed_running

    cum = bucketed_running(
        byval,
        axis="value",
        order=[F.col("value").asc()],
        cums={"hi": F.col("t")},
    )
    agg = cum.agg(
        F.sum(
            F.col("ta") * ((F.col("hi") - F.col("t") + 1) + F.col("hi"))
        )
        .cast("long")
        .alias("sum_rank2_a"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_term"),
    )
    u2 = F.col("sum_rank2_a").cast("double") - (
        F.col("n1") * (F.col("n1") + 1)
    ).cast("double")
    num = u2 - (F.col("n1") * F.col("n2")).cast("double")
    var = (
        F.col("n1").cast("double") * F.col("n2").cast("double") / F.lit(12.0)
    ) * (
        (F.col("nn") + 1).cast("double")
        - (
            F.col("tie_term").cast("double")
            / (F.col("nn").cast("double") * (F.col("nn") - 1).cast("double"))
        )
    )
    z = num / (F.lit(2.0) * F.sqrt(var))
    return tot.crossJoin(F.broadcast(agg)).select(
        "n1",
        "n2",
        (F.floor((u2 / F.lit(2.0)) * 1e1 + 0.5) / 1e1).alias("u_stat"),
        (F.floor((z) * 1e4 + 0.5) / 1e4).alias("z_score"),
        (F.abs(z) > F.lit(1.96)).alias("significant_05"),
    )
