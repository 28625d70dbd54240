"""Distribution-drift monitors — per-segment KS and Wasserstein-1.

The data-quality shape every large ingest pipeline needs: "does this
source/segment's value distribution look like the rest of the corpus?"
Both monitors follow the integer-exact ECDF discipline of
``stattests.q_ks_two_sample``:

- ``q_ks_drift_by_type`` screens EVERY event type against the pooled
  distribution in one shot: rows are crossed with the (tiny) type
  dimension, and one value-sorted window per type partition carries the
  pair of running counts, so the KS numerator ``max |c_t·n − c_all·n_t|``
  stays integer. (Screening a segment against a pool that contains it is
  the standard conservative drift screen, not an independent two-sample
  test — the segment is positively correlated with the pool, so real
  drift is UNDER-stated; flagged rows are therefore high-confidence.)
  At scale the cross-with-types multiplies the sort by the number of
  monitored segments — per-segment partitions sort independently, so
  this parallelizes; monitor tens of segments, not thousands.
- ``q_wasserstein_two_sample`` integrates |ECDF₁ − ECDF₂| over the
  pooled walk (earth-mover's distance in one dimension): each step
  contributes ``|c₁·n₂ − c₂·n₁| · Δv``, with the integer KS numerator
  exact and the Δv product quantized to DECIMAL before the sum, so the
  integral is order-independent. W1 sees HOW FAR mass moved where KS
  only sees the worst single gap — the pair covers both drift styles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QKSDRIFT_ORACLE = """
WITH types AS (SELECT DISTINCT event_type AS et FROM events),
tot AS (
  SELECT event_type AS et, CAST(COUNT(*) AS BIGINT) AS nt
  FROM events GROUP BY event_type
),
alln AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
x AS (
  SELECT t.et, e.event_type, e.event_id, e.value
  FROM events e CROSS JOIN types t
),
walk AS (
  SELECT et,
         SUM(CASE WHEN event_type = et THEN 1 ELSE 0 END)
           OVER (PARTITION BY et ORDER BY value, event_id
                 ROWS UNBOUNDED PRECEDING) AS ct,
         SUM(1) OVER (PARTITION BY et ORDER BY value, event_id
                      ROWS UNBOUNDED PRECEDING) AS call
  FROM x
),
d AS (
  SELECT w.et,
         CAST(MAX(ABS((w.ct * a.n) - (w.call * t.nt))) AS BIGINT) AS d_num
  FROM walk w
  JOIN tot t ON t.et = w.et
  CROSS JOIN alln a
  GROUP BY w.et
)
SELECT d.et AS event_type, t.nt AS n_events, d.d_num,
       FLOOR((CAST(d.d_num AS DOUBLE)
             / (CAST(t.nt AS DOUBLE) * CAST(a.n AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS ks_d,
       FLOOR((1.358e0 * sqrt((CAST(t.nt AS DOUBLE) + CAST(a.n AS DOUBLE))
                            / (CAST(t.nt AS DOUBLE) * CAST(a.n AS DOUBLE)))) * 1e6 + 0.5) / 1e6
         AS ks_crit_05,
       (CAST(d.d_num AS DOUBLE)
        / (CAST(t.nt AS DOUBLE) * CAST(a.n AS DOUBLE)))
       > (1.358e0 * sqrt((CAST(t.nt AS DOUBLE) + CAST(a.n AS DOUBLE))
                         / (CAST(t.nt AS DOUBLE) * CAST(a.n AS DOUBLE))))
         AS drift_flag
FROM d JOIN tot t ON t.et = d.et CROSS JOIN alln a
ORDER BY d.et
"""


@register(
    "q_ks_drift_by_type",
    oracle=_QKSDRIFT_ORACLE,
    description=(
        "KS drift screen of every event type vs the pooled value "
        "distribution; integer-exact D numerators via per-type sorted "
        "window partitions"
    ),
    tags=("statistics", "drift", "ks-test", "data-quality", "window"),
)
def q_ks_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    types = ev.select(F.col("event_type").alias("et")).distinct()
    tot = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.count(F.lit(1)).cast("long").alias("nt")
    )
    alln = ev.agg(F.count(F.lit(1)).cast("long").alias("n"))
    x = ev.crossJoin(F.broadcast(types))
    w = (
        Window.partitionBy("et")
        .orderBy("value", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walk = x.select(
        "et",
        F.sum(F.when(F.col("event_type") == F.col("et"), 1).otherwise(0))
        .over(w)
        .alias("ct"),
        F.sum(F.lit(1)).over(w).alias("call"),
    )
    d = (
        walk.join(F.broadcast(tot), on="et")
        .crossJoin(F.broadcast(alln))
        .groupBy("et")
        .agg(
            F.max(
                F.abs((F.col("ct") * F.col("n")) - (F.col("call") * F.col("nt")))
            )
            .cast("long")
            .alias("d_num")
        )
    )
    ntd, nd = F.col("nt").cast("double"), F.col("n").cast("double")
    ks = F.col("d_num").cast("double") / (ntd * nd)
    crit = F.lit(1.358) * F.sqrt((ntd + nd) / (ntd * nd))
    return (
        d.join(F.broadcast(tot), on="et")
        .crossJoin(F.broadcast(alln))
        .select(
            F.col("et").alias("event_type"),
            F.col("nt").alias("n_events"),
            "d_num",
            (F.floor((ks) * 1e6 + 0.5) / 1e6).alias("ks_d"),
            (F.floor((crit) * 1e6 + 0.5) / 1e6).alias("ks_crit_05"),
            (ks > crit).alias("drift_flag"),
        )
        .orderBy("event_type")
    )


_QW1_ORACLE = """
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
  SELECT value,
         SUM(is_a) OVER (ORDER BY value, is_a, event_id
                         ROWS UNBOUNDED PRECEDING) AS c1,
         SUM(is_b) OVER (ORDER BY value, is_a, event_id
                         ROWS UNBOUNDED PRECEDING) AS c2,
         LEAD(value) OVER (ORDER BY value, is_a, event_id) AS nxt
  FROM pooled
),
terms AS (
  SELECT CAST(FLOOR((CAST(ABS((c1 * t.n2) - (c2 * t.n1)) AS DOUBLE) * (nxt - value)) * 1e8 + 0.5) / 1e8
         AS DECIMAL(28,8)) AS contrib
  FROM walk CROSS JOIN tot t
  WHERE nxt IS NOT NULL
)
SELECT t.n1 AS n_view, t.n2 AS n_purchase,
       FLOOR((CAST((SELECT SUM(contrib) FROM terms) AS DOUBLE)
             / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE))) * 1e6 + 0.5) / 1e6
         AS wasserstein_1
FROM tot t
"""


@register(
    "q_wasserstein_two_sample",
    oracle=_QW1_ORACLE,
    description=(
        "Wasserstein-1 (earth mover's) distance between view and purchase "
        "value distributions: |ECDF diff| integrated over the pooled walk, "
        "per-step products quantized to DECIMAL"
    ),
    tags=("statistics", "wasserstein", "drift", "window"),
)
def q_wasserstein_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle walks raw pooled rows, but every walk step INSIDE a
    tie group has nxt - value = 0 (contrib rounds to exactly 0), so only
    the LAST row of each distinct value contributes — with the group-end
    cumulative counts and the gap to the next DISTINCT value. The engine
    therefore integrates over the distinct-value frame: cumulative
    counts via the range-bucketed running-sum kernel (rankstats.py),
    next-value via a within-bucket lead stitched across buckets by the
    <= n_buckets-row per-bucket-min rollup. Identical terms, identical
    DECIMAL quantization, no global window."""
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
    from .rankstats import BUCKET_COL, bucketed_running

    cum = bucketed_running(
        byval,
        axis="value",
        order=[F.col("value").asc()],
        cums={"c1": F.col("ta"), "c2": F.col("tb")},
        keep_bucket=True,
    )
    # next distinct value: lead within the bucket, and for each bucket's
    # last row the MIN of the next non-empty bucket (a <= n_buckets-row
    # rollup; its lead window is bounded by construction).
    bmins = cum.groupBy(BUCKET_COL).agg(F.min("value").alias("bmin"))
    nxt_bucket = bmins.select(
        BUCKET_COL,
        F.lead("bmin").over(Window.orderBy(BUCKET_COL)).alias("next_bmin"),
    )
    wlead = Window.partitionBy(BUCKET_COL).orderBy("value")
    walk = (
        cum.join(F.broadcast(nxt_bucket), BUCKET_COL)
        .select(
            "value",
            "c1",
            "c2",
            F.coalesce(
                F.lead("value").over(wlead), F.col("next_bmin")
            ).alias("nxt"),
        )
    )
    contrib = (F.floor((F.abs((F.col("c1") * F.col("n2")) - (F.col("c2") * F.col("n1")))
        .cast("double")
        * (F.col("nxt") - F.col("value"))) * 1e8 + 0.5) / 1e8).cast("decimal(28,8)")
    terms = (
        walk.crossJoin(F.broadcast(tot))
        .where(F.col("nxt").isNotNull())
        .select(contrib.alias("contrib"))
    )
    s = terms.agg(F.sum("contrib").cast("double").alias("s"))
    return tot.crossJoin(F.broadcast(s)).select(
        F.col("n1").alias("n_view"),
        F.col("n2").alias("n_purchase"),
        (F.floor((F.col("s")
            / (F.col("n1").cast("double") * F.col("n2").cast("double"))) * 1e6 + 0.5) / 1e6).alias("wasserstein_1"),
    )


# --- Population Stability Index ---------------------------------------------
#
# The third standard drift lens after KS (worst gap) and W1 (mass
# moved): PSI bins the reference sample at its own exact deciles and
# measures sum((p_i - q_i) * ln(p_i / q_i)) over the bins — the banking/
# scoring industry's 0.1/0.2 alert thresholds. Decile edges come from
# the integer-scaled exact-percentile test (cum*10 >= k*n), duplicate
# edges collapse (tied deciles), Laplace-smoothed bin shares keep empty
# bins finite, and each PSI term is quantized to DECIMAL before the sum
# — the full determinism discipline, so the statistic oracles exactly.

_EDGE_KS = range(1, 10)

_PSI_EDGES_SQL = " UNION ALL ".join(
    f"SELECT MIN(CASE WHEN c * 10 >= {k} * n THEN value END) AS e FROM rcum"
    for k in _EDGE_KS
)

_QPSI_ORACLE = f"""
WITH ref AS (
  SELECT event_id, value FROM events WHERE event_type = 'view'
),
act AS (
  SELECT event_id, value FROM events WHERE event_type = 'purchase'
),
rcum AS (
  SELECT value,
         SUM(1) OVER (ORDER BY value, event_id ROWS UNBOUNDED PRECEDING) AS c,
         COUNT(*) OVER () AS n
  FROM ref
),
edges AS (SELECT DISTINCT e FROM ({_PSI_EDGES_SQL}) WHERE e IS NOT NULL),
nb AS (SELECT CAST(COUNT(*) + 1 AS BIGINT) AS b FROM edges),
rbin AS (
  SELECT 1 + SUM(CASE WHEN r.value > e.e THEN 1 ELSE 0 END) AS bin
  FROM ref r CROSS JOIN edges e GROUP BY r.event_id, r.value
),
abin AS (
  SELECT 1 + SUM(CASE WHEN a.value > e.e THEN 1 ELSE 0 END) AS bin
  FROM act a CROSS JOIN edges e GROUP BY a.event_id, a.value
),
spine AS (
  -- fixed 1..10 series filtered by b: DuckDB's generate_series cannot
  -- take a lateral column bound, and bins never exceed 10.
  SELECT CAST(gs.g AS BIGINT) AS bin
  FROM generate_series(1, 10) AS gs(g), nb WHERE gs.g <= nb.b
),
counts AS (
  SELECT s.bin,
         CAST(COALESCE(r.cr, 0) AS BIGINT) AS cr,
         CAST(COALESCE(a.ca, 0) AS BIGINT) AS ca
  FROM spine s
  LEFT JOIN (SELECT bin, COUNT(*) AS cr FROM rbin GROUP BY bin) r ON r.bin = s.bin
  LEFT JOIN (SELECT bin, COUNT(*) AS ca FROM abin GROUP BY bin) a ON a.bin = s.bin
),
tots AS (
  SELECT CAST((SELECT COUNT(*) FROM ref) AS BIGINT) AS nr,
         CAST((SELECT COUNT(*) FROM act) AS BIGINT) AS na,
         nb.b FROM nb
),
terms AS (
  SELECT CAST(FLOOR((((CAST(c.cr + 1 AS DOUBLE) / CAST(t.nr + t.b AS DOUBLE))
     - (CAST(c.ca + 1 AS DOUBLE) / CAST(t.na + t.b AS DOUBLE)))
    * ln((CAST(c.cr + 1 AS DOUBLE) / CAST(t.nr + t.b AS DOUBLE))
         / (CAST(c.ca + 1 AS DOUBLE) / CAST(t.na + t.b AS DOUBLE)))) * 1e8 + 0.5) / 1e8
    AS DECIMAL(20,8)) AS term
  FROM counts c CROSS JOIN tots t
)
SELECT t.nr AS n_reference, t.na AS n_actual, t.b AS n_bins,
       FLOOR((CAST((SELECT SUM(term) FROM terms) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS psi,
       CAST((SELECT SUM(term) FROM terms) AS DOUBLE) > 0.2e0 AS shift_alert
FROM tots t
"""


@register(
    "q_psi_drift",
    oracle=_QPSI_ORACLE,
    description=(
        "Population Stability Index of purchase vs view values over "
        "exact reference deciles; Laplace-smoothed, exact-decimal terms"
    ),
    tags=("statistics", "drift", "psi", "data-quality"),
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    ref = ev.where(F.col("event_type") == "view").select("event_id", "value")
    act = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "value"
    )
    # decile edges need, per distinct value v, the count of reference
    # rows <= v: the oracle's raw-row running count satisfies
    # "exists c in group with c*10 >= k*n" iff the group-end cumulative
    # does, so the distinct-value cumulative (range-bucketed kernel, no
    # global window) yields identical edges; n comes from a broadcast
    # scalar instead of a whole-frame window.
    from .rankstats import bucketed_running

    byval_r = ref.groupBy("value").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    nref = ref.agg(F.count(F.lit(1)).cast("long").alias("n"))
    rcum = bucketed_running(
        byval_r,
        axis="value",
        order=[F.col("value").asc()],
        cums={"c": F.col("cnt")},
    ).crossJoin(F.broadcast(nref))
    edges = None
    for k in _EDGE_KS:
        e_k = rcum.agg(
            F.min(
                F.when(F.col("c") * 10 >= k * F.col("n"), F.col("value"))
            ).alias("e")
        )
        edges = e_k if edges is None else edges.unionAll(e_k)
    edges = edges.where(F.col("e").isNotNull()).distinct()
    nb = edges.agg((F.count(F.lit(1)) + 1).cast("long").alias("b"))

    def bins(df: DataFrame) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(edges))
            .groupBy("event_id", "value")
            .agg(
                (
                    1
                    + F.sum(
                        F.when(F.col("value") > F.col("e"), 1).otherwise(0)
                    )
                ).alias("bin")
            )
        )

    rcnt = bins(ref).groupBy("bin").agg(F.count(F.lit(1)).alias("cr"))
    acnt = bins(act).groupBy("bin").agg(F.count(F.lit(1)).alias("ca"))
    spine = (
        nb.select(F.explode(F.sequence(F.lit(1), F.col("b"))).alias("bin"))
        .select(F.col("bin").cast("long").alias("bin"))
    )
    counts = (
        spine.join(rcnt, on="bin", how="left")
        .join(acnt, on="bin", how="left")
        .select(
            "bin",
            F.coalesce(F.col("cr"), F.lit(0)).cast("long").alias("cr"),
            F.coalesce(F.col("ca"), F.lit(0)).cast("long").alias("ca"),
        )
    )
    tots = (
        ref.agg(F.count(F.lit(1)).cast("long").alias("nr"))
        .crossJoin(act.agg(F.count(F.lit(1)).cast("long").alias("na")))
        .crossJoin(nb)
    )
    p = (F.col("cr") + 1).cast("double") / (F.col("nr") + F.col("b")).cast(
        "double"
    )
    q = (F.col("ca") + 1).cast("double") / (F.col("na") + F.col("b")).cast(
        "double"
    )
    terms = counts.crossJoin(F.broadcast(tots)).select(
        (F.floor(((p - q) * F.log(p / q)) * 1e8 + 0.5) / 1e8).cast("decimal(20,8)").alias("term")
    )
    s = terms.agg(F.sum("term").cast("double").alias("s"))
    return tots.crossJoin(F.broadcast(s)).select(
        F.col("nr").alias("n_reference"),
        F.col("na").alias("n_actual"),
        F.col("b").alias("n_bins"),
        (F.floor((F.col("s")) * 1e6 + 0.5) / 1e6).alias("psi"),
        (F.col("s") > F.lit(0.2)).alias("shift_alert"),
    )
