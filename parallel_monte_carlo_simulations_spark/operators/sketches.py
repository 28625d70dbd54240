"""Count-min sketch — bounded-memory frequency estimation, exact replay.

The streaming/heavy-hitter companion to the Bloom filter in
:mod:`.bloom`: a D×W counter grid where cell ``(i, h_i(key) mod W)``
accumulates every occurrence, and a key's estimate is the MIN over its D
cells — never an undercount, overcounts only from collisions. The grid
is **constant-size state** (D·W = 4096 cells here) no matter how many
events flow through, it merges cell-wise (associative — streaming /
``foreachBatch`` friendly), and building it is one partial-aggregated
``groupBy`` whose shuffle carries at most D·W rows per mapper. Reading
estimates joins the sketch as a broadcast dictionary.

Spark/DuckDB both build the grid from the md5-derived seeded hash family
(``functions.hashing``), so the sketch — and therefore every estimate
and overcount — is bit-identical across engines: the oracle is exact,
not statistical.

Query: sketch ``user_id`` occurrences in ``events``, estimate every
distinct user's count, report the top 20 by estimate with the exact
count and the collision overcount alongside. (At 100 TB you would probe
candidate keys from a sampled prefilter instead of every key; probing
all keys here doubles as a "no undercount" proof over the whole domain.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60, hash60_seeded, sql_hash60, sql_hash60_seeded
from ..registry import register
from ..tables import table

CMS_DEPTH = 4
CMS_WIDTH = 1024
TOP_N = 20

_CELLS_SQL = " UNION ALL ".join(
    f"SELECT {i} AS row_i, "
    f"{sql_hash60_seeded('CAST(user_id AS VARCHAR)', i)} % {CMS_WIDTH} AS pos "
    "FROM events"
    for i in range(CMS_DEPTH)
)

_PROBE_CELLS_SQL = " UNION ALL ".join(
    f"SELECT user_id, {i} AS row_i, "
    f"{sql_hash60_seeded('CAST(user_id AS VARCHAR)', i)} % {CMS_WIDTH} AS pos "
    "FROM users"
    for i in range(CMS_DEPTH)
)

_CMS_ORACLE = f"""
WITH sketch AS (
  SELECT row_i, pos, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ({_CELLS_SQL}) GROUP BY row_i, pos
),
users AS (SELECT DISTINCT user_id FROM events),
probe AS ({_PROBE_CELLS_SQL}),
est AS (
  SELECT p.user_id, MIN(s.cnt) AS est
  FROM probe p JOIN sketch s ON s.row_i = p.row_i AND s.pos = p.pos
  GROUP BY p.user_id
),
exact AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM events GROUP BY user_id
)
SELECT e.user_id, e.est, x.exact_cnt, e.est - x.exact_cnt AS overcount
FROM est e JOIN exact x ON x.user_id = e.user_id
ORDER BY e.est DESC, e.user_id
LIMIT {TOP_N}
"""


def _cells(key_col):
    """Array of (row_i, pos) structs for a string key column."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                (hash60_seeded(key_col, i) % CMS_WIDTH).alias("pos"),
            )
            for i in range(CMS_DEPTH)
        ]
    )


def build_sketch(ev: DataFrame) -> DataFrame:
    """CMS grid from an events frame with a ``key_s`` string key column.

    One partial-aggregated groupBy -> at most D*W rows shuffle. The grid
    merges cell-wise: building per micro-batch and summing (see
    ``streaming/sketchstream.py``) yields the identical sketch."""
    return (
        ev.select(F.explode(_cells(F.col("key_s"))).alias("c"))
        .select("c.row_i", "c.pos")
        .groupBy("row_i", "pos")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def estimates_top_n(spark: SparkSession, sf_dir: str, sketch: DataFrame) -> DataFrame:
    """Top-N estimated counts from a (possibly merged) CMS grid, with the
    exact count and overcount alongside — shared by the batch and
    streaming variants so both hit the same DuckDB oracle."""
    ev = table(spark, sf_dir, "events").select(
        F.col("user_id"), F.col("user_id").cast("string").alias("key_s")
    )
    users = ev.select("user_id", "key_s").distinct()
    probe = users.select(
        "user_id", F.explode(_cells(F.col("key_s"))).alias("c")
    ).select("user_id", "c.row_i", "c.pos")

    est = (
        probe.join(F.broadcast(sketch), on=["row_i", "pos"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("est"))
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    )
    return (
        est.join(exact, on="user_id")
        .select(
            "user_id",
            "est",
            "exact_cnt",
            (F.col("est") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy(F.col("est").desc(), "user_id")
        .limit(TOP_N)
    )


@register(
    "q_cms_heavy_hitters",
    oracle=_CMS_ORACLE,
    description=(
        "count-min sketch (4x1024, md5 hash family) over event user_ids; "
        "top-20 users by estimated count with exact count and overcount"
    ),
    tags=("sketch", "count-min", "heavy-hitters", "streaming", "scale"),
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("key_s")
    )
    return estimates_top_n(spark, sf_dir, build_sketch(ev))


# --- Portable HyperLogLog ---------------------------------------------------
#
# Spark's approx_count_distinct and DuckDB's approx_count_distinct use
# engine-private register layouts, which is why q_approx_count_distinct
# is a rows-only check. This HLL is built from the portable md5 hash
# instead, so BOTH engines materialize the identical 256-register sketch
# and the estimate — and the union-merge proof — oracle exactly.
#
# Exactness engineering: the harmonic denominator Σ 2^-M_j is a sum of
# dyadic rationals spanning up to 2^53 in magnitude — order-sensitive in
# doubles — so it is summed as the exact INTEGER Σ 2^(53 - M_j) (M_j <=
# 53, 256 registers: max 256·2^53 < 2^63) and only the final
# alpha·m²·2^53 / S division runs in doubles, with identical
# association in both engines. Register max-merge is idempotent, so the
# two-shard merge must reproduce the global registers bit-for-bit —
# emitted as an executable proof column, the same merge law a
# 1000-executor rollup or a streaming foreachBatch accumulation relies
# on.

HLL_REGS = 256  # b = 8 index bits of the 60-bit hash
_W_MASK = (1 << 52) - 1  # remaining 52 bits

_HLL_RHO_SQL = "CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END"


def _sql_hll_est(s: str, v: str) -> str:
    """DuckDB fragment: HLL estimate from register sums ``s``/``v`` —
    raw alpha·m²·2^53/s with the linear-counting small-range branch."""
    raw = (
        "((0.7213e0 / (1.0e0 + (1.079e0 / 256.0e0))) * 65536.0e0)"
        f" * 9007199254740992.0e0 / CAST({s} AS DOUBLE)"
    )
    return (
        f"CASE WHEN ({raw}) <= (2.5e0 * 256.0e0) AND {v} > 0 "
        f"THEN 256.0e0 * ln(256.0e0 / CAST({v} AS DOUBLE)) "
        f"ELSE {raw} END"
    )


_HLL_EST_SQL = (
    "((0.7213e0 / (1.0e0 + (1.079e0 / 256.0e0))) * 65536.0e0)"
    " * 9007199254740992.0e0 / CAST(s AS DOUBLE)"
)


def _hll_estimate(s_col, v_col):
    """Spark column: same estimate, same association as ``_sql_hll_est``."""
    alpha_m2 = (
        F.lit(0.7213) / (F.lit(1.0) + (F.lit(1.079) / F.lit(256.0)))
    ) * F.lit(65536.0)
    est_raw = alpha_m2 * F.lit(9007199254740992.0) / s_col.cast("double")
    return F.when(
        (est_raw <= F.lit(2.5) * F.lit(256.0)) & (v_col > 0),
        F.lit(256.0) * F.log(F.lit(256.0) / v_col.cast("double")),
    ).otherwise(est_raw)

_HLL_ORACLE = f"""
WITH hashed AS (
  SELECT user_id % 2 AS half,
         {sql_hash60("CAST(user_id AS VARCHAR)")} AS h
  FROM events
),
parts AS (
  SELECT half, (h >> 52) AS reg, (h & {_W_MASK}) AS w FROM hashed
),
rhos AS (SELECT half, reg, {_HLL_RHO_SQL} AS rho FROM parts),
regs AS (SELECT reg, MAX(rho) AS mx FROM rhos GROUP BY reg),
allr AS (
  SELECT gs.g AS reg, COALESCE(r.mx, 0) AS m
  FROM generate_series(0, {HLL_REGS - 1}) AS gs(g)
  LEFT JOIN regs r ON r.reg = gs.g
),
s1 AS (
  SELECT CAST(SUM(CAST(1 AS BIGINT) << (53 - m)) AS BIGINT) AS s,
         CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM allr
),
halves AS (SELECT half, reg, MAX(rho) AS mx FROM rhos GROUP BY half, reg),
merged AS (SELECT reg, MAX(mx) AS mx FROM halves GROUP BY reg),
allr2 AS (
  SELECT gs.g AS reg, COALESCE(r.mx, 0) AS m
  FROM generate_series(0, {HLL_REGS - 1}) AS gs(g)
  LEFT JOIN merged r ON r.reg = gs.g
),
s2 AS (
  SELECT CAST(SUM(CAST(1 AS BIGINT) << (53 - m)) AS BIGINT) AS s,
         CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM allr2
),
exact AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact FROM events),
est AS (
  SELECT s1.s, s1.v,
         CASE WHEN ({_HLL_EST_SQL}) <= (2.5e0 * 256.0e0) AND s1.v > 0
              THEN 256.0e0 * ln(256.0e0 / CAST(s1.v AS DOUBLE))
              ELSE {_HLL_EST_SQL} END AS e
  FROM s1
)
SELECT x.n_exact,
       FLOOR((e.e) * 1e4 + 0.5) / 1e4 AS hll_estimate,
       FLOOR((((e.e - CAST(x.n_exact AS DOUBLE)) / CAST(x.n_exact AS DOUBLE))
             * 100.0e0) * 1e4 + 0.5) / 1e4 AS rel_err_pct,
       e.v AS n_zero_registers,
       (s2.s = e.s AND s2.v = e.v) AS merge_equal
FROM est e CROSS JOIN s2 CROSS JOIN exact x
"""


def _hll_sums(spark: SparkSession, regs: DataFrame) -> DataFrame:
    """(s, v) from a (reg, mx) register frame, zero-filling empties."""
    allr = (
        spark.range(HLL_REGS)
        .select(F.col("id").alias("reg"))
        .join(regs, on="reg", how="left")
        .select(F.coalesce(F.col("mx"), F.lit(0)).alias("m"))
    )
    return allr.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - m)"))
        .cast("long")
        .alias("s"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).cast("long").alias("v"),
    )


@register(
    "q_hll_portable",
    oracle=_HLL_ORACLE,
    description=(
        "portable HyperLogLog (256 registers from the md5 hash, exact "
        "integer harmonic sum): estimate vs exact distinct users, plus an "
        "executable two-shard register-merge proof"
    ),
    tags=("sketch", "hll", "approx-distinct", "merge", "scale"),
)
def q_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id")
    h = hash60(F.col("user_id").cast("string"))
    parts = ev.select(
        (F.col("user_id") % 2).alias("half"),
        F.shiftright(h, 52).alias("reg"),
        h.bitwiseAND(F.lit(_W_MASK)).alias("w"),
    )
    rho = F.when(F.col("w") == 0, 53).otherwise(
        53 - F.length(F.bin(F.col("w")))
    )
    rhos = parts.select("half", "reg", rho.alias("rho"))

    regs = rhos.groupBy("reg").agg(F.max("rho").alias("mx"))
    s1 = _hll_sums(spark, regs)

    halves = rhos.groupBy("half", "reg").agg(F.max("rho").alias("mx"))
    merged = halves.groupBy("reg").agg(F.max("mx").alias("mx"))
    s2 = _hll_sums(spark, merged).select(
        F.col("s").alias("s2"), F.col("v").alias("v2")
    )

    exact = ev.agg(F.countDistinct("user_id").cast("long").alias("n_exact"))

    e = _hll_estimate(F.col("s"), F.col("v"))

    return (
        s1.crossJoin(F.broadcast(s2))
        .crossJoin(F.broadcast(exact))
        .select(
            "n_exact",
            (F.floor((e) * 1e4 + 0.5) / 1e4).alias("hll_estimate"),
            (F.floor(((
                    (e - F.col("n_exact").cast("double"))
                    / F.col("n_exact").cast("double")
                )
                * 100.0) * 1e4 + 0.5) / 1e4).alias("rel_err_pct"),
            F.col("v").alias("n_zero_registers"),
            ((F.col("s2") == F.col("s")) & (F.col("v2") == F.col("v"))).alias(
                "merge_equal"
            ),
        )
    )


# --- DDSketch-style log-binned quantiles ------------------------------------
#
# The portable twin of approx_percentile (rows-only for the same reason
# as HLL: engine-private sketch state). Values map to log-scale buckets
# derived ENTIRELY from integer bit arithmetic — bucket = (bitlen(v), 3
# mantissa bits), i.e. 8 LINEAR sub-buckets per octave (HDR-histogram
# style; sub-bucket j spans 1/(8+j) of its lower bound, worst-case
# 12.5%, so lower-bound estimates land within [-1/9, 0] of exact) — and
# both engines build the identical bucket histogram: no log(), no float
# binning. The sketch is
# counts-per-bucket: constant-size (≤ 8·64 buckets), mergeable by
# addition, one partial-aggregated groupBy to build. Quantiles read the
# cumulative bucket counts with the same integer-scaled threshold test
# as operators/weighted_stats (never a float fraction), and the exact
# percentiles are computed alongside so the output shows the sketch's
# actual relative error per quantile.

_DDS_ORACLE = """
WITH cents AS (
  SELECT l_returnflag AS rf, l_orderkey, l_linenumber,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v
  FROM lineitem
),
bl AS (SELECT rf, l_orderkey, l_linenumber, v, length(bin(v)) AS blen FROM cents),
bk AS (
  SELECT rf,
         (blen * 8) + ((v >> (blen - 4)) & 7) AS bucket,
         CAST(8 + ((v >> (blen - 4)) & 7) AS BIGINT) << (blen - 4) AS lb
  FROM bl WHERE blen >= 4
),
counts AS (
  SELECT rf, bucket, MIN(lb) AS lb, CAST(COUNT(*) AS BIGINT) AS c
  FROM bk GROUP BY rf, bucket
),
tot AS (SELECT rf, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY rf),
cum AS (
  SELECT counts.rf, bucket, lb,
         SUM(c) OVER (PARTITION BY counts.rf ORDER BY bucket
                      ROWS UNBOUNDED PRECEDING) AS cum,
         n
  FROM counts JOIN tot ON tot.rf = counts.rf
),
est AS (
  SELECT rf,
         MIN(CASE WHEN cum * 2 >= n THEN lb END) AS e50,
         MIN(CASE WHEN cum * 10 >= 9 * n THEN lb END) AS e90,
         MIN(CASE WHEN cum * 100 >= 99 * n THEN lb END) AS e99
  FROM cum GROUP BY rf
),
vcum AS (
  SELECT rf, v,
         SUM(1) OVER (PARTITION BY rf ORDER BY v, l_orderkey, l_linenumber
                      ROWS UNBOUNDED PRECEDING) AS cumv,
         COUNT(*) OVER (PARTITION BY rf) AS n
  FROM bl
),
ex AS (
  SELECT rf,
         MIN(CASE WHEN cumv * 2 >= n THEN v END) AS x50,
         MIN(CASE WHEN cumv * 10 >= 9 * n THEN v END) AS x90,
         MIN(CASE WHEN cumv * 100 >= 99 * n THEN v END) AS x99
  FROM vcum GROUP BY rf
)
SELECT e.rf AS l_returnflag, t.n AS n_rows,
       FLOOR((e.e50 / 100.0e0) * 1e2 + 0.5) / 1e2 AS p50_est, FLOOR((x.x50 / 100.0e0) * 1e2 + 0.5) / 1e2 AS p50_exact,
       FLOOR((e.e90 / 100.0e0) * 1e2 + 0.5) / 1e2 AS p90_est, FLOOR((x.x90 / 100.0e0) * 1e2 + 0.5) / 1e2 AS p90_exact,
       FLOOR((e.e99 / 100.0e0) * 1e2 + 0.5) / 1e2 AS p99_est, FLOOR((x.x99 / 100.0e0) * 1e2 + 0.5) / 1e2 AS p99_exact,
       FLOOR((((CAST(e.e50 AS DOUBLE) - CAST(x.x50 AS DOUBLE))
              / CAST(x.x50 AS DOUBLE)) * 100.0e0) * 1e4 + 0.5) / 1e4 AS re50_pct,
       FLOOR((((CAST(e.e90 AS DOUBLE) - CAST(x.x90 AS DOUBLE))
              / CAST(x.x90 AS DOUBLE)) * 100.0e0) * 1e4 + 0.5) / 1e4 AS re90_pct,
       FLOOR((((CAST(e.e99 AS DOUBLE) - CAST(x.x99 AS DOUBLE))
              / CAST(x.x99 AS DOUBLE)) * 100.0e0) * 1e4 + 0.5) / 1e4 AS re99_pct
FROM est e
JOIN ex x ON x.rf = e.rf
JOIN tot t ON t.rf = e.rf
ORDER BY e.rf
"""


@register(
    "q_ddsketch_percentiles",
    oracle=_DDS_ORACLE,
    description=(
        "DDSketch-style log-binned quantile sketch (8 sub-buckets/octave, "
        "pure integer bit math): p50/p90/p99 of price per return flag vs "
        "exact, with per-quantile relative error"
    ),
    tags=("sketch", "quantile", "ddsketch", "percentile", "scale"),
)
def q_ddsketch_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    cents = li.select(
        F.col("l_returnflag").alias("rf"),
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("v"),
    )
    bl = cents.withColumn("blen", F.length(F.bin(F.col("v"))))
    bk = bl.where(F.col("blen") >= 4).select(
        "rf",
        F.expr("(blen * 8) + (shiftright(v, blen - 4) & 7)").alias("bucket"),
        F.expr(
            "shiftleft(CAST(8 + (shiftright(v, blen - 4) & 7) AS BIGINT), blen - 4)"
        ).alias("lb"),
    )
    counts = bk.groupBy("rf", "bucket").agg(
        F.min("lb").alias("lb"), F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = counts.groupBy("rf").agg(F.sum("c").cast("long").alias("n"))
    wcum = (
        Window.partitionBy("rf")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.join(tot, on="rf").select(
        "rf", "bucket", "lb", F.sum("c").over(wcum).alias("cum"), "n"
    )
    est = cum.groupBy("rf").agg(
        F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("lb"))).alias("e50"),
        F.min(F.when(F.col("cum") * 10 >= 9 * F.col("n"), F.col("lb"))).alias("e90"),
        F.min(F.when(F.col("cum") * 100 >= 99 * F.col("n"), F.col("lb"))).alias("e99"),
    )
    wv = (
        Window.partitionBy("rf")
        .orderBy("v", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vcum = bl.select(
        "rf",
        "v",
        F.sum(F.lit(1)).over(wv).alias("cumv"),
        F.count(F.lit(1)).over(Window.partitionBy("rf")).alias("nn"),
    )
    ex = vcum.groupBy("rf").agg(
        F.min(F.when(F.col("cumv") * 2 >= F.col("nn"), F.col("v"))).alias("x50"),
        F.min(F.when(F.col("cumv") * 10 >= 9 * F.col("nn"), F.col("v"))).alias("x90"),
        F.min(F.when(F.col("cumv") * 100 >= 99 * F.col("nn"), F.col("v"))).alias("x99"),
    )

    def _re(e, x):
        return (F.floor((((e.cast("double") - x.cast("double")) / x.cast("double")) * 100.0) * 1e4 + 0.5) / 1e4)

    return (
        est.join(ex, on="rf")
        .join(tot, on="rf")
        .select(
            F.col("rf").alias("l_returnflag"),
            F.col("n").alias("n_rows"),
            (F.floor((F.col("e50") / 100.0) * 1e2 + 0.5) / 1e2).alias("p50_est"),
            (F.floor((F.col("x50") / 100.0) * 1e2 + 0.5) / 1e2).alias("p50_exact"),
            (F.floor((F.col("e90") / 100.0) * 1e2 + 0.5) / 1e2).alias("p90_est"),
            (F.floor((F.col("x90") / 100.0) * 1e2 + 0.5) / 1e2).alias("p90_exact"),
            (F.floor((F.col("e99") / 100.0) * 1e2 + 0.5) / 1e2).alias("p99_est"),
            (F.floor((F.col("x99") / 100.0) * 1e2 + 0.5) / 1e2).alias("p99_exact"),
            _re(F.col("e50"), F.col("x50")).alias("re50_pct"),
            _re(F.col("e90"), F.col("x90")).alias("re90_pct"),
            _re(F.col("e99"), F.col("x99")).alias("re99_pct"),
        )
        .orderBy("l_returnflag")
    )


# --- HLL set algebra: intersection by inclusion-exclusion -------------------
#
# Register max-merge computes the UNION sketch exactly (max over the
# union of streams = elementwise max of the two sketches), so
# |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B) without ever co-shuffling the
# two sets — the sketch-algebra answer to "how many users both viewed
# and purchased" when A and B live in different 100 TB partitions. The
# estimate error compounds (three estimates), which is exactly what the
# emitted exact-vs-estimate columns quantify.

_HLL_SETOP_ORACLE = f"""
WITH hashed AS (
  SELECT event_type,
         user_id,
         {sql_hash60("CAST(user_id AS VARCHAR)")} AS h
  FROM events WHERE event_type IN ('view', 'purchase')
),
rhos AS (
  SELECT event_type, (h >> 52) AS reg,
         {_HLL_RHO_SQL.replace("w", f"(h & {_W_MASK})")} AS rho
  FROM hashed
),
ra AS (SELECT reg, MAX(rho) AS mx FROM rhos WHERE event_type = 'view' GROUP BY reg),
rb AS (SELECT reg, MAX(rho) AS mx FROM rhos WHERE event_type = 'purchase' GROUP BY reg),
ru AS (SELECT reg, MAX(rho) AS mx FROM rhos GROUP BY reg),
sa AS (
  SELECT CAST(SUM(CAST(1 AS BIGINT) << (53 - COALESCE(r.mx, 0))) AS BIGINT) AS s,
         CAST(SUM(CASE WHEN COALESCE(r.mx, 0) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM generate_series(0, {HLL_REGS - 1}) AS gs(g) LEFT JOIN ra r ON r.reg = gs.g
),
sb AS (
  SELECT CAST(SUM(CAST(1 AS BIGINT) << (53 - COALESCE(r.mx, 0))) AS BIGINT) AS s,
         CAST(SUM(CASE WHEN COALESCE(r.mx, 0) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM generate_series(0, {HLL_REGS - 1}) AS gs(g) LEFT JOIN rb r ON r.reg = gs.g
),
su AS (
  SELECT CAST(SUM(CAST(1 AS BIGINT) << (53 - COALESCE(r.mx, 0))) AS BIGINT) AS s,
         CAST(SUM(CASE WHEN COALESCE(r.mx, 0) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM generate_series(0, {HLL_REGS - 1}) AS gs(g) LEFT JOIN ru r ON r.reg = gs.g
),
exact AS (
  SELECT CAST(COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS BIGINT) AS xa,
         CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS BIGINT) AS xb,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS xu
  FROM hashed
),
xint AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS xi FROM (
    SELECT user_id FROM hashed WHERE event_type = 'view'
    INTERSECT
    SELECT user_id FROM hashed WHERE event_type = 'purchase'
  )
)
SELECT x.xa AS exact_view, x.xb AS exact_purchase, xi.xi AS exact_inter,
       FLOOR(({_sql_hll_est("sa.s", "sa.v")}) * 1e4 + 0.5) / 1e4 AS est_view,
       FLOOR(({_sql_hll_est("sb.s", "sb.v")}) * 1e4 + 0.5) / 1e4 AS est_purchase,
       FLOOR((({_sql_hll_est("sa.s", "sa.v")} + {_sql_hll_est("sb.s", "sb.v")})
             - {_sql_hll_est("su.s", "su.v")}) * 1e4 + 0.5) / 1e4 AS est_inter
FROM sa CROSS JOIN sb CROSS JOIN su CROSS JOIN exact x CROSS JOIN xint xi
"""


@register(
    "q_hll_set_intersection",
    oracle=_HLL_SETOP_ORACLE,
    description=(
        "HLL set algebra: |view ∩ purchase| users by inclusion-exclusion "
        "over max-merged portable sketches, vs the exact intersection"
    ),
    tags=("sketch", "hll", "set-algebra", "intersection", "scale"),
)
def q_hll_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .select("event_type", "user_id")
    )
    h = hash60(F.col("user_id").cast("string"))
    w = h.bitwiseAND(F.lit(_W_MASK))
    rhos = ev.select(
        "event_type",
        "user_id",
        F.shiftright(h, 52).alias("reg"),
        F.when(w == 0, 53).otherwise(53 - F.length(F.bin(w))).alias("rho"),
    )
    ra = rhos.where(F.col("event_type") == "view").groupBy("reg").agg(
        F.max("rho").alias("mx")
    )
    rb = rhos.where(F.col("event_type") == "purchase").groupBy("reg").agg(
        F.max("rho").alias("mx")
    )
    ru = rhos.groupBy("reg").agg(F.max("rho").alias("mx"))
    sa = _hll_sums(spark, ra).select(F.col("s").alias("sa"), F.col("v").alias("va"))
    sb = _hll_sums(spark, rb).select(F.col("s").alias("sb"), F.col("v").alias("vb"))
    su = _hll_sums(spark, ru).select(F.col("s").alias("su"), F.col("v").alias("vu"))

    va = rhos.where(F.col("event_type") == "view").select("user_id").distinct()
    vb = rhos.where(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = (
        rhos.agg(
            F.countDistinct(
                F.when(F.col("event_type") == "view", F.col("user_id"))
            )
            .cast("long")
            .alias("exact_view"),
            F.countDistinct(
                F.when(F.col("event_type") == "purchase", F.col("user_id"))
            )
            .cast("long")
            .alias("exact_purchase"),
        )
    )
    xint = va.intersect(vb).agg(
        F.count(F.lit(1)).cast("long").alias("exact_inter")
    )

    ea = _hll_estimate(F.col("sa"), F.col("va"))
    eb = _hll_estimate(F.col("sb"), F.col("vb"))
    eu = _hll_estimate(F.col("su"), F.col("vu"))
    return (
        sa.crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(su))
        .crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(xint))
        .select(
            "exact_view",
            "exact_purchase",
            "exact_inter",
            (F.floor((ea) * 1e4 + 0.5) / 1e4).alias("est_view"),
            (F.floor((eb) * 1e4 + 0.5) / 1e4).alias("est_purchase"),
            (F.floor(((ea + eb) - eu) * 1e4 + 0.5) / 1e4).alias("est_inter"),
        )
    )
