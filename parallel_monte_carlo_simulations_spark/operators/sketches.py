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
_HLL_EST_SQL = (
    "((0.7213e0 / (1.0e0 + (1.079e0 / 256.0e0))) * 65536.0e0)"
    " * 9007199254740992.0e0 / CAST(s AS DOUBLE)"
)

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
       ROUND(e.e, 4) AS hll_estimate,
       ROUND(((e.e - CAST(x.n_exact AS DOUBLE)) / CAST(x.n_exact AS DOUBLE))
             * 100.0e0, 4) AS rel_err_pct,
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

    alpha_m2 = (
        F.lit(0.7213) / (F.lit(1.0) + (F.lit(1.079) / F.lit(256.0)))
    ) * F.lit(65536.0)
    est_raw = alpha_m2 * F.lit(9007199254740992.0) / F.col("s").cast("double")
    e = F.when(
        (est_raw <= F.lit(2.5) * F.lit(256.0)) & (F.col("v") > 0),
        F.lit(256.0) * F.log(F.lit(256.0) / F.col("v").cast("double")),
    ).otherwise(est_raw)

    return (
        s1.crossJoin(F.broadcast(s2))
        .crossJoin(F.broadcast(exact))
        .select(
            "n_exact",
            F.round(e, 4).alias("hll_estimate"),
            F.round(
                (
                    (e - F.col("n_exact").cast("double"))
                    / F.col("n_exact").cast("double")
                )
                * 100.0,
                4,
            ).alias("rel_err_pct"),
            F.col("v").alias("n_zero_registers"),
            ((F.col("s2") == F.col("s")) & (F.col("v2") == F.col("v"))).alias(
                "merge_equal"
            ),
        )
    )
