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

from ..functions.hashing import hash60_seeded, sql_hash60_seeded
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
