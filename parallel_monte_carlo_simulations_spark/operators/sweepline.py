"""Interval analytics: concurrency via the sweep-line pattern.

"How many sessions were active at once, and when was the peak?" is the
canonical interval-overlap question (capacity planning, rate limiting,
concurrency billing). The naive interval self-join is O(n^2); the
sweep line is one sort: emit +1 at each interval start and -1 at each
end, order by time, and the running sum IS the concurrency.

Intervals here are per-event sessions [ts, ts + 10 min) over the events
table (the same gap rule the sessionizer uses), merged per user first
so a user's own overlapping windows don't double-count: the merge is
itself a gaps-and-islands pass — a start strictly greater than the
running max of prior ends (per user) opens a new island.

Scale: both passes are window functions partitioned by user (parallel),
and the final global running sum operates on island boundaries only
(two rows per merged session). Peak-per-hour output keeps the result
bounded. All arithmetic is exact integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.microunit import rdiv_halfup_duck, rdiv_halfup_expr
from ..registry import register
from ..tables import table

#: Session half-open interval length: 10 minutes in microseconds.
SESSION_US = 600_000_000

_QSWEEP_ORACLE = f"""
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + {SESSION_US} AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              OR MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
merged AS (
  SELECT user_id, island, MIN(s) AS s, MAX(e) AS e
  FROM islands GROUP BY user_id, island
),
pts AS (
  SELECT s AS t, 1 AS delta FROM merged
  UNION ALL
  SELECT e AS t, -1 AS delta FROM merged
),
swept AS (
  SELECT t,
         SUM(delta) OVER (ORDER BY t, delta
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS concurrency
  FROM pts
)
SELECT CAST((t // 3600000000) AS BIGINT) AS hour_no,
       CAST(MAX(concurrency) AS BIGINT) AS peak_concurrency
FROM swept
GROUP BY (t // 3600000000)
ORDER BY hour_no
"""


@register(
    "q_interval_concurrency",
    oracle=_QSWEEP_ORACLE,
    description=(
        "sweep-line interval concurrency: per-user merged 10-min "
        "sessions -> +1/-1 events -> running-sum peak per hour (no "
        "interval self-join)"
    ),
    tags=("interval", "sweepline", "window", "timeseries", "analytics", "scale"),
)
def q_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("s"),
        (F.unix_micros(F.col("ts")) + SESSION_US).alias("e"),
    )
    w_prev = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, -1
    )
    flagged = iv.withColumn("max_e_before", F.max("e").over(w_prev)).select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("max_e_before").isNull()
            | (F.col("s") > F.col("max_e_before")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_island"),
    )
    w_run = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w_run))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    pts = merged.select(F.col("s").alias("t"), F.lit(1).alias("delta")).unionByName(
        merged.select(F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    # Global running sum over session boundaries — 2 points per merged
    # session, which still SCALES WITH THE CORPUS, so the sweep runs
    # through the range-bucketed kernel (round 11), not a
    # single-partition window: per-time-bucket delta totals give the
    # prefix offsets, each bucket walks its own points in parallel.
    from .rankstats import bucketed_running

    swept = bucketed_running(
        pts,
        axis="t",
        order=[F.col("t").asc(), F.col("delta").asc()],
        cums={"concurrency": F.col("delta")},
    )
    return (
        swept.groupBy(
            F.expr("t DIV 3600000000").alias("hour_no")
        )
        .agg(F.max("concurrency").alias("peak_concurrency"))
        .orderBy("hour_no")
    )


# --------------------------------------------------------------------------
# Interval-overlap JOIN: which session pairs (across users) overlap, and
# for how long — the pair-enumerating counterpart of the sweep line.
# --------------------------------------------------------------------------

#: hour buckets: an interval joins every bucket it touches, so a
#: candidate pair must share a bucket (sessions are <= 1h after merge
#: at this gap on this data; longer intervals just span more buckets).
_BUCKET_US = 3_600_000_000

_QIVJOIN_ORACLE = f"""
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + {SESSION_US} AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              OR MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
merged AS (
  SELECT user_id, island, MIN(s) AS s, MAX(e) AS e
  FROM islands GROUP BY user_id, island
),
binned AS (
  SELECT m.user_id, m.island, m.s, m.e, b.b AS bucket
  FROM merged m,
       LATERAL (SELECT unnest(range(m.s // {_BUCKET_US},
                                    (m.e - 1) // {_BUCKET_US} + 1)) AS b) b
),
pairs AS (
  SELECT DISTINCT a.user_id AS user_a, a.island AS island_a,
         b.user_id AS user_b, b.island AS island_b,
         GREATEST(a.s, b.s) AS os, LEAST(a.e, b.e) AS oe
  FROM binned a JOIN binned b
    ON a.bucket = b.bucket AND a.user_id < b.user_id
  WHERE a.s < b.e AND b.s < a.e
)
SELECT user_a, user_b,
       CAST(COUNT(*) AS BIGINT) AS n_overlapping_sessions,
       CAST(SUM(oe - os) AS BIGINT) AS total_overlap_us
FROM pairs
GROUP BY user_a, user_b
ORDER BY total_overlap_us DESC, user_a, user_b
LIMIT 20
"""


@register(
    "q_join_interval_overlap",
    oracle=_QIVJOIN_ORACLE,
    description=(
        "interval-overlap join: cross-user session pairs that overlap "
        "in time, via hour-bucket candidate join + exact residual — "
        "top pairs by total shared microseconds (no interval cross "
        "product)"
    ),
    tags=("interval", "join", "binning", "sweepline", "scale"),
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-interval join by bucketing: an interval registers in
    every hour bucket it touches, candidates must share a bucket, the
    exact overlap predicate filters residuals, and the canonical
    first-overlap-bucket filter collapses multi-bucket duplicates
    INSIDE the join stage (each pair's overlap start lies in exactly
    one bucket both sides registered — no DISTINCT re-shuffle of the
    expanded candidates). Work scales with overlap density x bucket
    count — never |sessions|^2."""
    e = table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("s"),
        (F.unix_micros(F.col("ts")) + SESSION_US).alias("e"),
    )
    w_prev = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_run = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = iv.withColumn("max_e_before", F.max("e").over(w_prev)).select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("max_e_before").isNull()
            | (F.col("s") > F.col("max_e_before")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_island"),
    )
    merged = (
        flagged.withColumn("island", F.sum("new_island").over(w_run))
        .groupBy("user_id", "island")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    binned = merged.select(
        "user_id",
        "island",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.expr(f"s DIV {_BUCKET_US}"),
                F.expr(f"(e - 1) DIV {_BUCKET_US}"),
            )
        ).alias("bucket"),
    )
    b = binned.select(
        F.col("user_id").alias("user_b"),
        F.col("island").alias("island_b"),
        F.col("s").alias("s_b"),
        F.col("e").alias("e_b"),
        F.col("bucket").alias("bucket_b"),
    )
    # Both sides are the session-scaling binned frame whose post-explode
    # static estimate is bogus-small — without hints the planner
    # broadcasts one side (round-8 registry audit; OOM at scale). Pin
    # sort-merge on the bucket equi-key.
    #
    # Multi-bucket dedup WITHOUT a distinct: two overlapping islands
    # co-occur in every bucket their overlap touches, but the overlap's
    # FIRST bucket — max(s, s_b) DIV bucket — is unique per pair, so
    # keeping only the join row whose bucket IS that first bucket emits
    # each pair exactly once. That turns the old corpus-pair DISTINCT
    # (a full shuffle of every expanded candidate row) into a scalar
    # filter inside the join stage — at sf1.0 the expanded candidate
    # term sum(c^2) is ~1.85e9 rows (SCALING.md), all of which the
    # distinct re-shuffled.
    #
    # The dense-bucket candidate quadratic is OUTPUT-BOUND, measured
    # (round-9): emitted true pairs are 24.6% of candidate join rows
    # at sf0.1 (2.26M of 9.20M) and 24.9% at sf1.0 (231M of 926M) — a
    # scale-INVARIANT ~4:1 ratio, so the per-bucket c^2 term tracks
    # the result set itself and no salting/sub-bucketing can shrink
    # it. Sub-bucket salting on (bucket, salt_a, salt_b) tiles stays
    # available on a real cluster purely to split a dense bucket's
    # pairs across tasks (straggler control) — it would not change
    # total work or semantics.
    pairs = (
        binned.hint("merge").join(
            b.hint("merge"),
            (F.col("bucket_b") == F.col("bucket"))
            & (F.col("user_id") < F.col("user_b")),
        )
        .where((F.col("s") < F.col("e_b")) & (F.col("s_b") < F.col("e")))
        .where(
            F.expr(f"greatest(s, s_b) DIV {_BUCKET_US}") == F.col("bucket")
        )
        .select(
            F.col("user_id").alias("user_a"),
            F.col("island").alias("island_a"),
            "user_b",
            "island_b",
            F.greatest(F.col("s"), F.col("s_b")).alias("os"),
            F.least(F.col("e"), F.col("e_b")).alias("oe"),
        )
    )
    return (
        pairs.groupBy("user_a", "user_b")
        .agg(
            F.count("*").alias("n_overlapping_sessions"),
            F.sum(F.col("oe") - F.col("os")).alias("total_overlap_us"),
        )
        .orderBy(F.desc("total_overlap_us"), "user_a", "user_b")
        .limit(20)
    )


_QIVDENSITY_ORACLE = f"""
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + {SESSION_US} AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              OR MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
merged AS (
  SELECT user_id, island, MIN(s) AS s, MAX(e) AS e
  FROM islands GROUP BY user_id, island
),
binned AS (
  SELECT m.user_id, m.island, m.s, m.e, b.b AS bucket
  FROM merged m,
       LATERAL (SELECT unnest(range(m.s // {_BUCKET_US},
                                    (m.e - 1) // {_BUCKET_US} + 1)) AS b) b
),
cand AS (
  SELECT a.s, a.e, b.s AS s_b, b.e AS e_b, a.bucket
  FROM binned a JOIN binned b
    ON a.bucket = b.bucket AND a.user_id < b.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS candidates,
       CAST(SUM(CASE WHEN s < e_b AND s_b < e THEN 1 ELSE 0 END) AS BIGINT)
         AS overlap_pass,
       CAST(SUM(CASE WHEN s < e_b AND s_b < e
                      AND GREATEST(s, s_b) // {_BUCKET_US} = bucket
                     THEN 1 ELSE 0 END) AS BIGINT) AS emitted_pairs,
       {rdiv_halfup_duck(
           f"SUM(CASE WHEN s < e_b AND s_b < e"
           f" AND GREATEST(s, s_b) // {_BUCKET_US} = bucket"
           f" THEN 1 ELSE 0 END)",
           "COUNT(*)", 4)}
         AS emitted_frac
FROM cand
"""


@register(
    "q_interval_overlap_density",
    oracle=_QIVDENSITY_ORACLE,
    description=(
        "work-vs-output density of the interval-overlap join: bucket "
        "candidate rows, exact-overlap survivors, and first-bucket "
        "emitted pairs — the emitted fraction is scale-invariant "
        "(~0.25 at sf0.1 AND the 10x tiled sf1.0), proving the dense-"
        "bucket quadratic is output-bound, not plan waste"
    ),
    tags=("interval", "join", "scale", "diagnostics"),
)
def q_interval_overlap_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 companion diagnostic to q_join_interval_overlap: the
    SCALING.md output-bound proof as a driver-verifiable query. Work
    (candidate rows) stays a constant ~4x of output (emitted pairs)
    across a 10x corpus growth, so salting could only redistribute —
    never reduce — the join's cost."""
    e = table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("s"),
        (F.unix_micros(F.col("ts")) + SESSION_US).alias("e"),
    )
    w_prev = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_run = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = iv.withColumn("max_e_before", F.max("e").over(w_prev)).select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("max_e_before").isNull()
            | (F.col("s") > F.col("max_e_before")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_island"),
    )
    merged = (
        flagged.withColumn("island", F.sum("new_island").over(w_run))
        .groupBy("user_id", "island")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    binned = merged.select(
        "user_id",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.expr(f"s DIV {_BUCKET_US}"),
                F.expr(f"(e - 1) DIV {_BUCKET_US}"),
            )
        ).alias("bucket"),
    )
    b = binned.select(
        F.col("user_id").alias("user_b"),
        F.col("s").alias("s_b"),
        F.col("e").alias("e_b"),
        F.col("bucket").alias("bucket_b"),
    )
    overlap = (F.col("s") < F.col("e_b")) & (F.col("s_b") < F.col("e"))
    first_bucket = (
        F.expr(f"greatest(s, s_b) DIV {_BUCKET_US}") == F.col("bucket")
    )
    return (
        binned.hint("merge")
        .join(
            b.hint("merge"),
            (F.col("bucket_b") == F.col("bucket"))
            & (F.col("user_id") < F.col("user_b")),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("candidates"),
            F.sum(F.when(overlap, 1).otherwise(0))
            .cast("long")
            .alias("overlap_pass"),
            F.sum(F.when(overlap & first_bucket, 1).otherwise(0))
            .cast("long")
            .alias("emitted_pairs"),
        )
        .select(
            "candidates",
            "overlap_pass",
            "emitted_pairs",
            rdiv_halfup_expr("emitted_pairs", "candidates", 4).alias(
                "emitted_frac"
            ),
        )
    )
