"""Binned range join: turning a keyless proximity join into an equi-join.

``q_join_range`` (joins.py) pairs events for the SAME user inside a
time band — the user key makes it a hash join with a range residual.
This operator handles the harder shape: proximity pairing with NO
shared key at all (any two events within a 2-minute band), which Spark
would otherwise execute as a broadcast nested-loop / cartesian filter —
O(n^2) comparisons, a non-starter at 100 TB.

The scale formulation is BUCKETING BY TIME: quantize time into
band-width bins, emit each left row under its own bin AND the next bin
(two probes cover every pair whose gap <= band width when the pair is
ordered b.ts >= a.ts), equi-join on the bin, then apply the exact band
predicate as a residual filter. Each pair is found exactly once — b's
single bin equals exactly one of a's two probe bins. Work becomes
O(pairs-per-bin), data-local, AQE-balanced; the explosion factor is a
constant 2 on one side.

The oracle states the SAME semantics as the naive theta join (DuckDB
runs it with its IEJoin), so the hash match proves the binned rewrite
is exactly the declarative range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

BAND_SECONDS = 120

_QBINNED_ORACLE = f"""
SELECT a.event_type AS first_type,
       b.event_type AS next_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM events a JOIN events b
  ON b.ts >= a.ts
 AND b.ts <= a.ts + INTERVAL {BAND_SECONDS} SECONDS
 AND a.event_id <> b.event_id
GROUP BY a.event_type, b.event_type
"""


@register(
    "q_join_range_binned",
    oracle=_QBINNED_ORACLE,
    description=(
        f"keyless proximity join via time-binning: event pairs within "
        f"{BAND_SECONDS}s across ALL users as a bin equi-join + residual "
        "filter (no cartesian)"
    ),
    tags=("join", "range", "binning", "scale"),
)
def q_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    binned = e.withColumn(
        "bin", (F.unix_timestamp("ts") / F.lit(BAND_SECONDS)).cast("long")
    )
    # Left side probes its own bin and the next one; right side sits in
    # exactly one bin, so each qualifying pair joins exactly once.
    a = binned.select(
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
        F.col("event_type").alias("first_type"),
        F.explode(F.array(F.col("bin"), F.col("bin") + 1)).alias("bin"),
    )
    b = binned.select(
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
        F.col("event_type").alias("next_type"),
        "bin",
    )
    pairs = a.join(b, "bin").where(
        (F.col("b_ts") >= F.col("a_ts"))
        & (
            F.col("b_ts")
            <= F.col("a_ts") + F.expr(f"INTERVAL {BAND_SECONDS} SECONDS")
        )
        & (F.col("a_id") != F.col("b_id"))
    )
    return pairs.groupBy("first_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
