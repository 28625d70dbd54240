"""Markov chain over user event sequences: transition matrix +
stationary distribution by exact-replay power iteration.

The behavioral-analytics workhorse: what state does the event process
spend its time in? Per-user event streams (ordered by ts, event_id
tie-break) yield exact integer transition counts; row-normalizing gives
the transition matrix P; ten power iterations from the uniform vector
give the stationary distribution pi = pi P.

Verification follows the PageRank discipline (``operators/graph.py``):
a FIXED iteration count is deterministic float math — both engines
compute sums of the same IEEE doubles over the same tiny state space,
so cross-engine divergence is last-ulps against the FLOOR(() * 1e4 + 0.5) / 1e4 gate.
The DuckDB oracle unrolls the ten iterations as chained CTEs.

Scale: the corpus-wide work is ONE window pass per user partition (the
lag) and one groupBy — the transition matrix is |states|^2 rows no
matter how many events, and the iteration runs entirely on that tiny
frame (checkpointed per 2 rounds per the textrank.py lesson: tiny
state -> lineage cut is free and collapses plan depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

N_ITERS = 10


def _markov_oracle() -> str:
    body = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
trans AS (
  SELECT event_type AS a, nxt AS b, COUNT(*) AS c
  FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt
),
rowtot AS (SELECT a, SUM(c) AS tot FROM trans GROUP BY a),
p AS (
  SELECT t.a, t.b, t.c * 1.0 / r.tot AS p
  FROM trans t JOIN rowtot r ON t.a = r.a
),
states AS (SELECT DISTINCT a AS s FROM trans),
nstates AS (SELECT COUNT(*) AS n FROM states),
pi0 AS (SELECT s, 1.0 / n AS pi FROM states, nstates)"""
    prev = "pi0"
    parts = []
    for i in range(1, N_ITERS + 1):
        parts.append(f""",
pi{i} AS (
  SELECT p.b AS s, SUM({prev}.pi * p.p) AS pi
  FROM p JOIN {prev} ON p.a = {prev}.s
  GROUP BY p.b
)""")
        prev = f"pi{i}"
    return (
        body
        + "".join(parts)
        + f"""
SELECT st.s AS event_type,
       FLOOR((COALESCE(pi.pi, 0)) * 1e4 + 0.5) / 1e4 AS stationary,
       CAST(r.tot AS BIGINT) AS n_transitions
FROM states st
LEFT JOIN {prev} pi ON pi.s = st.s
JOIN rowtot r ON r.a = st.s
ORDER BY st.s
"""
    )


@register(
    "q_markov_stationary",
    oracle=_markov_oracle(),
    description=(
        f"event-type Markov chain: exact per-user transition counts -> "
        f"row-normalized matrix -> stationary distribution by "
        f"{N_ITERS} exact-replay power iterations (state is "
        "|states|^2 regardless of event count)"
    ),
    tags=("timeseries", "markov", "iterative", "analytics", "window"),
)
def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("a"), F.col("nxt").alias("b")
    ).agg(F.count("*").alias("c"))
    rowtot = trans.groupBy("a").agg(F.sum("c").alias("tot"))
    p = (
        trans.join(rowtot, "a")
        .select("a", "b", (F.col("c") / F.col("tot")).alias("p"))
        .localCheckpoint(eager=True)
    )
    states = p.select(F.col("a").alias("s")).distinct().localCheckpoint(
        eager=True
    )
    n = states.agg(F.count("*").alias("n"))
    pi = states.join(F.broadcast(n)).select(
        "s", (F.lit(1.0) / F.col("n")).alias("pi")
    )
    for i in range(N_ITERS):
        pi = (
            p.join(pi, p.a == pi.s)
            .groupBy(F.col("b").alias("s2"))
            .agg(F.sum(F.col("pi") * F.col("p")).alias("pi"))
            .select(F.col("s2").alias("s"), "pi")
        )
        if (i + 1) % 2 == 0 and i < N_ITERS - 1:
            pi = pi.localCheckpoint(eager=True)
    return (
        states.join(pi, "s", "left")
        .join(rowtot, states.s == rowtot.a)
        .select(
            F.col("s").alias("event_type"),
            (F.floor((F.coalesce("pi", F.lit(0.0))) * 1e4 + 0.5) / 1e4).alias("stationary"),
            F.col("tot").cast("long").alias("n_transitions"),
        )
        .orderBy("event_type")
    )
