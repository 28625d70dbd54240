"""Iterative graph analytics: PageRank over the part-supplier graph.

The second iterative algorithm next to connected components
(``dedup/clusters.py``), with a stronger verification story: a FIXED
number of power iterations is deterministic float math, so the DuckDB
oracle replays the exact same ten iterations as ten unrolled chained
CTEs (recursive CTEs can't aggregate per step; unrolling can). Both
engines compute sums of the same IEEE doubles — summation order can
differ in the last ulps, but after 10 iterations the accumulated
divergence is ~1e-13 relative, eleven orders of magnitude inside the
ROUND(,4) comparison the gate hashes. The classic unnormalized form is
used: ``rank' = (1-d) + d * sum(rank_in/outdeg_in)``, so ranks sum to
the node count (property-tested).

Graph: the bipartite observed (supplier, part) pairs from lineitem,
with both edge directions materialized — every node has outdegree >= 1,
so there is no dangling-mass term to redistribute.

Scale notes (100 TB): edges-with-outdegree is built once and persisted;
each iteration is one shuffle join on src plus one aggregate on dst —
the same per-round cost profile as connected components. Each
iteration's rank table is localCheckpoint-ed: without lineage
truncation, iteration i+1's plan embeds i's whole subtree and the tenth
iteration replays a 10-deep cascade (the PQ codebook lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

DAMPING = 0.85
N_ITERS = 10
_PART_OFFSET = 1_000_000  # part node ids, disjoint from supplier ids


def _pagerank_oracle() -> str:
    iters = []
    prev = "pr0"
    body = f"""
WITH pairs AS (
  SELECT DISTINCT l_suppkey AS s, l_partkey + {_PART_OFFSET} AS p FROM lineitem
),
edges AS (
  SELECT s AS src, p AS dst FROM pairs
  UNION ALL
  SELECT p AS src, s AS dst FROM pairs
),
outdeg AS (
  SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
),
nodes AS (
  SELECT DISTINCT src AS node FROM edges
),
pr0 AS (
  SELECT node, 1.0 AS rank FROM nodes
)"""
    for i in range(1, N_ITERS + 1):
        iters.append(f""",
pr{i} AS (
  SELECT n.node,
         {1 - DAMPING} + {DAMPING} * COALESCE(c.contrib, 0.0) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM({prev}.rank / d.deg) AS contrib
    FROM edges e
    JOIN {prev} ON e.src = {prev}.node
    JOIN outdeg d ON e.src = d.src
    GROUP BY e.dst
  ) c ON n.node = c.node
)""")
        prev = f"pr{i}"
    return (
        body
        + "".join(iters)
        + f"""
SELECT node, ROUND(rank, 4) AS rank FROM {prev}
"""
    )


@register(
    "q_graph_pagerank",
    oracle=_pagerank_oracle(),
    description=f"PageRank ({N_ITERS} power iterations, d={DAMPING}) on the part-supplier graph",
    tags=("graph", "pagerank", "iterative"),
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    pairs = (
        l.select(
            F.col("l_suppkey").alias("s"),
            (F.col("l_partkey") + _PART_OFFSET).alias("p"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("s").alias("src"), F.col("p").alias("dst"))
        .unionByName(pairs.select(F.col("p").alias("src"), F.col("s").alias("dst")))
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # src-side state reused every iteration: (src, dst, deg) persisted once.
    edges_deg = edges.join(outdeg, "src").persist()
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()

    ranks = nodes.withColumn("rank", F.lit(1.0)).localCheckpoint(eager=True)
    for _ in range(N_ITERS):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(1 - DAMPING)
                    + F.lit(DAMPING) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    edges_deg.unpersist()
    return ranks.select("node", F.round("rank", 4).alias("rank"))
