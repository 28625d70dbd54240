"""Graph profiling, round-10 addition: degree distribution histogram.

The one-scan companion to the iterative graph family (pagerank, k-core,
triangles): the degree histogram in power-of-two buckets with tail
shares — the first thing anyone computes on a new graph, and the
skew diagnostic that decides whether the iterative algorithms need
salting. Buckets use exact integer edge comparisons (not
floor(log2(.)) — see dedup/containment.py's df report for why), so
both engines agree exactly. Same supplier-part bipartite projection
the rest of the graph family uses (operators/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_EDGES = (
    "SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem"
)

_DEG_EDGES = (128, 64, 32, 16, 8, 4, 2, 1)
_SQL_BUCKET = (
    "CASE "
    + " ".join(f"WHEN deg >= {e} THEN {e}" for e in _DEG_EDGES)
    + " END"
)

_QDEGREE_ORACLE = f"""
WITH pairs AS ({_EDGES}),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT s AS node FROM pairs
    UNION ALL
    SELECT p + 1000000 AS node FROM pairs
  ) GROUP BY node
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(deg) AS BIGINT) AS n_halfedges
  FROM deg
)
SELECT {_SQL_BUCKET}                          AS deg_bucket_lo,
       CAST(COUNT(*) AS BIGINT)               AS n_nodes,
       CAST(SUM(deg) AS BIGINT)               AS halfedges,
       ROUND(COUNT(*) * 1.0 / ANY_VALUE(t.n_nodes), 6)  AS node_share,
       ROUND(SUM(deg) * 1.0 / ANY_VALUE(t.n_halfedges), 6) AS edge_share
FROM deg CROSS JOIN tot t
GROUP BY 1
"""


@register(
    "q_graph_degree_histogram",
    oracle=_QDEGREE_ORACLE,
    description=(
        "degree-distribution histogram of the supplier-part bipartite "
        "graph in power-of-two buckets, with per-bucket node and "
        "half-edge shares — the skew diagnostic that decides whether "
        "iterative graph queries need salting; one scan, one groupBy"
    ),
    tags=("graph", "profiling", "histogram", "aggregate", "scale"),
)
def q_graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    nodes = pairs.select(F.col("s").alias("node")).unionAll(
        pairs.select((F.col("p") + 1_000_000).alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    tot = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("deg").cast("long").alias("n_halfedges"),
    )
    return (
        deg.crossJoin(F.broadcast(tot))
        .groupBy(F.expr(_SQL_BUCKET).alias("deg_bucket_lo"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("deg").cast("long").alias("halfedges"),
            F.round(
                F.count(F.lit(1)) * 1.0 / F.any_value("n_nodes"), 6
            ).alias("node_share"),
            F.round(
                F.sum("deg") * 1.0 / F.any_value("n_halfedges"), 6
            ).alias("edge_share"),
        )
    )
