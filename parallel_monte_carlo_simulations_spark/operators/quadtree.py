"""Adaptive quadtree density aggregation over the derived point cloud.

The adaptive counterpart of the fixed-grid spatial family: cells split
into 4 children only where they are dense, so the output is a
variable-resolution density map (the tiling strategy of every map/viz
backend and of adaptive spatial partitioners like Sedona's KDB/quad
partitioning — dense regions get fine partitions, sparse regions stay
coarse, bounding per-task work at 100 TB).

Relational formulation (no recursion needed for a bounded depth): the
counts of every depth-1/2/3 cell are three groupBys; a point's leaf is
the SHALLOWEST cell on its path whose count <= T (or the depth-3 cell).
Because a child's count never exceeds its parent's, this top-down stop
rule is exactly the quadtree split rule. The split threshold is
data-derived (T = n_total // 16, floored at 1) so the tree adapts at
every scale factor. All arithmetic is integer — counts, cell ids
((coord * 2^d) // SPAN), and the threshold compare — so the oracle is
bit-exact.

Scale: 3 groupBys on integer cell keys plus two broadcast-sized lookup
joins (cell-count tables are bounded by 4 + 16 + 64 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .spatial import SPAN_MICRO, _POINTS_SQL, _points

MAX_DEPTH = 3

_QQUAD_ORACLE = f"""
WITH pts AS ({_POINTS_SQL}),
tot AS (
  SELECT CASE WHEN CAST(COUNT(*) AS BIGINT) // 16 < 1 THEN 1
              ELSE CAST(COUNT(*) AS BIGINT) // 16 END AS t
  FROM pts
),
paths AS (
  SELECT pid,
         (lon * 2) // {SPAN_MICRO} AS x1, (lat * 2) // {SPAN_MICRO} AS y1,
         (lon * 4) // {SPAN_MICRO} AS x2, (lat * 4) // {SPAN_MICRO} AS y2,
         (lon * 8) // {SPAN_MICRO} AS x3, (lat * 8) // {SPAN_MICRO} AS y3
  FROM pts
),
c1 AS (SELECT x1, y1, CAST(COUNT(*) AS BIGINT) AS n1 FROM paths GROUP BY x1, y1),
c2 AS (SELECT x2, y2, CAST(COUNT(*) AS BIGINT) AS n2 FROM paths GROUP BY x2, y2),
c3 AS (SELECT x3, y3, CAST(COUNT(*) AS BIGINT) AS n3 FROM paths GROUP BY x3, y3),
leaves AS (
  SELECT p.pid,
         CASE WHEN c1.n1 <= tot.t THEN 1
              WHEN c2.n2 <= tot.t THEN 2
              ELSE 3 END AS depth,
         CASE WHEN c1.n1 <= tot.t THEN p.x1
              WHEN c2.n2 <= tot.t THEN p.x2
              ELSE p.x3 END AS cx,
         CASE WHEN c1.n1 <= tot.t THEN p.y1
              WHEN c2.n2 <= tot.t THEN p.y2
              ELSE p.y3 END AS cy
  FROM paths p
  JOIN c1 ON p.x1 = c1.x1 AND p.y1 = c1.y1
  JOIN c2 ON p.x2 = c2.x2 AND p.y2 = c2.y2
  CROSS JOIN tot
)
SELECT depth, cx, cy,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       MIN(pid) AS min_pid
FROM leaves
GROUP BY depth, cx, cy
ORDER BY depth, cx, cy
"""


@register(
    "q_geo_quadtree_density",
    oracle=_QQUAD_ORACLE,
    description=(
        "adaptive quadtree density map (depth <= 3, data-derived split "
        "threshold n//16): dense cells refine, sparse cells stay coarse "
        "— bounded-depth relational quadtree, exact integer cells"
    ),
    tags=("spatial", "quadtree", "adaptive", "aggregate", "scale"),
)
def q_geo_quadtree_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    tot = pts.agg(
        F.greatest(F.lit(1), F.expr("COUNT(*) DIV 16")).alias("t")
    )
    paths = pts.select(
        "pid",
        F.expr(f"(lon * 2) DIV {SPAN_MICRO}").alias("x1"),
        F.expr(f"(lat * 2) DIV {SPAN_MICRO}").alias("y1"),
        F.expr(f"(lon * 4) DIV {SPAN_MICRO}").alias("x2"),
        F.expr(f"(lat * 4) DIV {SPAN_MICRO}").alias("y2"),
        F.expr(f"(lon * 8) DIV {SPAN_MICRO}").alias("x3"),
        F.expr(f"(lat * 8) DIV {SPAN_MICRO}").alias("y3"),
    )
    c1 = paths.groupBy("x1", "y1").agg(F.count("*").alias("n1"))
    c2 = paths.groupBy("x2", "y2").agg(F.count("*").alias("n2"))
    leaves = (
        paths.join(F.broadcast(c1), ["x1", "y1"])
        .join(F.broadcast(c2), ["x2", "y2"])
        .crossJoin(F.broadcast(tot))
        .select(
            "pid",
            F.when(F.col("n1") <= F.col("t"), F.lit(1))
            .when(F.col("n2") <= F.col("t"), F.lit(2))
            .otherwise(F.lit(3))
            .alias("depth"),
            F.when(F.col("n1") <= F.col("t"), F.col("x1"))
            .when(F.col("n2") <= F.col("t"), F.col("x2"))
            .otherwise(F.col("x3"))
            .alias("cx"),
            F.when(F.col("n1") <= F.col("t"), F.col("y1"))
            .when(F.col("n2") <= F.col("t"), F.col("y2"))
            .otherwise(F.col("y3"))
            .alias("cy"),
        )
    )
    return (
        leaves.groupBy("depth", "cx", "cy")
        .agg(F.count("*").alias("n_points"), F.min("pid").alias("min_pid"))
        .orderBy("depth", "cx", "cy")
    )
