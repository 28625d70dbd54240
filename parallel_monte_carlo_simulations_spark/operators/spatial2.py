"""Spatial density clustering (round 10): DBSCAN classification and
full cluster labels.

Two registered queries over the customer point cloud:

- ``q_geo_dbscan_points``: CORE (>= MIN_PTS neighbors within eps) /
  BORDER (non-core with a core neighbor) / NOISE classification with
  per-point neighbor counts.
- ``q_geo_dbscan_clusters``: full DBSCAN — transitive core expansion
  via the verified hash-min connected-components kernel
  (dedup/clusters.py) over the core-core eps-graph, borders attached
  to their smallest core neighbor's cluster, noise labeled NULL.

eps is DENSITY-SCALED: ``eps = span * 0.9 / sqrt(n)`` keeps the
expected eps-neighborhood occupancy constant (~2.5 points) at every
corpus size — a fixed eps degenerates as the fixed-span cloud
densifies (measured: eps=100k microdeg makes 99% of sf0.01 points one
giant cluster, while yielding ZERO cores at sf0.001). The derived
cluster graphs stay shallow (min-label eccentricity 4/6/9 at
sf0.001/0.01/0.1, probed), comfortably inside the CC kernel's round
budget. Both engines compute eps from COUNT(*) with the identical
fixed-order float expression, so the integer threshold matches
exactly.

The expensive step — the eps-radius pair enumeration — is the
grid-bucketed 3x3 neighbor-cell equi-join of spatial.py (cell side =
eps), never an all-pairs theta join: hash-partitioned by cell id, pair
volume ~ n * occupancy, linear at any point count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import sql_hash60
from ..registry import register
from .spatial import SPAN_MICRO, _points

_MIN_PTS = 4

_LAT_HASH = sql_hash60("'lat:' || CAST(c_custkey AS VARCHAR)")
_LON_HASH = sql_hash60("'lon:' || CAST(c_custkey AS VARCHAR)")
_LAT_SQL = f"{_LAT_HASH} % {SPAN_MICRO}"
_LON_SQL = f"{_LON_HASH} % {SPAN_MICRO}"

#: eps = floor(span * 9 / (10 * sqrt(n))) — identical fixed-order
#: arithmetic on both engines (sqrt and division are IEEE-correctly
#: rounded, the product is exact).
_SQL_EPS = (
    f"(SELECT CAST(FLOOR({SPAN_MICRO} * 9.0 / (10.0 * SQRT(COUNT(*)))) "
    "AS BIGINT) AS eps FROM customer)"
)

_SQL_COMMON = f"""
pts AS (
  SELECT c_custkey AS pid, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer
),
epsv AS {_SQL_EPS},
nbr AS (
  SELECT a.pid AS pid, b.pid AS nbr
  FROM pts a CROSS JOIN epsv e JOIN pts b
    ON a.pid <> b.pid
   AND (a.lat - b.lat) * (a.lat - b.lat)
       + (a.lon - b.lon) * (a.lon - b.lon) <= e.eps * e.eps
),
counts AS (
  SELECT p.pid, COALESCE(c.n, 0) AS n_neighbors
  FROM pts p LEFT JOIN (
    SELECT pid, CAST(COUNT(*) AS BIGINT) AS n FROM nbr GROUP BY pid
  ) c USING (pid)
),
cores AS (SELECT pid FROM counts WHERE n_neighbors >= {_MIN_PTS})
"""

_QDBSCAN_ORACLE = f"""
WITH {_SQL_COMMON},
border AS (
  SELECT DISTINCT n.pid
  FROM nbr n JOIN cores c ON n.nbr = c.pid
  WHERE n.pid NOT IN (SELECT pid FROM cores)
)
SELECT ct.pid, CAST(ct.n_neighbors AS BIGINT) AS n_neighbors,
       CASE WHEN ct.n_neighbors >= {_MIN_PTS} THEN 'core'
            WHEN b.pid IS NOT NULL THEN 'border'
            ELSE 'noise' END AS kind
FROM counts ct LEFT JOIN border b USING (pid)
"""


def _dbscan_parts(spark: SparkSession, sf_dir: str):
    """Shared machinery: (counts, nbr) via the grid-bucketed pair join
    at the density-scaled eps."""
    pts = _points(spark, sf_dir)
    eps = pts.agg(
        F.floor(SPAN_MICRO * 9.0 / (10.0 * F.sqrt(F.count(F.lit(1)))))
        .cast("long")
        .alias("eps")
    )
    cells = pts.crossJoin(F.broadcast(eps)).select(
        "pid",
        "lat",
        "lon",
        "eps",
        F.expr("lat DIV eps").alias("cy"),
        F.expr("lon DIV eps").alias("cx"),
    )
    offsets = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(dx).cast("long").alias("dx"),
                    F.lit(dy).cast("long").alias("dy"),
                )
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    ).alias("o")
    a = cells.select("pid", "lat", "lon", "eps", "cx", "cy", offsets).select(
        F.col("pid").alias("pid_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        "eps",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = cells.select(
        F.col("pid").alias("pid_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    d2 = (F.col("lat_a") - F.col("lat_b")) * (
        F.col("lat_a") - F.col("lat_b")
    ) + (F.col("lon_a") - F.col("lon_b")) * (F.col("lon_a") - F.col("lon_b"))
    nbr = (
        a.hint("merge")
        .join(b.hint("merge"), ["jx", "jy"])
        .filter(
            (F.col("pid_a") != F.col("pid_b"))
            & (d2 <= F.col("eps") * F.col("eps"))
        )
        .select(F.col("pid_a").alias("pid"), F.col("pid_b").alias("nbr"))
    )
    counts = (
        pts.select("pid")
        .join(
            # per-point neighbor counts are corpus-sized post-explode:
            # the planner's static estimate would broadcast them (the
            # round-8 hazard class) — pin sort-merge.
            nbr.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).hint("merge"),
            "pid",
            "left",
        )
        .select(
            "pid",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_neighbors"),
        )
    )
    return counts, nbr


@register(
    "q_geo_dbscan_points",
    oracle=_QDBSCAN_ORACLE,
    description=(
        f"DBSCAN point classification (density-scaled eps = span*0.9/"
        f"sqrt(n), minPts={_MIN_PTS}): core / border / noise per "
        "customer point with its eps-neighbor count — grid-bucketed 3x3 "
        "cell equi-join for the radius count, never an all-pairs join"
    ),
    tags=("spatial", "clustering", "dbscan", "grid", "scale"),
)
def q_geo_dbscan_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts, nbr = _dbscan_parts(spark, sf_dir)
    cores = counts.filter(F.col("n_neighbors") >= _MIN_PTS).select("pid")
    non_core = counts.filter(F.col("n_neighbors") < _MIN_PTS).select("pid")
    border = (
        nbr.join(cores.withColumnRenamed("pid", "nbr").hint("merge"), "nbr")
        .select("pid")
        .join(non_core.hint("merge"), "pid", "semi")
        .distinct()
        .withColumn("is_border", F.lit(1))
    )
    return counts.join(border.hint("merge"), "pid", "left").select(
        "pid",
        "n_neighbors",
        F.when(F.col("n_neighbors") >= _MIN_PTS, "core")
        .when(F.col("is_border").isNotNull(), "border")
        .otherwise("noise")
        .alias("kind"),
    )


_QDBSCAN_FULL_ORACLE = f"""
WITH RECURSIVE {_SQL_COMMON},
core_edges AS (
  SELECT n.pid AS a, n.nbr AS b FROM nbr n
  JOIN cores c1 ON c1.pid = n.pid JOIN cores c2 ON c2.pid = n.nbr
),
reach(node, lbl) AS (
  SELECT pid, pid FROM cores
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN core_edges e ON r.node = e.a
),
core_labels AS (
  SELECT node AS pid, MIN(lbl) AS cluster_id FROM reach GROUP BY node
),
border_labels AS (
  SELECT n.pid, MIN(cl.cluster_id) AS cluster_id
  FROM nbr n JOIN core_labels cl ON cl.pid = n.nbr
  WHERE n.pid NOT IN (SELECT pid FROM cores)
  GROUP BY n.pid
)
SELECT ct.pid,
       CASE WHEN ct.n_neighbors >= {_MIN_PTS} THEN 'core'
            WHEN b.pid IS NOT NULL THEN 'border'
            ELSE 'noise' END AS kind,
       COALESCE(c.cluster_id, b.cluster_id) AS cluster_id
FROM counts ct
LEFT JOIN core_labels c USING (pid)
LEFT JOIN border_labels b ON b.pid = ct.pid
"""


@register(
    "q_geo_dbscan_clusters",
    oracle=_QDBSCAN_FULL_ORACLE,
    description=(
        "FULL DBSCAN: cluster labels via hash-min connected components "
        "over the core-core eps-graph (min-pid canonical labels), border "
        "points attached to their smallest core neighbor's cluster, "
        "noise labeled NULL — grid-bucketed candidates + the verified CC "
        "kernel; density-scaled eps keeps the cluster graphs shallow "
        "(min-label eccentricity <= 9 at every SF, probed), and the "
        "oracle replays clustering with a recursive CTE"
    ),
    tags=("spatial", "clustering", "dbscan", "graph", "iterative", "scale"),
)
def q_geo_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density clustering end-to-end: the candidate stage is the grid
    equi-join; the transitive core expansion reuses
    dedup.clusters.connected_components (hash-min, co-partitioned
    zero-exchange iterations) on the core-core edge list, so the
    iterative kernel is the one already verified for the MinHash
    cluster family."""
    from ..dedup.clusters import connected_components

    counts, nbr = _dbscan_parts(spark, sf_dir)
    cores = counts.filter(F.col("n_neighbors") >= _MIN_PTS).select("pid")
    core_edges = (
        nbr.join(cores.hint("merge"), "pid", "semi")
        .join(
            cores.withColumnRenamed("pid", "nbr").hint("merge"), "nbr", "semi"
        )
        .select(F.col("pid").alias("doc_a"), F.col("nbr").alias("doc_b"))
    )
    core_labels = connected_components(core_edges).select(
        F.col("doc_id").alias("pid"), "cluster_id"
    )
    # Isolated cores (no core neighbor) never enter the edge list: they
    # are their own singleton cluster, exactly as the oracle's
    # reach-from-cores recursion labels them.
    core_labels = cores.join(core_labels.hint("merge"), "pid", "left").select(
        "pid",
        F.coalesce(F.col("cluster_id"), F.col("pid")).alias("cluster_id"),
    )
    non_core = counts.filter(F.col("n_neighbors") < _MIN_PTS).select("pid")
    border_labels = (
        nbr.join(
            core_labels.withColumnRenamed("pid", "nbr").hint("merge"), "nbr"
        )
        .join(non_core.hint("merge"), "pid", "semi")
        .groupBy("pid")
        .agg(F.min("cluster_id").alias("b_cluster"))
    )
    return (
        counts.join(core_labels.hint("merge"), "pid", "left")
        .join(border_labels.hint("merge"), "pid", "left")
        .select(
            "pid",
            F.when(F.col("n_neighbors") >= _MIN_PTS, "core")
            .when(F.col("b_cluster").isNotNull(), "border")
            .otherwise("noise")
            .alias("kind"),
            F.coalesce(F.col("cluster_id"), F.col("b_cluster")).alias(
                "cluster_id"
            ),
        )
    )
