"""Spatial clustering, round-10 addition: DBSCAN point classification.

The density-clustering primitive the geo family was missing: classify
every point as CORE (>= MIN_PTS neighbors within eps), BORDER
(non-core with a core neighbor), or NOISE. The expensive step — the
eps-radius neighbor count — reuses the grid-bucketed self-join shape
of ``q_geo_grid_proximity_join`` (spatial.py): a 3x3 neighbor-cell
equi-join with an exact integer residual, never an all-pairs theta
join, so the plan is hash-partitioned by cell id and survives any
point count. All arithmetic is integer microdegrees; both engines
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import sql_hash60
from ..registry import register
from .spatial import SPAN_MICRO, _points

#: DBSCAN radius / grid cell (cell >= eps for 3x3 completeness) and
#: the core threshold (neighbors within eps, EXCLUDING the point).
_EPS_MICRO = 100_000
_CELL = 100_000
_MIN_PTS = 4

_LAT_HASH = sql_hash60("'lat:' || CAST(c_custkey AS VARCHAR)")
_LON_HASH = sql_hash60("'lon:' || CAST(c_custkey AS VARCHAR)")
_LAT_SQL = f"{_LAT_HASH} % {SPAN_MICRO}"
_LON_SQL = f"{_LON_HASH} % {SPAN_MICRO}"

_QDBSCAN_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS pid, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer
),
cells AS (
  SELECT pid, lat, lon, lat // {_CELL} AS cy, lon // {_CELL} AS cx FROM pts
),
offsets AS (
  SELECT dx, dy
  FROM (VALUES (-1), (0), (1)) AS ox(dx)
  CROSS JOIN (VALUES (-1), (0), (1)) AS oy(dy)
),
nbr AS (
  SELECT a.pid AS pid, b.pid AS nbr
  FROM cells a
  CROSS JOIN offsets o
  JOIN cells b
    ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
   AND a.pid <> b.pid
  WHERE (a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon)
        <= {_EPS_MICRO * _EPS_MICRO}
),
counts AS (
  SELECT p.pid, COALESCE(c.n, 0) AS n_neighbors
  FROM pts p LEFT JOIN (
    SELECT pid, CAST(COUNT(*) AS BIGINT) AS n FROM nbr GROUP BY pid
  ) c USING (pid)
),
cores AS (SELECT pid FROM counts WHERE n_neighbors >= {_MIN_PTS}),
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


@register(
    "q_geo_dbscan_points",
    oracle=_QDBSCAN_ORACLE,
    description=(
        f"DBSCAN point classification (eps={_EPS_MICRO} microdeg, "
        f"minPts={_MIN_PTS}): core / border / noise per customer point "
        "with its eps-neighbor count — grid-bucketed 3x3 cell equi-join "
        "for the radius count, never an all-pairs join"
    ),
    tags=("spatial", "clustering", "dbscan", "grid", "scale"),
)
def q_geo_dbscan_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two bounded passes over the pair frame: neighbor counts (core
    election), then a semi-join of pairs against cores (border
    election). Pair multiplicity is bounded by density * eps^2, so the
    shuffles stay proportional to true neighbor counts at any scale."""
    pts = _points(spark, sf_dir)
    cells = pts.select(
        "pid",
        "lat",
        "lon",
        F.expr(f"lat DIV {_CELL}").alias("cy"),
        F.expr(f"lon DIV {_CELL}").alias("cx"),
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
    a = cells.select("pid", "lat", "lon", "cx", "cy", offsets).select(
        F.col("pid").alias("pid_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
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
        a.hint("merge").join(b.hint("merge"), ["jx", "jy"])
        .filter(
            (F.col("pid_a") != F.col("pid_b"))
            & (d2 <= _EPS_MICRO * _EPS_MICRO)
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
            "pid", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_neighbors")
        )
    )
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
