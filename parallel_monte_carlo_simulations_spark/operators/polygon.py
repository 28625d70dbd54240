"""Point-in-polygon containment via integer-exact ray casting.

The third workhorse spatial operation after proximity join and z-order
layout (``spatial.py``): classify points against region polygons —
geofencing, catchment analysis, territory rollups. Spark has no
geometry type; the relational reduction is

    point x polygon-edge (broadcast) -> crossing test -> parity

one broadcast nested loop against a tiny edge table, a codegen-side
integer predicate, and two hash aggregations. At 100 TB the point table
is the only big side and never shuffles more than the final rollup;
the edge table (a handful of polygons) broadcasts.

Exactness: the textbook crossing test ``px < x1 + (py-y1)(x2-x1)/
(y2-y1)`` divides — so instead both engines evaluate the
cross-multiplied form, sign-adjusted by the edge's y-direction:

    d = y2 - y1  (nonzero when the ray straddles the edge)
    d > 0:  (px - x1) * d < (py - y1) * (x2 - x1)
    d < 0:  (px - x1) * d > (py - y1) * (x2 - x1)

pure BIGINT products (coordinates are microdegrees < 2^21, products
< 2^42 — no overflow), no division, no floats anywhere. The half-open
``(y1 > py) != (y2 > py)`` straddle test resolves ray-through-vertex
consistently in both engines. Points are synthesized from c_custkey via
the portable md5 ``hash60`` (same generator as ``spatial.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .spatial import _LAT_SQL, _LON_SQL, _lat_col, _lon_col

#: Polygons in microdegree coordinates within the [0, 2e6)^2 point
#: window: a convex quad, a non-convex L, and a triangle.
POLYGONS: dict[str, list[tuple[int, int]]] = {
    "quad": [
        (200_000, 200_000),
        (1_800_000, 300_000),
        (1_700_000, 1_700_000),
        (300_000, 1_600_000),
    ],
    "ell": [
        (100_000, 100_000),
        (900_000, 100_000),
        (900_000, 900_000),
        (500_000, 900_000),
        (500_000, 1_500_000),
        (100_000, 1_500_000),
    ],
    "tri": [
        (1_200_000, 1_200_000),
        (1_900_000, 1_300_000),
        (1_500_000, 1_900_000),
    ],
}


def _edges() -> list[tuple[str, int, int, int, int]]:
    out = []
    for pid, verts in POLYGONS.items():
        for i, (x1, y1) in enumerate(verts):
            x2, y2 = verts[(i + 1) % len(verts)]
            out.append((pid, x1, y1, x2, y2))
    return out


_EDGE_VALUES = ", ".join(
    f"('{p}', {x1}, {y1}, {x2}, {y2})" for p, x1, y1, x2, y2 in _edges()
)

_QPIP_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey, c_nationkey,
         CAST({_LON_SQL} AS BIGINT) AS px,
         CAST({_LAT_SQL} AS BIGINT) AS py
  FROM customer
),
edges(polygon_id, x1, y1, x2, y2) AS (VALUES {_EDGE_VALUES}),
crossings AS (
  SELECT p.c_custkey, p.c_nationkey, e.polygon_id
  FROM pts p JOIN edges e
    ON (e.y1 > p.py) <> (e.y2 > p.py)
   AND CASE WHEN e.y2 - e.y1 > 0
            THEN (p.px - e.x1) * (e.y2 - e.y1)
                 < (p.py - e.y1) * (e.x2 - e.x1)
            ELSE (p.px - e.x1) * (e.y2 - e.y1)
                 > (p.py - e.y1) * (e.x2 - e.x1)
       END
),
parity AS (
  SELECT c_custkey, c_nationkey, polygon_id,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM crossings GROUP BY c_custkey, c_nationkey, polygon_id
)
SELECT polygon_id,
       c_nationkey AS nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_inside
FROM parity WHERE k % 2 = 1
GROUP BY polygon_id, nationkey
ORDER BY polygon_id, nationkey
"""


@register(
    "q_geo_point_in_polygon",
    oracle=_QPIP_ORACLE,
    description=(
        "point-in-polygon geofencing by integer-exact ray casting: "
        "broadcast the polygon edge table, cross-multiplied BIGINT "
        "crossing predicate (no division, no floats), odd-crossing "
        "parity per (point, polygon), rolled up per polygon x nation"
    ),
    tags=("spatial", "geo", "polygon", "join", "aggregation"),
)
def q_geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        "c_nationkey",
        _lon_col().cast("long").alias("px"),
        _lat_col().cast("long").alias("py"),
    )
    edges = spark.createDataFrame(
        _edges(), "polygon_id string, x1 long, y1 long, x2 long, y2 long"
    )

    d = F.col("y2") - F.col("y1")
    lhs = (F.col("px") - F.col("x1")) * d
    rhs = (F.col("py") - F.col("y1")) * (F.col("x2") - F.col("x1"))
    straddles = (F.col("y1") > F.col("py")) != (F.col("y2") > F.col("py"))
    crosses = F.when(d > 0, lhs < rhs).otherwise(lhs > rhs)

    crossings = pts.join(F.broadcast(edges), straddles & crosses)
    parity = crossings.groupBy(
        "c_custkey", "c_nationkey", "polygon_id"
    ).agg(F.count("*").cast("long").alias("k"))
    return (
        parity.filter(F.col("k") % 2 == 1)
        .groupBy("polygon_id", F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").cast("long").alias("n_inside"))
        .orderBy("polygon_id", "nationkey")
    )
