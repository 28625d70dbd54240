"""Spatial operators: grid-bucketed proximity join and Z-order geohash.

Spark has no native spatial type, but the two workhorse spatial
operations of a warehouse — radius self-join ("all pairs of points
within distance r") and geohash cell aggregation — reduce to integer
arithmetic plus one equi-join, which is exactly the shape that scales:

- **Grid proximity join**: quantize each point to a grid cell with side
  >= r; a qualifying pair can only live in the same cell or one of the 8
  neighbours, so exploding one side by the 9 (dx, dy) offsets turns the
  radius join into a plain equi-join on cell id. No cartesian product,
  no theta join — shuffle is proportional to 9x one side. At 100 TB the
  cell id is the shuffle key; skewed hot cells (cities) fall out to AQE
  skew-join handling, and the residual exact-distance filter runs
  codegen-side on integers.
- **Z-order geohash**: bit-interleave of the two quantized axes. Points
  close in space are close in z, so sorting/partitioning by z gives
  range-prunable storage layout (the same trick Delta/Iceberg OPTIMIZE
  ZORDER uses). The interleave is pure bit arithmetic — identical in
  Spark and DuckDB, so the oracle is exact.

The tables carry no lat/lon, so coordinates are derived
deterministically from ``c_custkey`` via the portable md5-based
:func:`~..functions.hashing.hash60` (reference has no spatial surface;
this extends SURVEY.md §2.B's join family per the LLM-pipeline mandate).
All arithmetic is integer microdegrees — both engines agree bit-for-bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60, sql_hash60
from ..registry import register
from ..tables import table

#: Points live in a 2.0 x 2.0 degree window, microdegree-quantized.
SPAN_MICRO = 2_000_000
#: Proximity radius r = 0.03 degrees (~3.3 km at the equator).
RADIUS_MICRO = 30_000
#: Grid cell side — must be >= RADIUS_MICRO for 3x3 neighbourhood
#: completeness.
CELL_MICRO = 30_000

_LAT_HASH = sql_hash60("'lat:' || CAST(c_custkey AS VARCHAR)")
_LON_HASH = sql_hash60("'lon:' || CAST(c_custkey AS VARCHAR)")
_LAT_SQL = f"{_LAT_HASH} % {SPAN_MICRO}"
_LON_SQL = f"{_LON_HASH} % {SPAN_MICRO}"


def _lat_col() -> Column:
    return hash60(F.concat(F.lit("lat:"), F.col("c_custkey").cast("string"))) % SPAN_MICRO


def _lon_col() -> Column:
    return hash60(F.concat(F.lit("lon:"), F.col("c_custkey").cast("string"))) % SPAN_MICRO


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic point cloud: one (lat, lon) per customer, integer
    microdegrees in [0, SPAN_MICRO). hash60 is non-negative so ``%`` is
    the same operation in both engines."""
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("pid"),
        _lat_col().alias("lat"),
        _lon_col().alias("lon"),
    )


_POINTS_SQL = f"""
SELECT c_custkey AS pid,
       {_LAT_SQL} AS lat,
       {_LON_SQL} AS lon
FROM customer
"""


_QGRID_ORACLE = f"""
WITH pts AS ({_POINTS_SQL}),
cells AS (
  SELECT pid, lat, lon,
         lat // {CELL_MICRO} AS cy,
         lon // {CELL_MICRO} AS cx
  FROM pts
),
offsets AS (
  SELECT dx, dy
  FROM (VALUES (-1), (0), (1)) AS ox(dx)
  CROSS JOIN (VALUES (-1), (0), (1)) AS oy(dy)
),
pairs AS (
  SELECT a.pid AS pid_a, b.pid AS pid_b,
         (a.lat - b.lat) * (a.lat - b.lat)
           + (a.lon - b.lon) * (a.lon - b.lon) AS dist_sq
  FROM cells a
  CROSS JOIN offsets o
  JOIN cells b
    ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
   AND a.pid < b.pid
  WHERE (a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon)
        <= {RADIUS_MICRO} * {RADIUS_MICRO}
)
SELECT pid_a, pid_b, dist_sq
FROM pairs
ORDER BY pid_a, pid_b
"""


@register(
    "q_geo_grid_proximity_join",
    oracle=_QGRID_ORACLE,
    description=(
        "spatial radius self-join via grid bucketing: all customer-point "
        "pairs within 0.03 deg, 3x3 neighbourhood equi-join on cell id + "
        "exact integer residual filter (no cartesian/theta join)"
    ),
    tags=("spatial", "join", "grid", "proximity", "scale"),
)
def q_geo_grid_proximity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within RADIUS_MICRO, as a cell-id equi-join.

    One side is exploded by the 9 neighbour offsets; the join is a plain
    equi-join on (cx, cy), so Catalyst plans a hash join keyed on the
    cell — never a cartesian. Each qualifying pair is produced exactly
    once because the un-exploded side occupies exactly one cell. The
    residual distance test is integer arithmetic inside codegen.
    """
    pts = _points(spark, sf_dir)
    cells = pts.select(
        "pid",
        "lat",
        "lon",
        F.expr(f"lat DIV {CELL_MICRO}").alias("cy"),
        F.expr(f"lon DIV {CELL_MICRO}").alias("cx"),
    )
    # 9-offset neighbourhood explode: a literal array of structs, not a
    # crossJoin — stays a single Generate inside codegen, no join node.
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
    )
    a = cells.select("*", offsets.alias("o")).select(
        "pid", "lat", "lon", "cx", "cy", F.col("o.dx").alias("dx"), F.col("o.dy").alias("dy")
    ).select(
        F.col("pid").alias("pid_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        (F.col("cx") + F.col("dx")).alias("jx"),
        (F.col("cy") + F.col("dy")).alias("jy"),
    )
    b = cells.select(
        F.col("pid").alias("pid_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dist_sq = (F.col("lat_a") - F.col("lat_b")) * (
        F.col("lat_a") - F.col("lat_b")
    ) + (F.col("lon_a") - F.col("lon_b")) * (F.col("lon_a") - F.col("lon_b"))
    # Both sides scale with the point table and the exploded side's
    # static size estimate is bogus-small (the 9x Generate is invisible
    # to Catalyst), so without hints the planner broadcasts it — at
    # 100 TB a guaranteed OOM (round-8 registry audit). Pin the
    # spill-safe sort-merge on the cell equi-key.
    return (
        a.hint("merge").join(b.hint("merge"), on=["jx", "jy"])
        .where(F.col("pid_a") < F.col("pid_b"))
        .where(dist_sq <= RADIUS_MICRO * RADIUS_MICRO)
        .select("pid_a", "pid_b", dist_sq.alias("dist_sq"))
        .orderBy("pid_a", "pid_b")
    )


#: Z-order resolution: 8 bits per axis -> 16-bit z value, 256x256 cells.
Z_BITS = 8


def _axis_bucket_expr(col: str) -> str:
    """Quantize a microdegree axis to [0, 2^Z_BITS): ``(v * 256) //
    (SPAN+1)`` — integer floor division, identical in both engines for
    non-negative operands."""
    return f"({col} * {1 << Z_BITS}) // {SPAN_MICRO + 1}"


def _zorder_col(x: Column, y: Column) -> Column:
    """Bit-interleave two Z_BITS-wide non-negative ints: even bits from
    x, odd bits from y."""
    parts = []
    for k in range(Z_BITS):
        parts.append(F.shiftleft(F.shiftrightunsigned(x, k).bitwiseAND(1), 2 * k))
        parts.append(
            F.shiftleft(F.shiftrightunsigned(y, k).bitwiseAND(1), 2 * k + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def _zorder_sql(x: str, y: str) -> str:
    parts = []
    for k in range(Z_BITS):
        parts.append(f"((({x} >> {k}) & 1) << {2 * k})")
        parts.append(f"((({y} >> {k}) & 1) << {2 * k + 1})")
    return " | ".join(parts)


_QZCELL_ORACLE = f"""
WITH pts AS ({_POINTS_SQL}),
zb AS (
  SELECT pid,
         {_axis_bucket_expr('lon')} AS bx,
         {_axis_bucket_expr('lat')} AS by
  FROM pts
),
zv AS (
  SELECT pid, bx, by, {_zorder_sql('bx', 'by')} AS z FROM zb
)
SELECT z, bx, by,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       MIN(pid) AS min_pid,
       MAX(pid) AS max_pid
FROM zv
GROUP BY z, bx, by
HAVING COUNT(*) >= 2
ORDER BY n_points DESC, z
LIMIT 25
"""


@register(
    "q_geo_zorder_cells",
    oracle=_QZCELL_ORACLE,
    description=(
        "Z-order geohash aggregation: bit-interleaved 8-bit-per-axis cell "
        "ids over the derived point cloud, top occupied cells (the "
        "layout key Delta/Iceberg OPTIMIZE ZORDER sorts by)"
    ),
    tags=("spatial", "zorder", "geohash", "layout", "aggregate"),
)
def q_geo_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupancy of Z-order cells: interleave the two quantized axes into
    a single sortable key. The same z expression is the sort key a
    100 TB layout job would ``repartitionByRange`` on so min/max zone
    maps prune both dimensions at once."""
    pts = _points(spark, sf_dir)
    bx = F.expr(f"(lon * {1 << Z_BITS}) DIV {SPAN_MICRO + 1}")
    by = F.expr(f"(lat * {1 << Z_BITS}) DIV {SPAN_MICRO + 1}")
    zb = pts.select("pid", bx.alias("bx"), by.alias("by"))
    zv = zb.select(
        "pid", "bx", "by", _zorder_col(F.col("bx"), F.col("by")).alias("z")
    )
    return (
        zv.groupBy("z", "bx", "by")
        .agg(
            F.count("*").alias("n_points"),
            F.min("pid").alias("min_pid"),
            F.max("pid").alias("max_pid"),
        )
        .where(F.col("n_points") >= 2)
        .orderBy(F.desc("n_points"), "z")
        .limit(25)
    )


#: Coarser grid for the bounded-radius NN query (few suppliers -> larger
#: cells so the 3x3 ring usually contains candidates).
NN_CELL_MICRO = 250_000

_SUPP_LAT = sql_hash60("'lat:' || CAST(s_suppkey AS VARCHAR)")
_SUPP_LON = sql_hash60("'lon:' || CAST(s_suppkey AS VARCHAR)")

_QNN_ORACLE = f"""
WITH cust AS ({_POINTS_SQL}),
supp AS (
  SELECT s_suppkey AS sid,
         {_SUPP_LAT} % {SPAN_MICRO} AS lat,
         {_SUPP_LON} % {SPAN_MICRO} AS lon
  FROM supplier
),
cust_cells AS (
  SELECT pid, lat, lon,
         lat // {NN_CELL_MICRO} AS cy, lon // {NN_CELL_MICRO} AS cx
  FROM cust
),
supp_cells AS (
  SELECT sid, lat, lon,
         lat // {NN_CELL_MICRO} AS cy, lon // {NN_CELL_MICRO} AS cx
  FROM supp
),
offsets AS (
  SELECT dx, dy
  FROM (VALUES (-1), (0), (1)) ox(dx)
  CROSS JOIN (VALUES (-1), (0), (1)) oy(dy)
),
candidates AS (
  SELECT c.pid, s.sid,
         (c.lat - s.lat) * (c.lat - s.lat)
           + (c.lon - s.lon) * (c.lon - s.lon) AS dist_sq
  FROM cust_cells c
  CROSS JOIN offsets o
  JOIN supp_cells s
    ON s.cx = c.cx + o.dx AND s.cy = c.cy + o.dy
),
best AS (
  SELECT pid, sid, dist_sq,
         ROW_NUMBER() OVER (PARTITION BY pid ORDER BY dist_sq, sid) AS rk
  FROM candidates
)
SELECT pid, sid AS nn_suppkey, dist_sq
FROM best WHERE rk = 1
ORDER BY pid
"""


@register(
    "q_geo_grid_knn",
    oracle=_QNN_ORACLE,
    description=(
        "bounded-radius nearest neighbour: nearest supplier point to "
        "each customer point within one grid ring (3x3 cells), cell "
        "equi-join + per-point top-1 — the grid-KNN scale pattern"
    ),
    tags=("spatial", "knn", "join", "grid", "scale"),
)
def q_geo_grid_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier within the 3x3 cell ring of each customer.

    This is bounded-radius NN (points with an empty ring have no row) —
    the honest distributed-KNN building block: global KNN at scale is
    this query plus an expanding-ring retry for the residual points.
    """
    cust = _points(spark, sf_dir).select(
        "pid",
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        F.expr(f"lat DIV {NN_CELL_MICRO}").alias("cy"),
        F.expr(f"lon DIV {NN_CELL_MICRO}").alias("cx"),
    )
    s = table(spark, sf_dir, "supplier")
    supp = s.select(
        F.col("s_suppkey").alias("sid"),
        (hash60(F.concat(F.lit("lat:"), F.col("s_suppkey").cast("string"))) % SPAN_MICRO).alias("lat_b"),
        (hash60(F.concat(F.lit("lon:"), F.col("s_suppkey").cast("string"))) % SPAN_MICRO).alias("lon_b"),
    ).select(
        "sid",
        "lat_b",
        "lon_b",
        F.expr(f"lat_b DIV {NN_CELL_MICRO}").alias("jy"),
        F.expr(f"lon_b DIV {NN_CELL_MICRO}").alias("jx"),
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
    )
    probe = cust.select("*", offsets.alias("o")).select(
        "pid",
        "lat_a",
        "lon_a",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    dist_sq = (F.col("lat_a") - F.col("lat_b")) * (
        F.col("lat_a") - F.col("lat_b")
    ) + (F.col("lon_a") - F.col("lon_b")) * (F.col("lon_a") - F.col("lon_b"))
    candidates = probe.join(F.broadcast(supp), on=["jx", "jy"]).select(
        "pid", "sid", dist_sq.alias("dist_sq")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("pid").orderBy("dist_sq", "sid")
    return (
        candidates.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("pid", F.col("sid").alias("nn_suppkey"), "dist_sq")
        .orderBy("pid")
    )


#: Finer grid for the expanding-ring query: ring 1 (3x3) deliberately
#: misses ~10% of points so the second ring has real work.
EXP_CELL_MICRO = 100_000

_QEXP_ORACLE = f"""
WITH cust AS ({_POINTS_SQL}),
supp AS (
  SELECT s_suppkey AS sid,
         {_SUPP_LAT} % {SPAN_MICRO} AS lat,
         {_SUPP_LON} % {SPAN_MICRO} AS lon
  FROM supplier
),
cc AS (
  SELECT pid, lat, lon,
         lat // {EXP_CELL_MICRO} AS cy, lon // {EXP_CELL_MICRO} AS cx
  FROM cust
),
sc AS (
  SELECT sid, lat, lon,
         lat // {EXP_CELL_MICRO} AS cy, lon // {EXP_CELL_MICRO} AS cx
  FROM supp
),
ring1 AS (
  SELECT c.pid, s.sid,
         (c.lat - s.lat) * (c.lat - s.lat)
           + (c.lon - s.lon) * (c.lon - s.lon) AS dist_sq,
         ROW_NUMBER() OVER (PARTITION BY c.pid ORDER BY
           (c.lat - s.lat) * (c.lat - s.lat)
             + (c.lon - s.lon) * (c.lon - s.lon), s.sid) AS rk
  FROM cc c JOIN sc s
    ON s.cx BETWEEN c.cx - 1 AND c.cx + 1
   AND s.cy BETWEEN c.cy - 1 AND c.cy + 1
),
m1 AS (SELECT pid, sid, dist_sq FROM ring1 WHERE rk = 1),
missed AS (
  SELECT cc.* FROM cc
  WHERE NOT EXISTS (SELECT 1 FROM m1 WHERE m1.pid = cc.pid)
),
ring2 AS (
  SELECT c.pid, s.sid,
         (c.lat - s.lat) * (c.lat - s.lat)
           + (c.lon - s.lon) * (c.lon - s.lon) AS dist_sq,
         ROW_NUMBER() OVER (PARTITION BY c.pid ORDER BY
           (c.lat - s.lat) * (c.lat - s.lat)
             + (c.lon - s.lon) * (c.lon - s.lon), s.sid) AS rk
  FROM missed c JOIN sc s
    ON s.cx BETWEEN c.cx - 2 AND c.cx + 2
   AND s.cy BETWEEN c.cy - 2 AND c.cy + 2
),
m2 AS (SELECT pid, sid, dist_sq FROM ring2 WHERE rk = 1),
phases AS (
  SELECT 1 AS ring, pid, sid, dist_sq FROM m1
  UNION ALL
  SELECT 2 AS ring, pid, sid, dist_sq FROM m2
)
SELECT ring,
       CAST(COUNT(*) AS BIGINT) AS n_matched,
       CAST(SUM(sid) AS BIGINT) AS sid_checksum,
       CAST(MAX(dist_sq) AS BIGINT) AS max_dist_sq
FROM phases
GROUP BY ring
ORDER BY ring
"""


@register(
    "q_geo_knn_expanding",
    oracle=_QEXP_ORACLE,
    description=(
        "expanding-ring nearest neighbour: 3x3 ring first, the ~10% of "
        "points with an empty ring retried at 5x5 — the iterative "
        "refinement that completes grid-KNN into full coverage"
    ),
    tags=("spatial", "knn", "join", "grid", "iterative", "scale"),
)
def q_geo_knn_expanding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase grid KNN. Phase 2's input is only the ring-1 misses —
    the anti-join keeps the expensive wider probe proportional to the
    miss rate, which is the property that holds at any scale (each ring
    r costs (2r+1)^2 cell lookups on a geometrically shrinking point
    set). BETWEEN range conditions on cell ids stay equi-joinable via
    the 9/25-offset explode in the physical plan; here the ranges are
    expressed directly and Catalyst plans a hash join on the coarse key
    plus residual — at production scale use the offset-explode form of
    q_geo_grid_proximity_join."""
    cust = _points(spark, sf_dir).select(
        "pid",
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        F.expr(f"lat DIV {EXP_CELL_MICRO}").alias("cy"),
        F.expr(f"lon DIV {EXP_CELL_MICRO}").alias("cx"),
    )
    s = table(spark, sf_dir, "supplier")
    supp = s.select(
        F.col("s_suppkey").alias("sid"),
        (hash60(F.concat(F.lit("lat:"), F.col("s_suppkey").cast("string"))) % SPAN_MICRO).alias("lat_b"),
        (hash60(F.concat(F.lit("lon:"), F.col("s_suppkey").cast("string"))) % SPAN_MICRO).alias("lon_b"),
    ).select(
        "sid",
        "lat_b",
        "lon_b",
        F.expr(f"lat_b DIV {EXP_CELL_MICRO}").alias("sy"),
        F.expr(f"lon_b DIV {EXP_CELL_MICRO}").alias("sx"),
    )
    from pyspark.sql import Window

    dist_sq = (F.col("lat_a") - F.col("lat_b")) * (
        F.col("lat_a") - F.col("lat_b")
    ) + (F.col("lon_a") - F.col("lon_b")) * (F.col("lon_a") - F.col("lon_b"))

    def ring(src: DataFrame, radius: int) -> DataFrame:
        w = Window.partitionBy("pid").orderBy("dist_sq", "sid")
        return (
            src.join(
                F.broadcast(supp),
                F.col("sx").between(F.col("cx") - radius, F.col("cx") + radius)
                & F.col("sy").between(
                    F.col("cy") - radius, F.col("cy") + radius
                ),
            )
            .select("pid", "sid", dist_sq.alias("dist_sq"))
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("pid", "sid", "dist_sq")
        )

    m1 = ring(cust, 1)
    missed = cust.join(m1.select("pid"), "pid", "left_anti")
    m2 = ring(missed, 2)
    phases = m1.select(F.lit(1).alias("ring"), "pid", "sid", "dist_sq").unionByName(
        m2.select(F.lit(2).alias("ring"), "pid", "sid", "dist_sq")
    )
    return (
        phases.groupBy("ring")
        .agg(
            F.count("*").alias("n_matched"),
            F.sum("sid").alias("sid_checksum"),
            F.max("dist_sq").alias("max_dist_sq"),
        )
        .orderBy("ring")
    )
