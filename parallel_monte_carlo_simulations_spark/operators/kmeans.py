"""Lloyd's k-means (2 full iterations), integer-exact (round 10).

The canonical clustering loop — assign points to the nearest centroid,
recompute centroids as member means, repeat — expressed so every step
is EXACT integer arithmetic and therefore bit-identical cross-engine:

- coordinates quantize once to 1e-6 micro-units (BIGINT);
- squared L2 distances are exact integer sums. Headroom: per-point
  d2 <= 64 dims x (2e6)^2 = 2.56e14, so the per-cluster inertia sum
  stays BIGINT-exact up to ~3.6e4 WORST-CASE points per cluster and
  far beyond for clustered data (real d2 is orders smaller); past
  that, ANSI mode (the driver session) raises loudly rather than
  wrapping — drop the micro-unit scale to 1e-5 per the
  functions/microunit.py discipline if a corpus ever trips it;
- the centroid mean rounds half-up in pure integers via the SHIFT
  trick: coordinates can be negative and Spark's ``div`` truncates
  toward zero while DuckDB's ``//`` floors, so the numerator is shifted
  by n*SHIFT (>= 0 for any v >= -1.0), divided, then unshifted —
  identical in both engines;
- argmin assignment breaks distance ties on centroid id.

Scale shape: the point-centroid distance join broadcasts a K*dims
(= 256-row) centroid frame against the skinny (vec, dim, q) layout —
map-side combinable groupBys, no data-sized shuffle beyond the
per-point aggregation. Two unrolled iterations keep the lazy plan
bounded (k-means at 100 TB is this exact dataflow with the centroid
frame re-broadcast per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_K = 4  #: clusters; deterministic init = vectors with vec_id 0.._K-1
_SHIFT = 1_000_000  #: micro-unit shift making mean numerators >= 0

_QKMEANS_ORACLE = f"""
WITH pts AS (
  SELECT vec_id, i.i AS dim,
         CAST(ROUND(CAST(embedding[i.i + 1] AS DOUBLE) * 1000000, 0)
              AS BIGINT) AS q
  FROM embeddings,
       LATERAL (SELECT unnest(range(0, len(embedding))) AS i) i
),
cent1 AS (
  SELECT CAST(vec_id AS INTEGER) AS cid, dim, q AS c
  FROM pts WHERE vec_id < {_K}
),
d1 AS (
  SELECT p.vec_id, c.cid, CAST(SUM((p.q - c.c) * (p.q - c.c)) AS BIGINT) AS d2
  FROM pts p JOIN cent1 c ON p.dim = c.dim
  GROUP BY p.vec_id, c.cid
),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d1
  ) WHERE rn = 1
),
cent2 AS (
  SELECT a.cid, p.dim,
         (2 * (SUM(p.q) + COUNT(*) * {_SHIFT}) + COUNT(*))
           // (2 * COUNT(*)) - {_SHIFT} AS c
  FROM pts p JOIN a1 a ON p.vec_id = a.vec_id
  GROUP BY a.cid, p.dim
),
d2s AS (
  SELECT p.vec_id, c.cid, CAST(SUM((p.q - c.c) * (p.q - c.c)) AS BIGINT) AS d2
  FROM pts p JOIN cent2 c ON p.dim = c.dim
  GROUP BY p.vec_id, c.cid
),
a2 AS (
  SELECT vec_id, cid, d2 FROM (
    SELECT vec_id, cid, d2,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d2s
  ) WHERE rn = 1
)
SELECT a2.cid,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(a2.d2) AS BIGINT) AS inertia_u2,
       CAST(COUNT(*) FILTER (WHERE a1.cid <> a2.cid) AS BIGINT) AS n_moved_in,
       CAST(ANY_VALUE(cs.csum) AS BIGINT) AS centroid_checksum
FROM a2
JOIN a1 ON a1.vec_id = a2.vec_id
JOIN (SELECT cid, CAST(SUM(c) AS BIGINT) AS csum FROM cent2 GROUP BY cid) cs
  ON cs.cid = a2.cid
GROUP BY a2.cid
ORDER BY a2.cid
"""


@register(
    "q_ml_kmeans_lloyd",
    oracle=_QKMEANS_ORACLE,
    description=(
        f"Lloyd k-means (k={_K}, 2 iterations, vec_id 0..{_K - 1} init): "
        "micro-unit integer distances, SHIFT-trick half-up centroid "
        "means (cross-engine div/floor safe), argmin with cid "
        "tie-break — per-cluster size, exact inertia, reassignment "
        "count, centroid checksum"
    ),
    tags=("ml", "clustering", "kmeans", "iterative", "aggregate"),
)
def q_ml_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    pts = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "vec_id",
        "dim",
        F.round(F.col("v").cast("double") * 1_000_000, 0)
        .cast("long")
        .alias("q"),
    )
    cent = pts.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").cast("int").alias("cid"), "dim", F.col("q").alias("c")
    )

    def assign(centroids: DataFrame) -> DataFrame:
        """(vec_id, cid, d2): nearest centroid, distance ties -> cid."""
        d = (
            pts.join(F.broadcast(centroids), "dim")
            .groupBy("vec_id", "cid")
            .agg(
                F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c")))
                .cast("long")
                .alias("d2")
            )
        )
        best = d.groupBy("vec_id").agg(
            F.min(F.struct("d2", "cid")).alias("m")
        )
        return best.select(
            "vec_id", F.col("m.cid").alias("cid"), F.col("m.d2").alias("d2")
        )

    def update(assignment: DataFrame) -> DataFrame:
        """(cid, dim, c): half-up integer mean via the SHIFT trick."""
        return (
            pts.join(assignment.select("vec_id", "cid"), "vec_id")
            .groupBy("cid", "dim")
            .agg(
                F.expr(
                    f"(2 * (sum(q) + count(*) * {_SHIFT}) + count(*))"
                    f" div (2 * count(*)) - {_SHIFT}"
                ).alias("c")
            )
            .select("cid", "dim", "c")
        )

    a1 = assign(cent)
    cent2 = update(a1)
    a2 = assign(cent2)
    csum = cent2.groupBy("cid").agg(
        F.sum("c").cast("long").alias("csum")
    )
    moved = a1.select("vec_id", F.col("cid").alias("cid_prev"))
    return (
        a2.join(moved, "vec_id")
        .groupBy("cid")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.sum("d2").cast("long").alias("inertia_u2"),
            F.count(F.when(F.col("cid_prev") != F.col("cid"), 1))
            .cast("long")
            .alias("n_moved_in"),
        )
        .join(F.broadcast(csum), "cid")
        .select(
            "cid",
            "n_members",
            "inertia_u2",
            "n_moved_in",
            F.col("csum").cast("long").alias("centroid_checksum"),
        )
        .orderBy("cid")
    )
