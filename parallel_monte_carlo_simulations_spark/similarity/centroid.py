"""Embedding aggregates: per-label centroids and cosine-to-centroid
outlier detection — the curation primitive that flags mislabeled /
off-cluster vectors before training.

Cross-engine float discipline: centroid components are averaged via a
per-element ``DECIMAL(28,9)`` cast before SUM on BOTH engines, making
the sum exact and order-independent (the cent-boundary lesson applied
to embeddings); the decimal sum divides back to double identically, so
downstream cosine folds are bit-identical too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import sql_cosine, sql_dot
from ..registry import register
from ..tables import table

_OUTLIER_COS = 0.2  # FLOOR((cos) * 1e6 + 0.5) / 1e6 strictly below this => outlier


def _centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, pos, cval): exact decimal-mean embedding per label."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(28,9)"))
                .cast("double")
                / F.count("*")
            ).alias("cval")
        )
    )


_SQL_CENTROIDS = """
  SELECT label, i.i AS pos,
         CAST(SUM(CAST(CAST(embedding[i.i + 1] AS DOUBLE) AS DECIMAL(28,9)))
              AS DOUBLE) / COUNT(*) AS cval
  FROM embeddings,
       LATERAL (SELECT unnest(range(0, len(embedding))) AS i) i
  GROUP BY label, i.i
"""

_QCENTROID_ORACLE = f"""
WITH cent AS ({_SQL_CENTROIDS})
SELECT label, CAST(pos AS INTEGER) AS pos, FLOOR((cval) * 1e6 + 0.5) / 1e6 AS cval
FROM cent
"""


@register(
    "q_embedding_centroid",
    oracle=_QCENTROID_ORACLE,
    description=(
        "per-label mean embedding (exact decimal-summed centroid), one "
        "row per (label, dimension)"
    ),
    tags=("similarity", "embedding", "centroid", "aggregate"),
)
def q_embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid computation as a posexplode + groupBy(label, pos): the
    per-dimension layout shuffles (n_vectors × dim) skinny rows once and
    partial-aggregates map-side — at 100 TB this beats any
    collect-vectors-to-one-place scheme, and the decimal sum makes the
    result independent of partition merge order."""
    return _centroids(spark, sf_dir).select(
        "label",
        F.col("pos").cast("int").alias("pos"),
        (F.floor((F.col("cval")) * 1e6 + 0.5) / 1e6).alias("cval"),
    )


_QOUTLIER_ORACLE = f"""
WITH cent AS ({_SQL_CENTROIDS}),
cvec AS (
  SELECT label, list(cval ORDER BY pos) AS cemb FROM cent GROUP BY label
),
scored AS (
  SELECT e.vec_id, e.label,
         FLOOR(({sql_cosine("list_transform(e.embedding, x -> CAST(x AS DOUBLE))", "c.cemb")}) * 1e6 + 0.5) / 1e6 AS cos_c
  FROM embeddings e JOIN cvec c ON e.label = c.label
)
SELECT vec_id, label, cos_c
FROM scored WHERE cos_c < {_OUTLIER_COS}
"""


@register(
    "q_embedding_outliers",
    oracle=_QOUTLIER_ORACLE,
    description=(
        f"cosine-to-own-centroid outlier scan: vectors with rounded "
        f"cosine < {_OUTLIER_COS} to their label centroid (mislabeled/"
        "off-cluster detection)"
    ),
    tags=("similarity", "embedding", "centroid", "outlier", "curation"),
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation scan: rebuild each label's centroid as an array (sorted
    collect of the exact per-dimension means), broadcast the tiny
    centroid table against the full embedding set, and flag vectors
    whose cosine to their own centroid falls below the threshold. The
    cosine fold is index-ordered on both engines and its input centroids
    are exact decimals-to-doubles, so the rounded score hash-matches;
    the threshold compares the ROUNDED value so the cut is identical
    too. Big side never shuffles — centroids are dim-count × n_labels."""
    cent = _centroids(spark, sf_dir)
    cvec = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s.cval,
        ).alias("cemb")
    )
    e = table(spark, sf_dir, "embeddings")
    emb_d = F.col("embedding").cast("array<double>")
    dot_ec = F.aggregate(
        F.zip_with(emb_d, F.col("cemb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm_e = F.sqrt(
        F.aggregate(
            F.zip_with(emb_d, emb_d, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    norm_c = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("cemb"), F.col("cemb"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    scored = e.join(F.broadcast(cvec), "label").select(
        "vec_id",
        "label",
        (F.floor((dot_ec / (norm_e * norm_c)) * 1e6 + 0.5) / 1e6).alias("cos_c"),
    )
    return scored.filter(F.col("cos_c") < _OUTLIER_COS)


_QQUANT_ORACLE = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS mn,
         list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS mx
  FROM embeddings
),
coded AS (
  SELECT vec_id, v, mn, greatest(mx - mn, 1e-12) / 255.0 AS scale,
         list_transform(
           v, x -> round((x - mn) / (greatest(mx - mn, 1e-12) / 255.0))
         ) AS codes
  FROM q
)
SELECT vec_id,
       CAST(list_reduce(list_concat([0.0], codes), (a, b) -> a + b) AS BIGINT)
         AS code_sum,
       FLOOR((list_max(list_transform(
         range(1, len(v) + 1),
         i -> abs(v[i] - (mn + codes[i] * scale))
       ))) * 1e6 + 0.5) / 1e6 AS max_abs_err
FROM coded
"""


@register(
    "q_embedding_quantize",
    oracle=_QQUANT_ORACLE,
    description=(
        "int8 scalar quantization of embeddings (per-vector min/max "
        "scale): code checksum + max reconstruction error"
    ),
    tags=("similarity", "embedding", "quantization", "compression"),
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-side ANN primitive: 4x compression by per-vector min/max
    int8 quantization (the scalar-quantization variant next to PQ's
    codebook approach in ``similarity/pq.py``). The integer code sum is
    an exact cross-engine checksum of every rounded code; the max
    reconstruction error bounds the quantization loss. All higher-order
    built-ins over the array column — zero shuffle, zero Python."""
    e = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    q = e.select(
        "vec_id",
        v.alias("v"),
        F.array_min(v).alias("mn"),
        F.array_max(v).alias("mx"),
    ).select(
        "vec_id", "v", "mn",
        # greatest(.., 1e-12) guards the constant-vector case (mx == mn):
        # scale=0 would give 0/0 = NaN codes here and Inf (or a BIGINT
        # cast error) in the oracle. With the floor, codes are exactly 0
        # and reconstruction error is 0 — mirrored in the oracle SQL.
        (F.greatest(F.col("mx") - F.col("mn"), F.lit(1e-12)) / 255.0)
        .alias("scale"),
    )
    coded = q.select(
        "vec_id", "v", "mn", "scale",
        F.transform(
            F.col("v"), lambda x: F.round((x - F.col("mn")) / F.col("scale"))
        ).alias("codes"),
    )
    err = F.zip_with(
        F.col("v"),
        F.col("codes"),
        lambda x, c: F.abs(x - (F.col("mn") + c * F.col("scale"))),
    )
    return coded.select(
        "vec_id",
        F.aggregate(F.col("codes"), F.lit(0.0), lambda a, b: a + b)
        .cast("long")
        .alias("code_sum"),
        (F.floor((F.array_max(err)) * 1e6 + 0.5) / 1e6).alias("max_abs_err"),
    )
