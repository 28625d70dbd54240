"""Embedding feature preprocessing: per-dimension quantile normalization.

Before indexing or training on embeddings from heterogeneous encoders,
per-dimension quantile (rank) normalization maps every dimension onto
[0, 1] by its empirical CDF — robust to scale differences and outliers
where z-scoring is not. The distributed shape: posexplode the vectors
to (vec_id, dim, value) — the long format ALL per-dimension statistics
share — window percent_rank per dimension, re-assemble per vector.
One shuffle on dim for the rank, one on vec_id for the re-assembly,
both key-partitioned at any scale.

Ties: percent_rank gives equal ranks to equal values (engine-agnostic
definition: (rank-1)/(n-1)), so the output is deterministic even with
duplicated values; the oracle replays the identical window. Output is
summarized per vector (mean/min/max of normalized dims + a checksum)
to keep the row count at corpus size rather than corpus x dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QQNORM_ORACLE = """
WITH expl AS (
  SELECT vec_id, label, i.i AS dim,
         CAST(embedding[i.i + 1] AS DOUBLE) AS v
  FROM embeddings,
       LATERAL (SELECT unnest(range(0, len(embedding))) AS i) i
),
ranked AS (
  SELECT vec_id, label, dim,
         percent_rank() OVER (PARTITION BY dim ORDER BY v) AS q
  FROM expl
)
SELECT vec_id,
       CAST(ANY_VALUE(label) AS INTEGER)                    AS label,
       FLOOR(AVG(q) * 1000000 + 0.5e0) / 1000000            AS q_mean,
       FLOOR(MIN(q) * 1000000 + 0.5e0) / 1000000            AS q_min,
       FLOOR(MAX(q) * 1000000 + 0.5e0) / 1000000            AS q_max,
       CAST(SUM(CASE WHEN q > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above_median
FROM ranked
GROUP BY vec_id
"""


@register(
    "q_embedding_quantile_normalize",
    oracle=_QQNORM_ORACLE,
    description=(
        "per-dimension quantile (empirical-CDF) normalization of "
        "embeddings via posexplode + percent_rank window, summarized "
        "per vector"
    ),
    tags=("similarity", "embedding", "preprocessing", "window"),
)
def q_embedding_quantile_normalize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    expl = e.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        ),
    )
    q = F.percent_rank().over(Window.partitionBy("dim").orderBy("v"))
    ranked = expl.select("vec_id", "label", "dim", q.alias("q"))
    q6 = lambda c: F.floor(c * 1000000 + 0.5) / 1000000  # noqa: E731
    return ranked.groupBy("vec_id").agg(
        F.any_value("label").cast("int").alias("label"),
        q6(F.avg("q")).alias("q_mean"),
        q6(F.min("q")).alias("q_min"),
        q6(F.max("q")).alias("q_max"),
        F.sum(F.when(F.col("q") > 0.5, 1).otherwise(0))
        .cast("long")
        .alias("n_above_median"),
    )
