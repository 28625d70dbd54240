"""Error-safe expression surface: try_cast / try_divide / try_add under
ANSI mode (the driver's Spark 4 session runs ANSI on; naive casts and
zero-divides THROW there — the try_* family returns NULL instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QTRY_ORACLE = """
SELECT
  doc_id,
  TRY_CAST(source AS INTEGER)                        AS src_as_int,
  TRY_CAST(substr(source, 4) AS INTEGER)             AS src_num,
  CASE WHEN (doc_id % 5) = 0 THEN NULL
       ELSE CAST(n_chars / (doc_id % 5) AS DOUBLE) END AS chars_per_bucket,
  COALESCE(TRY_CAST(lang AS INTEGER), -1)            AS lang_as_int_or_default
FROM documents
"""


@register(
    "q_try_functions",
    oracle=_QTRY_ORACLE,
    description="try_cast/try_divide: NULL-on-error semantics under ANSI mode",
    tags=("scalar", "ansi", "try"),
)
def q_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("source").try_cast("int").alias("src_as_int"),  # 'src3' -> NULL
        F.expr("substr(source, 4)").try_cast("int").alias("src_num"),
        F.try_divide(
            F.col("n_chars").cast("double"), (F.col("doc_id") % 5).cast("double")
        ).alias("chars_per_bucket"),  # /0 -> NULL, not an ANSI error
        F.coalesce(F.col("lang").try_cast("int"), F.lit(-1)).alias(
            "lang_as_int_or_default"
        ),
    )


@register(
    "q_approx_percentile",
    oracle=None,  # estimator-specific (GK sketch) — rows-only
    description="approx_percentile sketch (bounds property-tested)",
    tags=("aggregate", "approx"),
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(1000)).alias(
            "approx_p50"
        ),
        F.approx_percentile("l_extendedprice", F.lit(0.99), F.lit(1000)).alias(
            "approx_p99"
        ),
        (F.floor((F.percentile("l_extendedprice", F.lit(0.5))) * 1e2 + 0.5) / 1e2).alias("exact_p50"),
    )
