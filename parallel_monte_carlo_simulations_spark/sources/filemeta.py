"""Scan-time file metadata: the ``_metadata`` hidden column.

Spark exposes per-file provenance on every file-source scan —
``_metadata.file_name``, ``file_size``, ``row_index`` — without extra
I/O (materialized from the scan's own bookkeeping). The
lineage/debugging workhorse at 100 TB: "which physical file did this
bad row come from?".

The query writes the order keys as an explicit 4-partition range
layout, reads them back grouped by ``_metadata.file_name``, and
reports the layout INVARIANTS — file count, total rows, global key
range, and whether the per-file key ranges are pairwise disjoint
(range partitioning's defining property). Exact per-file boundaries
are engine-internal (range sampling) and file names are run-dependent,
so the oracle predicts the invariants, not the boundaries — that is
precisely what a lineage check at scale can rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .roundtrip import _tmpdir

N_FILES = 4

_QMETA_ORACLE = f"""
SELECT TRUE AS n_files_in_bounds,
       CAST(COUNT(*) AS BIGINT) AS total_rows,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       TRUE AS ranges_disjoint
FROM orders
"""


@register(
    "q_source_file_metadata",
    oracle=_QMETA_ORACLE,
    description=(
        "_metadata hidden column: per-file provenance of an explicit "
        "range layout, reduced to the layout invariants (file-count "
        "bounds, totals, pairwise-disjoint key ranges)"
    ),
    tags=("source", "metadata", "lineage", "layout"),
)
def q_source_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    path = _tmpdir("filemeta")
    (
        o.repartitionByRange(N_FILES, "o_orderkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    per_file = (
        spark.read.parquet(path)
        .select("o_orderkey", F.col("_metadata.file_name").alias("fname"))
        .groupBy("fname")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )
    w = Window.orderBy("min_key")
    flagged = per_file.withColumn(
        "prev_max", F.lag("max_key").over(w)
    ).withColumn(
        "ok",
        F.col("prev_max").isNull() | (F.col("min_key") > F.col("prev_max")),
    )
    # file count is reported as a BOUNDS check, not an exact value:
    # repartitionByRange's reservoir sampler may draw an empty partition
    # on tiny/skewed key sets, and Spark writes no file for it — the
    # guaranteed invariant is 1 <= n_files <= N_FILES, never == N_FILES
    return flagged.agg(
        (
            (F.count("*") >= F.lit(1)) & (F.count("*") <= F.lit(N_FILES))
        ).alias("n_files_in_bounds"),
        F.sum("n_rows").alias("total_rows"),
        F.min("min_key").alias("min_key"),
        F.max("max_key").alias("max_key"),
        F.min("ok").alias("ranges_disjoint"),
    )
