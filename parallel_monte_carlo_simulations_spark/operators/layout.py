"""Storage-layout operators: Z-order clustering and small-file
compaction — the table-maintenance half of a lakehouse engine
(Delta/Iceberg OPTIMIZE, CLUSTER BY), expressed engine-agnostically.

Z-ordering maps multi-column predicates onto a 1-D sort key by bit
interleaving, so a range filter on EITHER column touches a contiguous
band of files after sorting — the data-skipping prep step for scans at
100 TB. The interleave is pure integer arithmetic, identical in Spark
and DuckDB, so the layout decision itself is oracle-checked (not just
the plumbing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_ZBITS = 8  # 8 bits per dimension -> 16-bit z-value, 256x256 grid


def _z_interleave_sql(xa: str, ya: str, intdiv: str) -> str:
    """SQL for the bit-interleaved z-value of two <=8-bit non-negative
    ints. Same arithmetic on both engines; only the integer-division
    operator differs (Spark ``DIV``, DuckDB ``//``)."""
    terms = []
    for b in range(_ZBITS):
        terms.append(f"((({xa}) {intdiv} {1 << b}) % 2) * {1 << (2 * b)}")
        terms.append(f"((({ya}) {intdiv} {1 << b}) % 2) * {1 << (2 * b + 1)}")
    return " + ".join(terms)


_X = f"user_id % {1 << _ZBITS}"
_Y = f"CAST(floor(value) AS BIGINT) % {1 << _ZBITS}"  # value >= 0 in events

_QZORDER_ORACLE = f"""
WITH g AS (
  SELECT event_id, {_X} AS gx, {_Y} AS gy,
         {_z_interleave_sql(_X, _Y, "//")} AS zval
  FROM events
)
SELECT CAST(zval // 4096 AS BIGINT)  AS file_bucket,
       CAST(COUNT(*) AS BIGINT)      AS n_rows,
       CAST(MIN(gx) AS BIGINT)       AS min_x,
       CAST(MAX(gx) AS BIGINT)       AS max_x,
       CAST(MIN(gy) AS BIGINT)       AS min_y,
       CAST(MAX(gy) AS BIGINT)       AS max_y
FROM g
GROUP BY zval // 4096
"""


@register(
    "q_zorder_layout",
    oracle=_QZORDER_ORACLE,
    description=(
        "Z-order clustering: bit-interleaved (user, value) sort key and "
        "per-file-bucket min/max zone map (data-skipping layout prep)"
    ),
    tags=("layout", "zorder", "clustering", "warehouse"),
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compute the Z-curve value for each event from two predicate
    columns, bucket rows into prospective files along the curve, and
    emit each bucket's per-column min/max zone map — exactly the
    statistics a scan planner uses to skip files. The payoff is visible
    in the result: both min/max ranges stay narrow per bucket, where a
    single-column sort leaves the other column's range at full width.
    All integer arithmetic, one aggregate shuffle; writing the buckets
    with partitionBy/sortWithinPartitions is the (already-covered)
    sink step."""
    e = table(spark, sf_dir, "events")
    g = e.select(
        "event_id",
        F.expr(_X).alias("gx"),
        F.expr(_Y).alias("gy"),
        F.expr(_z_interleave_sql(_X, _Y, "DIV")).alias("zval"),
    )
    return (
        g.groupBy((F.col("zval") / 4096).cast("long").alias("file_bucket"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("gx").cast("long").alias("min_x"),
            F.max("gx").cast("long").alias("max_x"),
            F.min("gy").cast("long").alias("min_y"),
            F.max("gy").cast("long").alias("max_y"),
        )
    )


_QCOMPACT_ORACLE = """
SELECT TRUE AS fragmented,
       TRUE AS compacted,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
"""


@register(
    "q_sink_compaction",
    oracle=_QCOMPACT_ORACLE,
    description=(
        "small-file compaction (OPTIMIZE): 64-file fragmented write "
        "rewritten to <=4 files, content equality + file-count invariants "
        "proven on read-back"
    ),
    tags=("layout", "compaction", "sink", "warehouse"),
)
def q_sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OPTIMIZE half of table maintenance: a fragmented table (64
    deliberately tiny files — the small-files problem that throttles
    scans with per-file open costs at 100 TB) is compacted by a
    coalesce-rewrite to 4 right-sized files. File counts come from
    ``input_file_name()`` on each read-back, and the row/char totals
    only match the oracle if compaction preserved content exactly.
    ``coalesce`` (not repartition) keeps the rewrite shuffle-free.

    The oracle checks *invariants* (fragmented: 1 <= files_after <=
    files_before <= 64; compacted: files_after <= 4) plus exact content
    totals, not the literal counts 64/4: Spark writes no file for an
    empty partition, so at a scale factor with fewer documents than
    partitions (or an unlucky round-robin split) the literal counts are
    not guaranteed. ``tests/test_layout.py`` pins the exact 64 -> 4
    counts at the SF where they are deterministic."""
    from ..sources.roundtrip import _tmpdir

    d = table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    frag_path, compact_path = _tmpdir("frag"), _tmpdir("compact")
    d.repartition(64).write.mode("overwrite").parquet(frag_path)

    frag = spark.read.parquet(frag_path)
    files_before = (
        frag.select(F.input_file_name().alias("f"))
        .distinct()
        .agg(F.count("*").cast("int").alias("n"))
    )
    frag.coalesce(4).write.mode("overwrite").parquet(compact_path)

    compacted = spark.read.parquet(compact_path)
    files_after = (
        compacted.select(F.input_file_name().alias("f"))
        .distinct()
        .agg(F.count("*").cast("int").alias("n"))
    )
    stats = compacted.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    counts = files_before.withColumnRenamed("n", "files_before").crossJoin(
        files_after.withColumnRenamed("n", "files_after")
    )
    return counts.select(
        (
            (F.col("files_after") >= 1)
            & (F.col("files_after") <= F.col("files_before"))
            & (F.col("files_before") <= 64)
        ).alias("fragmented"),
        (F.col("files_after") <= 4).alias("compacted"),
    ).crossJoin(stats)


_QREBAL_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT)       AS n_items,
       FLOOR((SUM(l_quantity)) * 1e2 + 0.5) / 1e2      AS sum_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "q_hint_rebalance",
    oracle=_QREBAL_ORACLE,
    description=(
        "AQE REBALANCE hint: output files sized by runtime statistics "
        "instead of static partition counts (small-file prevention at "
        "the sink, skew-split on write)"
    ),
    tags=("layout", "aqe", "rebalance", "hint"),
)
def q_hint_rebalance(spark, sf_dir: str):
    """``/*+ REBALANCE(col) */`` asks AQE to re-split output partitions
    by runtime size — the sink-side answer to both small files (tiny
    partitions coalesce) and hot keys (oversized partitions split,
    which plain repartition(col) cannot do). The aggregate result is
    oracle-checked; the rebalance changes layout, never values."""
    from ..tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT /*+ REBALANCE(l_returnflag) */
               l_returnflag,
               CAST(COUNT(*) AS BIGINT)  AS n_items,
               FLOOR((SUM(l_quantity)) * 1e2 + 0.5) / 1e2 AS sum_qty
        FROM lineitem
        GROUP BY l_returnflag
        """
    )
