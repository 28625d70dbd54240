"""Source/sink coverage: CSV, JSON, partitioned parquet.

Each query WRITES a slice of the test data through the format under test
and READS it back into the final result, so the oracle (which reads the
original parquet) only matches if the roundtrip is lossless. This is the
§2.B scans/sinks row made verifiable.

Sinks write under /tmp (driver-local); at scale the same writer calls
target object storage — the API surface is identical.
"""

from __future__ import annotations

import atexit
import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.microunit import (
    rdiv_halfup_duck,
    rdiv_halfup_expr,
    units_col,
    units_sql,
)
from ..registry import register
from ..tables import table

#: One mkdtemp parent per process, removed at exit: sink paths are unique
#: never-created subdirs of it (Spark creates them), so there is no
#: mkdtemp-then-rmdir race and repeated runs don't accumulate /tmp copies.
_TMP_ROOT: str | None = None
_TMP_SEQ = itertools.count()


def _tmpdir(tag: str) -> str:
    global _TMP_ROOT
    if _TMP_ROOT is None:
        _TMP_ROOT = tempfile.mkdtemp(prefix="pmcs_sinks_")
        atexit.register(shutil.rmtree, _TMP_ROOT, ignore_errors=True)
    return os.path.join(_TMP_ROOT, f"{tag}_{next(_TMP_SEQ)}")


# --------------------------------------------------------------------------
# CSV roundtrip: nation through csv (header, explicit schema on read).
# --------------------------------------------------------------------------

_QCSV_ORACLE = """
SELECT r_name, COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


@register(
    "q_source_csv_roundtrip",
    oracle=_QCSV_ORACLE,
    description="CSV sink+source roundtrip feeding a join (lossless check)",
    tags=("source", "sink", "csv"),
)
def q_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    path = _tmpdir("csv")
    n.write.mode("overwrite").option("header", "true").csv(path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    n_back = spark.read.schema(schema).option("header", "true").csv(path)
    r = table(spark, sf_dir, "region")
    return (
        n_back.join(F.broadcast(r), n_back.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


# --------------------------------------------------------------------------
# JSON-lines roundtrip: orders slice through json.
# --------------------------------------------------------------------------

_QJSONRT_ORACLE = f"""
SELECT o_orderstatus,
       COUNT(*)                    AS n_orders,
       {rdiv_halfup_duck(f"SUM({units_sql('o_totalprice', 2)})", "100", 2)}
                                   AS total_price
FROM orders
WHERE o_orderkey % 10 = 0
GROUP BY o_orderstatus
"""


@register(
    "q_source_json_roundtrip",
    oracle=_QJSONRT_ORACLE,
    description="JSON-lines sink+source roundtrip + aggregate",
    tags=("source", "sink", "json"),
)
def q_source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    path = _tmpdir("json")
    o.write.mode("overwrite").json(path)
    o_back = spark.read.schema(
        "o_orderkey long, o_orderstatus string, o_totalprice double"
    ).json(path)
    return o_back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        rdiv_halfup_expr(
            f"sum({units_sql('o_totalprice', 2)})", "100", 2
        ).alias("total_price"),
    )


# --------------------------------------------------------------------------
# Partitioned parquet sink: hive-style partition pruning on read-back.
# --------------------------------------------------------------------------

_QPART_ORACLE = """
SELECT l_linestatus,
       COUNT(*)                   AS n_items,
       FLOOR((SUM(l_quantity)) * 1e2 + 0.5) / 1e2  AS sum_qty
FROM lineitem
WHERE l_returnflag = 'R'
GROUP BY l_linestatus
"""


@register(
    "q_sink_partitioned_parquet",
    oracle=_QPART_ORACLE,
    description="partitionBy parquet sink; read-back hits only the pruned partition",
    tags=("source", "sink", "parquet", "partition_pruning"),
)
def q_sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    )
    path = _tmpdir("part")
    l.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    back = spark.read.parquet(path)
    # The l_returnflag='R' filter prunes to one hive partition at scan
    # time (PartitionFilters in .explain) — no data from other flags read.
    return (
        back.filter(F.col("l_returnflag") == "R")
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.floor((F.sum("l_quantity")) * 1e2 + 0.5) / 1e2).alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------------
# ORC roundtrip: columnar alternative to parquet (native Spark source,
# same pushdown/pruning machinery; the oracle reads the parquet truth).
# --------------------------------------------------------------------------

_QORCRT_ORACLE = f"""
SELECT l_returnflag,
       COUNT(*)                         AS n_items,
       {rdiv_halfup_duck(f"SUM({units_sql('l_extendedprice', 2)})", "100", 2)}
                                        AS sum_price
FROM lineitem
WHERE l_quantity > 30
GROUP BY l_returnflag
"""


@register(
    "q_source_orc_roundtrip",
    oracle=_QORCRT_ORACLE,
    description="ORC sink+source roundtrip with predicate pushdown on read-back",
    tags=("source", "sink", "orc"),
)
def q_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    path = _tmpdir("orc")
    l.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    # quantity predicate is pushed into the ORC reader (row-group skip)
    return (
        back.filter(F.col("l_quantity") > 30)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            rdiv_halfup_expr(
                f"sum({units_sql('l_extendedprice', 2)})", "100", 2
            ).alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# text source: one line per record through spark.read.text.
# --------------------------------------------------------------------------

_QTEXT_ORACLE = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars
FROM documents
WHERE NOT contains(text, chr(10))
GROUP BY lang
"""


@register(
    "q_source_text_roundtrip",
    oracle=_QTEXT_ORACLE,
    description="line-oriented text sink+source roundtrip (lang|text lines re-parsed)",
    tags=("source", "sink", "text"),
)
def q_source_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rawest ingest format: serialize ``lang|text`` lines through
    ``df.write.text`` / ``spark.read.text`` (newline-free docs only, as
    line-oriented formats require), re-split on the first pipe, and
    aggregate — matching the oracle only if every line survived intact.
    ``text`` scans parallelize by file split like any other source."""
    d = table(spark, sf_dir, "documents").filter(~F.contains("text", F.lit("\n")))
    path = _tmpdir("text")
    d.select(
        F.concat_ws("|", F.col("lang"), F.col("text")).alias("value")
    ).write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    parsed = lines.select(
        F.substring_index("value", "|", 1).alias("lang"),
        F.expr("substring(value, instr(value, '|') + 1)").alias("text"),
    )
    return parsed.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
    )


# --------------------------------------------------------------------------
# binaryFile source: opaque payload files read back with metadata.
# --------------------------------------------------------------------------

_QBINARY_ORACLE = """
SELECT CAST(doc_id % 10 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT)    AS n_files,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
FROM documents
WHERE doc_id < 200
GROUP BY doc_id % 10
"""


@register(
    "q_source_binaryfile",
    oracle=_QBINARY_ORACLE,
    description=(
        "binaryFile source: write per-doc payload files, read back via "
        "format('binaryFile'), aggregate true byte lengths"
    ),
    tags=("source", "binary", "multimodal"),
)
def q_source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest path multimodal corpora actually use: opaque files on
    storage read as (path, modificationTime, length, content) rows via
    the ``binaryFile`` source. Payload files are written once per query
    run via ``foreachPartition`` — each EXECUTOR writes its partition's
    files, no ``collect()`` and no driver loop, the pattern that holds
    when the corpus is billions of payloads (here the target is a local
    tmpdir; on a cluster it would be a shared-store path). The read-back
    parses doc ids from file names and aggregates CONTENT byte lengths,
    so the oracle only matches if the binary payloads round-tripped
    exactly. At scale the same reader lists object storage and
    parallelizes by file."""
    import os as _os

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    path = _tmpdir("binfiles")
    _os.makedirs(path, exist_ok=True)

    def _write_partition(rows) -> None:
        import os

        for r in rows:
            with open(os.path.join(path, f"doc_{r.doc_id}.bin"), "wb") as fh:
                fh.write(r.text.encode("utf-8"))

    d.select("doc_id", "text").foreachPartition(_write_partition)
    files = spark.read.format("binaryFile").load(path)
    parsed = files.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
        .cast("long")
        .alias("doc_id"),
        F.length("content").alias("n_bytes"),
    )
    return parsed.groupBy((F.col("doc_id") % 10).alias("bucket")).agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
    ).select(F.col("bucket").cast("long").alias("bucket"), "n_files", "total_bytes")


# --------------------------------------------------------------------------
# CSV robustness leg 1: quoting/escaping roundtrip. Fields containing the
# delimiter, double quotes, and newlines must survive write->read intact.
# --------------------------------------------------------------------------

_QCSVQ_ORACLE = """
WITH decorated AS (
  SELECT doc_id, lang,
         'pre,"' || chr(10) || text || '",post' AS tricky
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT)             AS n_docs,
       CAST(SUM(length(tricky)) AS BIGINT)  AS n_chars
FROM decorated
GROUP BY lang
"""


@register(
    "q_source_csv_quoted",
    oracle=_QCSVQ_ORACLE,
    description=(
        "CSV quoting roundtrip: fields carrying delimiters, double "
        "quotes and embedded newlines survive write->read (multiLine "
        "parse) byte-exactly"
    ),
    tags=("source", "sink", "csv", "quoting"),
)
def q_source_csv_quoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every real CSV feed eventually contains the delimiter, quote
    char, and newlines INSIDE fields. Decorate each doc text with all
    three (',', '\"', '\\n'), round-trip through the CSV writer/parser
    (multiLine on, default RFC-4180-style quoting/escaping), and
    aggregate length sums that only match the oracle (which computes
    them from the original text, never touching CSV) if parsing
    reconstructed every byte."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.concat(
            F.lit('pre,"'), F.lit("\n"), F.col("text"), F.lit('",post')
        ).alias("tricky"),
    )
    path = _tmpdir("csvq")
    d.write.mode("overwrite").option("header", "true").csv(path)
    back = (
        spark.read.schema("doc_id long, lang string, tricky string")
        .option("header", "true")
        .option("multiLine", "true")
        .csv(path)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("tricky")).cast("long").alias("n_chars"),
    )


# --------------------------------------------------------------------------
# CSV robustness leg 2: malformed records under PERMISSIVE mode. Bad rows
# land in the corrupt-record column instead of failing the job.
# --------------------------------------------------------------------------

_QCSVM_ORACLE = """
WITH src AS (
  SELECT doc_id,
         doc_id % 7 = 3 AS is_bad
  FROM documents WHERE doc_id < 300
)
SELECT CAST(SUM(CASE WHEN is_bad THEN 0 ELSE 1 END) AS BIGINT) AS n_good,
       CAST(SUM(CASE WHEN is_bad THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
       CAST(SUM(CASE WHEN is_bad THEN 0 ELSE doc_id * 2 END) AS BIGINT)
         AS good_value_sum
FROM src
"""


@register(
    "q_source_csv_malformed",
    oracle=_QCSVM_ORACLE,
    description=(
        "PERMISSIVE CSV ingest: deterministic malformed lines are "
        "captured in the _corrupt_record column (job survives, bad rows "
        "quarantined and counted)"
    ),
    tags=("source", "csv", "malformed", "data_quality"),
)
def q_source_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest-robustness contract: a feed with broken lines must not
    kill the job — PERMISSIVE mode parses what it can and quarantines
    the rest in ``columnNameOfCorruptRecord``. Lines are written
    executor-side (foreachPartition); every ``doc_id % 7 == 3`` line is
    deterministically malformed (non-numeric id field + wrong arity),
    so good/corrupt counts and the good-row value sum are closed-form
    for the oracle. A malformed line slipping through as parsed (or a
    good line misread) breaks the hash."""
    import os as _os

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    path = _tmpdir("csvm")
    _os.makedirs(path, exist_ok=True)

    def _write_partition(rows) -> None:
        import os

        pid = None
        fh = None
        for r in rows:
            if fh is None:
                pid = os.getpid()
                fh = open(
                    os.path.join(path, f"part-{pid}-{r.doc_id}.csv"), "w"
                )
            if r.doc_id % 7 == 3:
                fh.write(f"not_a_number,{r.doc_id}\n")  # bad type + arity
            else:
                fh.write(f"{r.doc_id},{r.doc_id * 2},ok\n")
        if fh is not None:
            fh.close()

    d.select("doc_id").foreachPartition(_write_partition)
    back = (
        spark.read.schema(
            "id long, value long, status string, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    back = back.cache()  # corrupt-record column requires a materialized read
    return back.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1))
        .cast("long")
        .alias("n_good"),
        F.count(F.col("_corrupt_record")).cast("long").alias("n_corrupt"),
        F.sum(
            F.when(F.col("_corrupt_record").isNull(), F.col("value")).otherwise(
                0
            )
        )
        .cast("long")
        .alias("good_value_sum"),
    )
