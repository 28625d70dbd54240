"""XML source/sink roundtrip (native Spark 4 ``xml`` format).

Spark 4 absorbed the spark-xml connector as a built-in data source, so
semi-structured XML feeds (the classic enterprise interchange format)
read and write without extra packages: ``rowTag`` scopes each record,
schema inference or explicit schemas work like JSON, and scans
parallelize by file split. The roundtrip query serializes a documents
slice through XML and re-aggregates; the oracle reads the original
parquet, so any escaping/whitespace loss in the XML layer breaks the
hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .roundtrip import _tmpdir

_QXML_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT)          AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
       CAST(SUM(n_chars) AS BIGINT)      AS n_chars_meta
FROM documents
WHERE doc_id % 4 = 2
GROUP BY lang
"""


@register(
    "q_source_xml_roundtrip",
    oracle=_QXML_ORACLE,
    description=(
        "XML sink+source roundtrip (native Spark 4 xml format, rowTag "
        "records) feeding an aggregate"
    ),
    tags=("source", "sink", "xml"),
)
def q_source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 2)
        .select("doc_id", "lang", "text", "n_chars")
    )
    path = _tmpdir("xml")
    (
        d.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "documents")
        .option("rowTag", "document")
        .save(path)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "document")
        # Spark 4 defaults ignoreSurroundingSpaces=true, which would trim
        # leading/trailing whitespace off element text on read-back and
        # break the byte-exact length oracle for whitespace-bearing docs.
        .option("ignoreSurroundingSpaces", "false")
        .schema("doc_id long, lang string, text string, n_chars long")
        .load(path)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
        F.sum("n_chars").cast("long").alias("n_chars_meta"),
    )
