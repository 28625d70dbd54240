"""Parquet table access for the driver-generated TPC-H-ish star schema.

Tables per TESTDATA.md / FIXTURES.md §A. All reads go through
``table()`` so predicate pushdown / column pruning reach the parquet
scan (verify with ``df.explain("formatted")`` — PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always be on the broadcast side of a
#: join, at any scale factor (region=5 rows, nation=25 rows always; the
#: others grow sub-linearly vs. the fact tables).
BROADCAST_DIMS = ("region", "nation", "supplier", "part", "customer")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet has shipped with two physical ``ts`` encodings
    across driver testdata generations, so normalize adaptively:

    - TIMESTAMP(NANOS): the Spark parquet reader rejects it unless nanos
      surface as longs; convert to micros with exact integer division (a
      double division would lose precision above 2^53 nanos ≈ 1970+104
      days). DuckDB truncates NS→US the same way.
    - timestamp[us] (current generation): reads natively as
      TIMESTAMP_NTZ; cast to session-tz TIMESTAMP (session tz is pinned
      UTC) so downstream window/watermark/date code sees the same type
      the nanos path produced.
    """
    from .session import ensure_nanos_as_long

    ensure_nanos_as_long(spark)
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return df.withColumn("ts", _normalize_ts(df))


def _normalize_ts(df: DataFrame):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dtype = df.schema["ts"].dataType
    if isinstance(dtype, T.LongType):  # nanos-as-long legacy encoding
        return F.timestamp_micros(F.expr("ts DIV 1000"))
    return F.col("ts").cast(T.TimestampType())


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so spark.sql() queries work."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
