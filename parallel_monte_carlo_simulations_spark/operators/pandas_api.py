"""Arrow-batched Python API surface: ``pandas_udf`` (vectorized scalar),
``applyInPandas`` (grouped map), grouped-agg pandas UDF.

This is the engine's UDF story (SURVEY.md §2.B "UDF/UDAF/UDTF surface"):
row-at-a-time Python UDFs are banned from hot paths; everything Python
crosses the JVM boundary as Arrow record batches. Queries return integer/
string results so the DuckDB oracles hash-match exactly (no float-path
divergence between numpy and the SQL engines).

UDFs are constructed inside the query functions — ``pandas_udf`` parses
its DDL return type against the active session, so module import must
stay session-free.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import register
from ..tables import table

# --------------------------------------------------------------------------
# Vectorized scalar pandas UDF: token/char counting via pandas str ops.
# --------------------------------------------------------------------------

_QPUDF_ORACLE = """
SELECT
  doc_id,
  CAST(len(string_split(text, ' ')) AS INTEGER)   AS n_tokens_udf,
  CAST(length(replace(text, ' ', '')) AS INTEGER) AS n_nonspace_chars
FROM documents
"""


@register(
    "q_pandas_udf_scalar",
    oracle=_QPUDF_ORACLE,
    description="vectorized scalar pandas_udf (Arrow batches) vs SQL oracle",
    tags=("udf", "pandas_udf", "arrow"),
)
def q_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("int")
    def token_count(texts: pd.Series) -> pd.Series:
        # literal-space split == Spark split(text,' ') == DuckDB string_split
        return texts.str.split(" ").map(len).astype("int32")

    @pandas_udf("int")
    def nonspace_chars(texts: pd.Series) -> pd.Series:
        return texts.str.replace(" ", "", regex=False).str.len().astype("int32")

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens_udf"),
        nonspace_chars("text").alias("n_nonspace_chars"),
    )


# --------------------------------------------------------------------------
# Grouped map (applyInPandas): per-group top-2 by price, pure-int output.
# --------------------------------------------------------------------------

_QAPPLY_ORACLE = """
SELECT o_custkey, o_orderkey, rk
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS INTEGER) AS rk
  FROM orders
)
WHERE rk <= 2
"""


def _top2(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(2)
    out = out.reset_index(drop=True)
    out["rk"] = (out.index + 1).astype("int32")
    return out[["o_custkey", "o_orderkey", "rk"]]


@register(
    "q_apply_in_pandas_topk",
    oracle=_QAPPLY_ORACLE,
    description="applyInPandas grouped map: per-customer top-2 orders",
    tags=("udf", "applyInPandas", "grouped_map"),
)
def q_apply_in_pandas_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return o.groupBy("o_custkey").applyInPandas(
        _top2, schema="o_custkey long, o_orderkey long, rk int"
    )


# --------------------------------------------------------------------------
# Grouped-agg pandas UDF: integer median per group (UDAF surface).
# --------------------------------------------------------------------------

_QGAGG_ORACLE = """
SELECT
  l_returnflag,
  CAST(median(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS median_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "q_pandas_grouped_agg_median",
    oracle=_QGAGG_ORACLE,
    description="grouped-agg pandas UDF (vectorized UDAF): per-flag median",
    tags=("udf", "udaf", "grouped_agg"),
)
def q_pandas_grouped_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def int_median(qty: pd.Series) -> float:
        # quantities are integral doubles; discrete median of int64s is
        # exact in both numpy and DuckDB (mean-of-middle-two convention)
        return float(qty.astype("int64").median())

    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        int_median("l_quantity").alias("median_qty")
    )
