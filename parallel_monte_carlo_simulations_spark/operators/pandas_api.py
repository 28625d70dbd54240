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


_QCOGROUP_ORACLE = """
WITH ev AS (
  SELECT user_id AS key, COUNT(*) AS n_events,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
           AS event_value
  FROM events GROUP BY user_id
),
od AS (
  SELECT o_custkey AS key, COUNT(*) AS n_orders,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2)
           AS order_value
  FROM orders WHERE o_custkey <= 150 GROUP BY o_custkey
)
SELECT COALESCE(ev.key, od.key) AS key,
       CAST(COALESCE(ev.n_events, 0) AS BIGINT) AS n_events,
       COALESCE(ev.event_value, 0.0)  AS event_value,
       CAST(COALESCE(od.n_orders, 0) AS BIGINT) AS n_orders,
       COALESCE(od.order_value, 0.0)  AS order_value
FROM ev FULL OUTER JOIN od ON ev.key = od.key
"""


@register(
    "q_cogroup_apply_in_pandas",
    oracle=_QCOGROUP_ORACLE,
    description="cogrouped applyInPandas: per-key merge of two grouped frames",
    tags=("udf", "cogroup", "applyInPandas"),
)
def q_cogroup_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby().cogroup().applyInPandas — the API for custom per-key
    merges of two datasets (as-of merges, interval alignment, custom
    reconciliation) when no built-in join expresses the logic. Both
    sides shuffle once on the key; each task sees the key's two pandas
    frames. The oracle is a full-outer aggregate join — proof this
    custom operator reduces to relational semantics on this input."""
    e = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"), "value"
    )
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 150).select(
        F.col("o_custkey").alias("key"), "o_totalprice"
    )

    def merge(evs: pd.DataFrame, ods: pd.DataFrame) -> pd.DataFrame:
        key = evs["key"].iloc[0] if len(evs) else ods["key"].iloc[0]

        def _cents_sum(s: pd.Series) -> float:
            # exact integer cents (inputs are 2-decimal money), so the
            # sum is order-independent and mirrors the oracle's decimal
            # sum (r12 float discipline, see streaming/windows.py)
            return int(s.mul(100).round().sum()) / 100.0

        return pd.DataFrame(
            {
                "key": [int(key)],
                "n_events": [len(evs)],
                "event_value": [_cents_sum(evs["value"]) if len(evs) else 0.0],
                "n_orders": [len(ods)],
                "order_value": [
                    _cents_sum(ods["o_totalprice"]) if len(ods) else 0.0
                ],
            }
        )

    return (
        e.groupby("key")
        .cogroup(o.groupby("key"))
        .applyInPandas(
            merge,
            schema="key long, n_events long, event_value double, "
            "n_orders long, order_value double",
        )
    )


_QMAPARROW_ORACLE = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_actual
FROM documents WHERE doc_id < 100
"""


@register(
    "q_map_in_arrow",
    oracle=_QMAPARROW_ORACLE,
    description="mapInArrow: zero-copy RecordBatch transform (token counts)",
    tags=("udf", "arrow", "mapInArrow"),
)
def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow is the lowest-overhead Python hook: raw pyarrow
    RecordBatches, no pandas conversion on either side — the right
    surface for byte-shuffling transforms (tokenizers, codecs) where
    pandas object-dtype overhead dominates. Compute stays columnar."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).select(
        "doc_id", "text"
    )

    def count_tokens(batches):
        for batch in batches:
            text = batch.column("text")
            toks = pc.split_pattern(text, " ")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.list_value_length(toks), pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                ],
                names=["doc_id", "n_tokens", "n_chars_actual"],
            )

    return d.mapInArrow(
        count_tokens, schema="doc_id long, n_tokens long, n_chars_actual long"
    )
