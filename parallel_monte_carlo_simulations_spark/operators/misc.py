"""Remaining surface: percent_rank/cume_dist windows, explicit cross
join, Python UDTF (table function), seeded sampling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

# --------------------------------------------------------------------------
# percent_rank / cume_dist: rank fractions (exact rational -> double).
# --------------------------------------------------------------------------

_QPR_ORACLE = """
SELECT
  s_suppkey,
  s_nationkey,
  FLOOR((percent_rank() OVER w) * 1e6 + 0.5) / 1e6 AS pct_rank,
  FLOOR((cume_dist()    OVER w) * 1e6 + 0.5) / 1e6 AS cume,
FROM supplier
WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
"""


@register(
    "q_window_percent_rank",
    oracle=_QPR_ORACLE,
    description="percent_rank + cume_dist over global ordering",
    tags=("window", "rank"),
)
def q_window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist from the range-bucketed rank kernel
    (round 11): the (s_acctbal, s_suppkey) order key is UNIQUE, so
    rank == row_number == rn and percent_rank = (rn-1)/(n-1),
    cume_dist = rn/n — bit-identical to the oracle's window form with
    no single-partition sort."""
    from .rankstats import bucketed_running

    s = table(spark, sf_dir, "supplier")
    nt = s.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    ranked = bucketed_running(
        s.select("s_suppkey", "s_nationkey", "s_acctbal"),
        axis="s_acctbal",
        order=[F.asc("s_acctbal"), F.asc("s_suppkey")],
        cums={"rn": F.lit(1)},
    )
    return ranked.crossJoin(F.broadcast(nt)).select(
        "s_suppkey",
        "s_nationkey",
        (F.floor(((F.col("rn") - 1).cast("double") / (F.col("n_all") - 1)) * 1e6 + 0.5) / 1e6).alias("pct_rank"),
        (F.floor((F.col("rn").cast("double") / F.col("n_all")) * 1e6 + 0.5) / 1e6).alias("cume"),
    )


# --------------------------------------------------------------------------
# Explicit cross join (bounded sides only!).
# --------------------------------------------------------------------------

_QCROSS_ORACLE = """
SELECT a.r_name AS region_a, b.r_name AS region_b
FROM region a CROSS JOIN region b
WHERE a.r_regionkey <> b.r_regionkey
"""


@register(
    "q_join_cross",
    oracle=_QCROSS_ORACLE,
    description="explicit cross join of two bounded dims",
    tags=("join", "cross"),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    a = r.alias("a")
    b = r.alias("b")
    return (
        a.crossJoin(b)
        .where(F.col("a.r_regionkey") != F.col("b.r_regionkey"))
        .select(
            F.col("a.r_name").alias("region_a"), F.col("b.r_name").alias("region_b")
        )
    )


# --------------------------------------------------------------------------
# Python UDTF: table-valued function emitting (token, pos) rows.
# --------------------------------------------------------------------------

_QUDTF_ORACLE = """
SELECT doc_id, toks[i] AS token, CAST(i - 1 AS INTEGER) AS pos
FROM (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE doc_id < 20
), LATERAL (SELECT unnest(generate_series(1, 5)) AS i)
WHERE i <= len(toks)
"""


@register(
    "q_udtf_tokenize",
    oracle=_QUDTF_ORACLE,
    description="Python UDTF (lateral table function): first-5 token rows",
    tags=("udf", "udtf"),
)
def q_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int")
    class HeadTokens:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")[:5]):
                yield tok, i

    spark.udtf.register("head_tokens", HeadTokens)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM documents_udtf d, LATERAL head_tokens(d.text) t
        WHERE d.doc_id < 20
        """
    )


# --------------------------------------------------------------------------
# Seeded sampling — hash-bucket Bernoulli: the sample membership of a row
# is md5(key || ':' || seed) mod 1000 < rate, so the EXACT inventory is
# reproducible across engines, retries, partitionings, and cluster sizes
# (native .sample() re-draws per task attempt and is engine-private RNG —
# unusable both as a correctness oracle and as a stable 100 TB sample).
# The filter is a pure row-local expression: pushed to the scan, no
# shuffle, no state.
# --------------------------------------------------------------------------


def _hash_bucket(key_col: str, seed: int):
    """md5-derived bucket in [0, 1000) — byte-identical in Spark & DuckDB."""
    h = F.md5(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(str(seed))))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 1000


_QSAMPLE_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
WHERE ('0x' || substr(md5(o_orderkey::VARCHAR || ':42'), 1, 8))::BIGINT % 1000 < 100
"""


@register(
    "q_sample_seeded",
    oracle=_QSAMPLE_ORACLE,
    description="seeded 10% Bernoulli sample via deterministic hash bucket",
    tags=("sample",),
)
def q_sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.filter(_hash_bucket("o_orderkey", 42) < 100).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


_QSTRAT_ORACLE = """
SELECT o_orderkey, o_orderpriority
FROM orders
WHERE ('0x' || substr(md5(o_orderkey::VARCHAR || ':42'), 1, 8))::BIGINT % 1000 <
  CASE o_orderpriority
    WHEN '1-URGENT' THEN 500 WHEN '2-HIGH' THEN 250 WHEN '3-MEDIUM' THEN 100
    WHEN '4-NOT SPECIFIED' THEN 50 ELSE 20 END
"""


@register(
    "q_sample_stratified",
    oracle=_QSTRAT_ORACLE,
    description="stratified per-priority sampling rates via hash bucket",
    tags=("sample", "stratified"),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum sampling rates — the curation move that rebalances a
    corpus (e.g. downsample boilerplate-heavy sources, keep rare ones).
    The per-key threshold is a broadcast-free CASE on the stratum column;
    the whole operator stays a scan-level filter at 100 TB."""
    o = table(spark, sf_dir, "orders")
    rates = {"1-URGENT": 500, "2-HIGH": 250, "3-MEDIUM": 100,
             "4-NOT SPECIFIED": 50, "5-LOW": 20}
    threshold = F.when(F.col("o_orderpriority") == "1-URGENT", rates["1-URGENT"])
    for k in ("2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED"):
        threshold = threshold.when(F.col("o_orderpriority") == k, rates[k])
    threshold = threshold.otherwise(rates["5-LOW"])
    return o.filter(_hash_bucket("o_orderkey", 42) < threshold).select(
        "o_orderkey", "o_orderpriority"
    )


# --------------------------------------------------------------------------
# HLL sketches as mergeable state: per-group sketch -> union -> estimate.
# The production pattern for incremental distinct counts (store sketch
# bytes per partition/day, merge on read) — a capability plain
# approx_count_distinct (one-shot) doesn't give you.
# --------------------------------------------------------------------------


@register(
    "q_hll_sketch_merge",
    oracle=None,  # estimator-specific values; exactness checked in test
    description="HLL sketch per status, union-merged to a global estimate",
    tags=("distinct", "approx", "sketch", "hll"),
)
def q_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    per_status = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    merged = per_status.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_customers"),
        F.sum("n_orders").alias("n_orders_total"),
    )
    return merged


# --------------------------------------------------------------------------
# Polymorphic UDTF (Spark 4): the output schema is COMPUTED by analyze()
# from a constant argument — the table-function counterpart of generics.
# --------------------------------------------------------------------------

_QUDTF_POLY_ORACLE = """
SELECT doc_id,
       toks[1] AS c0,
       toks[2] AS c1,
       toks[3] AS c2
FROM (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE doc_id < 20
)
"""


@register(
    "q_udtf_polymorphic",
    oracle=_QUDTF_POLY_ORACLE,
    description=(
        "polymorphic Python UDTF: analyze() derives the output schema "
        "(c0..c{n-1}) from a constant argument at plan time — Spark 4 "
        "dynamic table-function typing"
    ),
    tags=("udf", "udtf", "polymorphic", "spark4"),
)
def q_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SplitFixed:
        """First-n tokens as n typed columns; n fixes the schema."""

        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            assert n.isConstantExpression, "n must be a literal"
            width = int(n.value)
            return AnalyzeResult(
                StructType(
                    [
                        StructField(f"c{i}", StringType())
                        for i in range(width)
                    ]
                )
            )

        def eval(self, text: str, n: int):
            toks = text.split(" ")[:n]
            yield tuple(toks[i] if i < len(toks) else None for i in range(n))

    spark.udtf.register("split_fixed", SplitFixed)
    table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_udtf_poly"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.c0, t.c1, t.c2
        FROM documents_udtf_poly d, LATERAL split_fixed(d.text, 3) t
        WHERE d.doc_id < 20
        """
    )
