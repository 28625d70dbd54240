"""Remaining surface: percent_rank/cume_dist windows, explicit cross
join, Python UDTF (table function), seeded sampling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
  ROUND(percent_rank() OVER w, 6) AS pct_rank,
  ROUND(cume_dist()    OVER w, 6) AS cume,
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
    s = table(spark, sf_dir, "supplier")
    w = Window.orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
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
# Seeded sampling — engine-specific RNG, so rows-only: the driver checks
# it runs; tests assert the sampled fraction is plausible and that the
# same seed reproduces the same sample.
# --------------------------------------------------------------------------


@register(
    "q_sample_seeded",
    oracle=None,
    description="Bernoulli sample(0.1, seed=42): reproducible subset",
    tags=("sample",),
)
def q_sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.sample(fraction=0.1, seed=42).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@register(
    "q_sample_stratified",
    oracle=None,  # engine-specific RNG; fraction plausibility tested
    description="stratified sampleBy: per-stratum fractions, seeded",
    tags=("sample", "stratified"),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum sampling rates — the curation move that rebalances a
    corpus (e.g. downsample boilerplate-heavy sources, keep rare ones).
    sampleBy pushes the per-key Bernoulli filter into the scan: no
    shuffle, no materialized intermediate at 100 TB."""
    o = table(spark, sf_dir, "orders")
    fractions = {"1-URGENT": 0.5, "2-HIGH": 0.25, "3-MEDIUM": 0.1,
                 "4-NOT SPECIFIED": 0.05, "5-LOW": 0.02}
    return o.stat.sampleBy("o_orderpriority", fractions, seed=42).select(
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
