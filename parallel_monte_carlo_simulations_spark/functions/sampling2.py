"""Sampling, round-10 additions: self-normalized importance reweighting
and deterministic class balancing.

Two estimators a data-mix pipeline runs constantly:

- **SNIS reweighting**: the corpus was collected under one source mix
  but the target mix is different (e.g. uniform across sources) —
  estimate target-distribution statistics WITHOUT resampling, via
  self-normalized importance weights w = target_share / empirical_share.
- **Class balancing**: downsample every class to the minority count
  with a DETERMINISTIC hash order (not rand()), so the balanced set is
  reproducible across runs and engines — the label-balance step before
  training a quality classifier.

Both are one-two aggregations; weights quantize to DECIMAL before any
cross-row sum (house float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60, sql_hash60
from ..registry import register
from ..tables import table

# --------------------------------------------------------------------------
# SNIS: estimate mean doc length under a UNIFORM source mix.
# --------------------------------------------------------------------------

_QSNIS_ORACLE = """
WITH per_source AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_s) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM per_source
),
weighted AS (
  SELECT d.doc_id, d.n_chars,
         (CAST(t.n AS DOUBLE) / t.k) / p.n_s AS w
  FROM documents d
  JOIN per_source p USING (source) CROSS JOIN tot t
),
q AS (
  SELECT CAST(FLOOR((w) * 1e10 + 0.5) / 1e10 AS DECIMAL(24,10))            AS wq,
         CAST(FLOOR((w * n_chars) * 1e6 + 0.5) / 1e6 AS DECIMAL(28,6))    AS wxq
  FROM weighted
)
SELECT CAST((SELECT n FROM tot) AS BIGINT)              AS n_docs,
       FLOOR((CAST(SUM(wq) AS DOUBLE)) * 1e4 + 0.5) / 1e4                AS sum_weights,
       FLOOR((CAST(SUM(wxq) AS DOUBLE)
             / CAST(SUM(wq) AS DOUBLE)) * 1e6 + 0.5) / 1e6              AS snis_mean_chars,
       FLOOR(((SELECT SUM(n_chars) * 1.0 / COUNT(*) FROM documents)) * 1e6 + 0.5) / 1e6
                                                        AS empirical_mean_chars
FROM q
"""


@register(
    "q_sample_importance_snis",
    oracle=_QSNIS_ORACLE,
    description=(
        "self-normalized importance sampling: estimate mean document "
        "length under a UNIFORM target source mix from the biased "
        "corpus, w = (1/k)/(n_s/n) per source, SNIS = Σwx/Σw — the "
        "reweighting estimator a mixing pipeline uses before "
        "committing to a resample; DECIMAL-quantized weight sums"
    ),
    tags=("sampling", "importance", "mixing", "curation", "llm-pipeline"),
)
def q_sample_importance_snis(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_s")
    )
    tot = per_source.agg(
        F.sum("n_s").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    w = (F.col("n").cast("double") / F.col("k")) / F.col("n_s")
    weighted = (
        d.select("doc_id", "n_chars", "source")
        .join(F.broadcast(per_source), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            (F.floor((w) * 1e10 + 0.5) / 1e10).cast("decimal(24,10)").alias("wq"),
            (F.floor((w * F.col("n_chars")) * 1e6 + 0.5) / 1e6).cast("decimal(28,6)").alias("wxq"),
            "n",
            "n_chars",
        )
    )
    return weighted.agg(
        F.any_value("n").cast("long").alias("n_docs"),
        (F.floor((F.sum("wq").cast("double")) * 1e4 + 0.5) / 1e4).alias("sum_weights"),
        (F.floor((F.sum("wxq").cast("double") / F.sum("wq").cast("double")) * 1e6 + 0.5) / 1e6).alias("snis_mean_chars"),
        (F.floor((F.sum("n_chars") * 1.0 / F.count(F.lit(1))) * 1e6 + 0.5) / 1e6).alias(
            "empirical_mean_chars"
        ),
    )


# --------------------------------------------------------------------------
# Deterministic class balancing: downsample each lang to the minority.
# --------------------------------------------------------------------------

_HASH_SQL = sql_hash60("'bal:' || CAST(doc_id AS VARCHAR)")

_QBALANCE_ORACLE = f"""
WITH sized AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
floor_n AS (SELECT MIN(n_docs) AS k FROM sized),
ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY {_HASH_SQL}, doc_id) AS rk
  FROM documents
),
kept AS (
  SELECT r.lang, r.n_chars FROM ranked r CROSS JOIN floor_n f
  WHERE r.rk <= f.k
)
SELECT s.lang,
       s.n_docs AS docs_before,
       CAST(COUNT(k.lang) AS BIGINT) AS docs_after,
       CAST(SUM(k.n_chars) AS BIGINT) AS chars_after
FROM sized s LEFT JOIN kept k ON k.lang = s.lang
GROUP BY s.lang, s.n_docs
"""


@register(
    "q_sample_balanced_classes",
    oracle=_QBALANCE_ORACLE,
    description=(
        "deterministic class balancing: downsample every language class "
        "to the minority-class count, selecting members by a seeded "
        "60-bit hash order (reproducible across runs/engines, unlike "
        "rand()) — one rank window per class, the label-balance step "
        "before classifier training"
    ),
    tags=("sampling", "balance", "curation", "llm-pipeline"),
)
def q_sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    sized = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    floor_n = sized.agg(F.min("n_docs").alias("k"))
    h = hash60(F.concat(F.lit("bal:"), F.col("doc_id").cast("string")))
    # per-language rank via the range-bucketed kernel (round 11):
    # |langs|-way window parallelism over the corpus is the same
    # straggler as an empty partition spec, just K-way.
    from ..operators.rankstats import bucketed_running

    ranked = bucketed_running(
        d.select("doc_id", "lang", "n_chars", h.alias("hk")),
        axis="hk",
        order=[F.col("hk").asc(), F.col("doc_id").asc()],
        cums={"rk": F.lit(1)},
        partition_by=("lang",),
    ).select("doc_id", "lang", "n_chars", "rk")
    kept = ranked.crossJoin(F.broadcast(floor_n)).filter(
        F.col("rk") <= F.col("k")
    )
    return (
        sized.join(
            kept.groupBy("lang").agg(
                F.count(F.lit(1)).cast("long").alias("docs_after"),
                F.sum("n_chars").cast("long").alias("chars_after"),
            ),
            "lang",
            "left",
        )
        .select(
            "lang",
            F.col("n_docs").alias("docs_before"),
            F.coalesce(F.col("docs_after"), F.lit(0)).cast("long").alias(
                "docs_after"
            ),
            F.coalesce(F.col("chars_after"), F.lit(0)).cast("long").alias(
                "chars_after"
            ),
        )
    )


# --------------------------------------------------------------------------
# Deterministic source interleaving: the training-order schedule.
# --------------------------------------------------------------------------

_QINTERLEAVE_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY {_HASH_SQL}, doc_id) AS rn
  FROM documents
),
src_rank AS (
  SELECT source,
         ROW_NUMBER() OVER (ORDER BY source) AS sr,
         COUNT(*) OVER () AS n_sources
  FROM (SELECT DISTINCT source FROM documents)
)
SELECT r.doc_id, r.source,
       CAST((r.rn - 1) * s.n_sources + s.sr AS BIGINT) AS global_pos
FROM ranked r JOIN src_rank s USING (source)
WHERE (r.rn - 1) * s.n_sources + s.sr <= 200
"""


@register(
    "q_dataset_interleave",
    oracle=_QINTERLEAVE_ORACLE,
    description=(
        "deterministic source interleaving: round-robin the sources "
        "(seeded-hash order within each source) into one global "
        "training-order schedule — the data-ordering step that keeps "
        "every micro-batch source-balanced; first 200 positions emitted"
    ),
    tags=("sampling", "ordering", "curation", "llm-pipeline"),
)
def q_dataset_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """global_pos = (rank_within_source - 1) * n_sources + source_rank:
    a pure function of two window ranks — one shuffle per window, no
    global sort of the corpus; the LIMIT-equivalent filter keeps the
    output schedule-prefix-sized."""
    d = table(spark, sf_dir, "documents")
    h = hash60(F.concat(F.lit("bal:"), F.col("doc_id").cast("string")))
    # per-source rank via the range-bucketed kernel (round 11): the
    # handful of sources would otherwise cap window parallelism at
    # |sources| over the whole corpus.
    from ..operators.rankstats import bucketed_running

    ranked = bucketed_running(
        d.select("doc_id", "source", h.alias("hk")),
        axis="hk",
        order=[F.col("hk").asc(), F.col("doc_id").asc()],
        cums={"rn": F.lit(1)},
        partition_by=("source",),
    ).select("doc_id", "source", "rn")
    srcs = d.select("source").distinct()
    src_rank = srcs.select(
        "source",
        F.row_number().over(Window.orderBy("source")).alias("sr"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_sources"),
    )
    pos = (F.col("rn") - 1) * F.col("n_sources") + F.col("sr")
    return (
        ranked.join(F.broadcast(src_rank), "source")
        .filter(pos <= 200)
        .select("doc_id", "source", pos.cast("long").alias("global_pos"))
    )
