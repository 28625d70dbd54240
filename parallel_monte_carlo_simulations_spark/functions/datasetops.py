"""Dataset-assembly operators: the last mile of a training-data
pipeline after curation — benchmark-contamination screening,
sequence packing into fixed token budgets, and the deterministic
train/val/test split.

All three are pure built-in plans; the split reuses the md5-bucket
trick that is byte-identical across Spark and DuckDB, so even the
"random" split is exactly oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..dedup.ngram import shingle_sets, sql_shingles
from ..registry import register
from ..tables import table

_BENCH_MOD = 11  # doc_id % 11 == 0 plays the held-out benchmark set
#  (scattered through the id space; yields real matches at sf0.001 AND sf0.01,
#   so the driver row is never a vacuous 0-vs-0)
_SPAN_W = 8

_QCONTAM_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, unnest({sql_shingles("text", _SPAN_W)}) AS span
  FROM documents
),
bench AS (SELECT doc_id AS bench_doc, span FROM sh WHERE doc_id % {_BENCH_MOD} = 0),
corpus AS (SELECT doc_id AS corpus_doc, span FROM sh WHERE doc_id % {_BENCH_MOD} <> 0)
SELECT b.bench_doc, c.corpus_doc,
       CAST(COUNT(*) AS BIGINT) AS n_shared_spans
FROM bench b JOIN corpus c ON b.span = c.span
GROUP BY b.bench_doc, c.corpus_doc
"""


@register(
    "q_contamination_check",
    oracle=_QCONTAM_ORACLE,
    description=(
        f"benchmark contamination screen: {_SPAN_W}-token spans of the "
        "held-out set matched against the training corpus"
    ),
    tags=("curation", "contamination", "dedup", "spans"),
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination (the screen run before any benchmark
    number is reported): every 8-token span of the held-out documents is
    matched exactly against the training corpus's spans, yielding
    (benchmark doc, training doc, shared-span count) pairs to purge.
    The benchmark side is tiny by construction — broadcast — so the
    corpus never shuffles for the probe; at 100 TB hash the spans to
    64-bit keys first (same note as substring dedup)."""
    sh = shingle_sets(spark, sf_dir, width=_SPAN_W).select(
        "doc_id", F.col("shingle").alias("span")
    )
    bench = sh.filter(F.col("doc_id") % _BENCH_MOD == 0).withColumnRenamed(
        "doc_id", "bench_doc"
    )
    corpus = sh.filter(F.col("doc_id") % _BENCH_MOD != 0).withColumnRenamed(
        "doc_id", "corpus_doc"
    )
    return (
        corpus.join(F.broadcast(bench), "span")
        .groupBy("bench_doc", "corpus_doc")
        .agg(F.count("*").cast("long").alias("n_shared_spans"))
    )


_PACK_BUDGET = 512

_QPACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT lang, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
  FROM toks
)
SELECT lang,
       CAST(floor((cum - n_tokens) / {_PACK_BUDGET}.0) AS BIGINT) AS bin_id,
       CAST(COUNT(*) AS BIGINT)      AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM packed
GROUP BY lang, floor((cum - n_tokens) / {_PACK_BUDGET}.0)
"""


@register(
    "q_sequence_packing",
    oracle=_QPACK_ORACLE,
    description=(
        f"sequence packing: stream-order docs into {_PACK_BUDGET}-token "
        "training bins per language (running-sum window assignment)"
    ),
    tags=("curation", "packing", "window", "tokens"),
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: documents stream in deterministic order
    per language and each doc lands in the bin where its first token
    falls (floor of the preceding token count / budget) — the
    contiguous-stream chunking used to build fixed-length training
    sequences. One running-sum window per language; bin stats show the
    packing efficiency. A boundary-aware first-fit packer needs state
    (applyInPandasWithState territory); the streaming-chunk form is the
    oracle-checkable one."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias(
            "n_tokens"
        ),
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    packed = toks.withColumn("cum", F.sum("n_tokens").over(w))
    bin_id = F.floor((F.col("cum") - F.col("n_tokens")) / float(_PACK_BUDGET))
    return (
        packed.groupBy("lang", bin_id.cast("long").alias("bin_id"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("bin_tokens"),
        )
    )


_SPLIT_SEED = 7


def _split_bucket(key_col: str):
    h = F.md5(
        F.concat_ws(":", F.col(key_col).cast("string"), F.lit(str(_SPLIT_SEED)))
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 1000


_QSPLIT_ORACLE = f"""
WITH b AS (
  SELECT doc_id, lang, n_chars,
         ('0x' || substr(md5(doc_id::VARCHAR || ':{_SPLIT_SEED}'), 1, 8))::BIGINT
           % 1000 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 900 THEN 'train'
            WHEN bucket < 950 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       CAST(COUNT(*) AS BIGINT)      AS n_docs,
       CAST(SUM(n_chars) AS BIGINT)  AS total_chars
FROM b
GROUP BY 1, lang
"""


@register(
    "q_dataset_split",
    oracle=_QSPLIT_ORACLE,
    description=(
        "deterministic 90/5/5 train/val/test split via md5 bucket, "
        "per-language composition report"
    ),
    tags=("curation", "split", "sample"),
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The split every dataset card reports: membership is a pure
    function of (doc_id, seed) via the cross-engine-identical md5
    bucket, so it is stable under reruns, additions, and repartitioning
    — no randomness to leak between splits. Output is the per-split
    per-language composition; the split column itself is the operator."""
    d = table(spark, sf_dir, "documents")
    bucket = _split_bucket("doc_id")
    split = (
        F.when(bucket < 900, "train").when(bucket < 950, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
