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
    # per-language running token sum via the range-bucketed kernel
    # (round 11): a |langs|-partition window serializes the corpus
    # through a handful of tasks at scale.
    from ..operators.rankstats import bucketed_running

    packed = bucketed_running(
        toks,
        axis="doc_id",
        order=[F.col("doc_id").asc()],
        cums={"cum": F.col("n_tokens")},
        partition_by=("lang",),
    )
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


# --- round 5: Gopher-style repetition signal + domain re-mixing -------------

_REP_W = 3        # word n-gram width for the repetition signal
_REP_MIN = 20     # ignore docs with fewer shingles (ratio too noisy)

_QREP_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, unnest({sql_shingles("text", _REP_W)}) AS shingle
  FROM documents
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_distinct
  FROM sh
  GROUP BY doc_id
  HAVING COUNT(*) >= {_REP_MIN}
)
SELECT doc_id, n_shingles, n_distinct,
       FLOOR((1.0e0 - CAST(n_distinct AS DOUBLE) / n_shingles) * 1000000
             + 0.5e0) / 1000000 AS dup_ratio
FROM per_doc
"""


@register(
    "q_text_repetition_ratio",
    oracle=_QREP_ORACLE,
    description=(
        "Gopher-style intra-document repetition signal: fraction of word "
        f"{_REP_W}-gram occurrences that are repeats (1 - distinct/total) "
        "per document — the curation filter that catches boilerplate and "
        "template spam"
    ),
    tags=("text", "curation", "quality", "repetition"),
)
def q_text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The duplicated-n-gram fraction from the Gopher quality rules
    (Rae et al., 2021, arXiv:2112.11446 — "repetition" filters): high
    values flag boilerplate/template documents that length or stopword
    heuristics miss. One posexplode + lead window per doc (O(tokens)),
    one groupBy — the count pass is partial-aggregated; at 100 TB this
    is a single shuffle on doc_id, same as every other per-doc signal."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = ["tok"] + [F.lead("tok", i).over(w) for i in range(1, _REP_W)]
    sh = (
        toks.select(
            "doc_id",
            F.concat_ws(" ", *leads).alias("shingle"),
            F.lead("tok", _REP_W - 1).over(w).alias("_tl"),
        )
        .filter(F.col("_tl").isNotNull())
        .select("doc_id", "shingle")
    )
    per_doc = (
        sh.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.count_distinct("shingle").cast("long").alias("n_distinct"),
        )
        .filter(F.col("n_shingles") >= _REP_MIN)
    )
    ratio = 1.0 - F.col("n_distinct").cast("double") / F.col("n_shingles")
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_distinct",
        (F.floor(ratio * 1_000_000 + 0.5) / 1_000_000).alias("dup_ratio"),
    )


#: Target per-language keep rates for the mixing demo — the knob a real
#: pipeline turns to hit a target language (or domain) distribution.
_MIX_RATES = (("en", 1.0), ("de", 0.8), ("fr", 0.8), ("es", 0.6), ("zh", 0.5))
_TWO60 = float(1 << 60)


_QMIX_ORACLE = f"""
WITH rated AS (
  SELECT doc_id, lang,
         CASE lang {" ".join(f"WHEN '{lang}' THEN {r}e0" for lang, r in _MIX_RATES)}
              ELSE 0.0e0 END AS target_rate,
         CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) / {_TWO60!r} AS u
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN u < target_rate THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       FLOOR(SUM(CASE WHEN u < target_rate THEN 1.0e0 ELSE 0.0e0 END)
             / COUNT(*) * 1000000 + 0.5e0) / 1000000 AS achieved_rate,
       MIN(target_rate) AS target_rate
FROM rated
GROUP BY lang
"""


@register(
    "q_dataset_domain_mix",
    oracle=_QMIX_ORACLE,
    description=(
        "deterministic domain/language re-mixing: per-language hash "
        "sampling toward target keep rates — the mixture-weighting step "
        "of a training-data pipeline, reproducible across reruns"
    ),
    tags=("curation", "sampling", "mixing", "dataset"),
)
def q_dataset_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture re-weighting (the 'data mixing' stage: sample each domain
    at a target rate to hit a corpus-level distribution) with the
    md5-hash keep decision instead of rand(), so the subset is identical
    across reruns, engines and cluster layouts — a property rand()-based
    sampling cannot give at 100 TB. Map-side decision + one groupBy."""
    from .hashing import hash60

    d = table(spark, sf_dir, "documents")
    # fold in reverse so the first declared language wins like a SQL CASE
    rate = F.lit(0.0)
    for lang, r in reversed(_MIX_RATES):
        rate = F.when(F.col("lang") == lang, F.lit(float(r))).otherwise(rate)
    u = hash60(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) / F.lit(
        _TWO60
    )
    rated = d.select(
        "lang", rate.alias("target_rate"), (u < rate).alias("keep")
    )
    kept = F.sum(F.when(F.col("keep"), 1.0).otherwise(0.0))
    return rated.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
        (F.floor(kept / F.count(F.lit(1)) * 1_000_000 + 0.5) / 1_000_000).alias(
            "achieved_rate"
        ),
        F.min("target_rate").alias("target_rate"),
    )
