"""Gopher-style rule-based quality screen (round 10).

The Rae et al. 2021 (Gopher) curation stage every LLM corpus passes
through: HARD structural rules with pass/fail semantics and per-rule
failure accounting — unlike the continuous score of
``q_text_quality_score``, a document either survives the filter set or
is dropped with a named reason, and the pipeline report is the
retention rate per source plus which rules bite.

Every rule is a PURE INTEGER comparison (no float boundary can
disagree cross-engine):

- word count within [24, 1000]        (n bounds)
- mean word length within [3, 10]     (3*n <= chars <= 10*n)
- >= 2 distinct stopwords present     (fixed 5-word list)
- type-token ratio >= 0.375           (8 * distinct >= 3 * n)
- top-token share <= 0.125            (8 * max_tf <= n)

Thresholds are set against the corpus distributions (p5 token count 16,
median TTR 0.46, p75 top-share 0.11) so every rule has real pass AND
fail populations at sf0.01 — the screen is exercised, not vacuous.

Scale: one token explode -> per-doc groupBy (map-side combinable),
flags are projections, the report is a source-sized aggregate. One
data-sized shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_STOPS = ("a", "the", "value", "table", "data")
_MIN_N, _MAX_N = 24, 1000

_QGOPHER_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
tf AS (
  SELECT doc_id, source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks WHERE tok <> '' GROUP BY doc_id, source, tok
),
per_doc AS (
  SELECT doc_id, source,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * length(tok)) AS BIGINT) AS chars,
         CAST(COUNT(*) AS BIGINT) AS nd,
         CAST(MAX(c) AS BIGINT) AS mx,
         CAST(COUNT(DISTINCT CASE WHEN tok IN {_STOPS!r} THEN tok END)
              AS BIGINT) AS n_stops
  FROM tf GROUP BY doc_id, source
),
flags AS (
  SELECT source,
         (n < {_MIN_N} OR n > {_MAX_N})          AS f_count,
         (chars < 3 * n OR chars > 10 * n)       AS f_meanlen,
         (n_stops < 2)                           AS f_stop,
         (8 * nd < 3 * n)                        AS f_ttr,
         (8 * mx > n)                            AS f_topshare
  FROM per_doc
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE f_count) AS BIGINT)    AS fail_wordcount,
       CAST(COUNT(*) FILTER (WHERE f_meanlen) AS BIGINT)  AS fail_meanlen,
       CAST(COUNT(*) FILTER (WHERE f_stop) AS BIGINT)     AS fail_stopwords,
       CAST(COUNT(*) FILTER (WHERE f_ttr) AS BIGINT)      AS fail_ttr,
       CAST(COUNT(*) FILTER (WHERE f_topshare) AS BIGINT) AS fail_topshare,
       CAST(COUNT(*) FILTER (WHERE NOT (f_count OR f_meanlen OR f_stop
                                        OR f_ttr OR f_topshare))
            AS BIGINT) AS n_pass,
       FLOOR((CAST(COUNT(*) FILTER (WHERE NOT (f_count OR f_meanlen
                                              OR f_stop OR f_ttr
                                              OR f_topshare)) AS DOUBLE)
             / COUNT(*)) * 1e4 + 0.5) / 1e4 AS retention
FROM flags
GROUP BY source
"""


@register(
    "q_text_gopher_rules",
    oracle=_QGOPHER_ORACLE,
    description=(
        "Gopher-style hard quality rules (word count, mean word length, "
        "stopword presence, type-token ratio, top-token dominance — all "
        "pure integer comparisons): per-source failure counts by rule "
        "and the retention rate; the pass/fail complement to the "
        "continuous q_text_quality_score"
    ),
    tags=("text", "quality", "curation", "gopher", "llm-pipeline"),
)
def q_text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tf = (
        d.select(
            "doc_id",
            "source",
            F.explode(F.split(F.col("text"), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "source", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    per_doc = tf.groupBy("doc_id", "source").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.length("tok")).cast("long").alias("chars"),
        F.count("*").cast("long").alias("nd"),
        F.max("c").cast("long").alias("mx"),
        F.countDistinct(
            F.when(F.col("tok").isin(*_STOPS), F.col("tok"))
        )
        .cast("long")
        .alias("n_stops"),
    )
    flags = per_doc.select(
        "source",
        ((F.col("n") < _MIN_N) | (F.col("n") > _MAX_N)).alias("f_count"),
        (
            (F.col("chars") < 3 * F.col("n"))
            | (F.col("chars") > 10 * F.col("n"))
        ).alias("f_meanlen"),
        (F.col("n_stops") < 2).alias("f_stop"),
        (8 * F.col("nd") < 3 * F.col("n")).alias("f_ttr"),
        (8 * F.col("mx") > F.col("n")).alias("f_topshare"),
    )
    passed = ~(
        F.col("f_count")
        | F.col("f_meanlen")
        | F.col("f_stop")
        | F.col("f_ttr")
        | F.col("f_topshare")
    )
    return flags.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count(F.when(F.col("f_count"), 1)).cast("long").alias("fail_wordcount"),
        F.count(F.when(F.col("f_meanlen"), 1)).cast("long").alias("fail_meanlen"),
        F.count(F.when(F.col("f_stop"), 1)).cast("long").alias("fail_stopwords"),
        F.count(F.when(F.col("f_ttr"), 1)).cast("long").alias("fail_ttr"),
        F.count(F.when(F.col("f_topshare"), 1)).cast("long").alias("fail_topshare"),
        F.count(F.when(passed, 1)).cast("long").alias("n_pass"),
        (F.floor((F.count(F.when(passed, 1)).cast("double") / F.count("*")) * 1e4 + 0.5) / 1e4).alias("retention"),
    )
