"""Quality-score calibration against duplication (reliability curve).

Composes two existing pipeline primitives into the audit every
curation pipeline needs: does the heuristic quality score actually
predict anything? Here: bucket documents into score deciles and
measure the exact-duplicate rate per decile — a reliability diagram of
score vs the one label the corpus gives us for free (text duplication).
A well-behaved quality score should show monotone structure against
dup rate; a flat curve means the score is noise for dedup triage.

Determinism discipline: deciles come from ``ntile(10)`` over the
TOTAL order (rounded score, doc_id) — the doc_id tiebreak makes the
assignment unique, and both engines implement ntile identically
(floor-balanced bucket sizes). Scores are bucketed on their ROUNDED
values (identical doubles cross-engine); per-decile mean score sums
exact micro-unit integers (score * 1e6 as BIGINT) so no
float-summation-order issue exists, with one mirrored division at the
end.

Scale note (honest): global ntile is a single total sort — fine for a
per-corpus audit table, but at 100 TB the decile BOUNDARIES should come
from an approximate-quantile pass and the assignment from a broadcast
range join; the curve semantics are unchanged. The dup label is the
exact-dedup hash-groupBy, which scales as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .text import STOPWORDS, _stopword_count, _tokens

_EN_SW_SQL = "('" + "', '".join(STOPWORDS["en"]) + "')"

_QCALIB_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, text,
         FLOOR((0.4 * LEAST(length(text) / 500.0, 1.0)
           + 0.4 * (len(list_distinct(string_split(text, ' '))) * 1.0
                    / len(string_split(text, ' ')))
           + 0.2 * LEAST(len(list_filter(string_split(text, ' '),
                                         t -> t IN {_EN_SW_SQL})) * 5.0
                         / len(string_split(text, ' ')), 1.0)) * 1e6 + 0.5) / 1e6 AS score
  FROM documents
),
dup AS (
  SELECT text, CAST(COUNT(*) AS BIGINT) AS n_same FROM scored GROUP BY text
),
labeled AS (
  SELECT s.doc_id, s.score,
         CASE WHEN d.n_same > 1 THEN 1 ELSE 0 END AS is_dup,
         CAST(ROUND(s.score * 1000000, 0) AS BIGINT) AS score_micro,
         ntile(10) OVER (ORDER BY s.score, s.doc_id) AS decile
  FROM scored s JOIN dup d ON d.text = s.text
)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(is_dup) AS BIGINT) AS n_dups,
       FLOOR((CAST(SUM(is_dup) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 1e6 + 0.5) / 1e6
         AS dup_rate,
       FLOOR((CAST(SUM(score_micro) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * 1000000.0)) * 1e6 + 0.5) / 1e6 AS mean_score
FROM labeled
GROUP BY decile
ORDER BY decile
"""


@register(
    "q_text_quality_calibration",
    oracle=_QCALIB_ORACLE,
    description=(
        "reliability curve of the heuristic quality score against the "
        "exact-duplicate label: ntile(10) deciles over (rounded score, "
        "doc_id), per-decile dup rate and mean score from exact "
        "micro-unit integer sums"
    ),
    tags=("text", "quality", "dedup", "calibration", "window"),
)
def q_text_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    n = F.size(toks)
    length_score = F.least(F.length("text") / 500.0, F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)) / n
    sw_ratio = _stopword_count(toks, STOPWORDS["en"]) / n
    quality = (
        0.4 * length_score
        + 0.4 * diversity
        + 0.2 * F.least(sw_ratio * 5.0, F.lit(1.0))
    )
    scored = d.select(
        "doc_id", "text", (F.floor((quality) * 1e6 + 0.5) / 1e6).alias("score")
    )
    dup = scored.groupBy("text").agg(
        F.count("*").cast("long").alias("n_same")
    )
    # deciles via the range-bucketed rank kernel + closed-form NTILE
    # (round 11) — identical cuts, no global-sort window.
    from ..operators.rankstats import bucketed_running, sql_ntile

    base = scored.join(dup, "text").select(
        "doc_id",
        "score",
        F.when(F.col("n_same") > 1, 1).otherwise(0).alias("is_dup"),
        F.round(F.col("score") * 1000000, 0).cast("long")
        .alias("score_micro"),
    )
    nt = base.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    labeled = (
        bucketed_running(
            base,
            axis="score",
            order=[F.col("score").asc(), F.col("doc_id").asc()],
            cums={"rank": F.lit(1)},
        )
        .crossJoin(F.broadcast(nt))
        .withColumn(
            "decile", sql_ntile(F.col("rank"), F.col("n_all"), 10)
        )
    )
    return (
        labeled.groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("is_dup").cast("long").alias("n_dups"),
            (F.floor((F.sum("is_dup").cast("double") / F.count("*").cast("double")) * 1e6 + 0.5) / 1e6).alias("dup_rate"),
            (F.floor((F.sum("score_micro").cast("double")
                / (F.count("*").cast("double") * 1000000.0)) * 1e6 + 0.5) / 1e6).alias("mean_score"),
        )
        .orderBy("decile")
    )
