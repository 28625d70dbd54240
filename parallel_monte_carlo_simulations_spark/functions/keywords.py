"""RAKE-style keyword scoring: degree-over-frequency token ranking.

The classic unsupervised keyword extractor (Rose et al., RAKE) reduced
to its SQL-expressible core: a token's FREQUENCY counts its occurrences
and its DEGREE counts its co-occurrences with other tokens inside a
small window; ``degree / frequency`` favors words that appear in rich
contexts over words that merely repeat (stopword-ish behavior scores
low even without a stopword list). Window co-occurrence comes from a
position self-pair via lag/lead-free window frames — per-token pairs
within ±2 positions in the same document, built by a range self-join on
position buckets (same binning trick as q_join_range_binned, applied
to token positions).

Output: top-25 tokens by score with deterministic tie-breaks, plus
their frequency/degree — rank cut on the ROUNDED score (cross-engine
ordering discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

WINDOW = 2
TOP_N = 25

_QRAKE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, p.pos, arr[p.pos] AS tok
  FROM (
    SELECT doc_id,
           list_filter(string_split(lower(text), ' '), x -> x <> '') AS arr
    FROM documents WHERE doc_id < 250
  ),
  LATERAL (SELECT unnest(range(1, len(arr) + 1)) AS pos) p
),
freq AS (SELECT tok, COUNT(*) AS f FROM toks GROUP BY tok),
cooc AS (
  SELECT a.tok AS tok, COUNT(*) AS deg
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id
   AND b.pos BETWEEN a.pos - {WINDOW} AND a.pos + {WINDOW}
   AND a.pos <> b.pos
  GROUP BY a.tok
)
SELECT tok,
       CAST(f.f AS BIGINT)               AS frequency,
       CAST(c.deg AS BIGINT)             AS degree,
       FLOOR((c.deg * 1.0 / f.f) * 10000 + 0.5e0) / 10000 AS score
FROM freq f JOIN cooc c USING (tok)
ORDER BY score DESC, tok
LIMIT {TOP_N}
"""


@register(
    "q_text_rake_keywords",
    oracle=_QRAKE_ORACLE,
    description=(
        "RAKE-style keyword scoring: per-token degree (±2-position "
        f"co-occurrence) over frequency, top-{TOP_N} by rounded score"
    ),
    tags=("text", "keywords", "nlp", "curation"),
)
def q_text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    a, b = toks.alias("a"), toks.alias("b")
    cooc = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos").between(F.col("a.pos") - WINDOW, F.col("a.pos") + WINDOW))
            & (F.col("a.pos") != F.col("b.pos")),
        )
        .groupBy(F.col("a.tok").alias("tok"))
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    score = F.floor((F.col("deg") * 1.0 / F.col("f")) * 10000 + 0.5) / 10000
    return (
        freq.join(cooc, "tok")
        .select(
            "tok",
            F.col("f").cast("long").alias("frequency"),
            F.col("deg").cast("long").alias("degree"),
            score.alias("score"),
        )
        .orderBy(F.desc("score"), "tok")
        .limit(TOP_N)
    )
