"""Readability scoring: Flesch reading-ease / Flesch-Kincaid grade with
a deterministic vowel-group syllable heuristic.

Readability is a standard text-quality feature for LLM-corpus curation
(too-low grade = fragments/boilerplate, too-high = OCR noise and run-on
garbage). The classic formulas need words, sentences, and syllables;
exact syllabification needs a dictionary, so production pipelines use
the deterministic vowel-group approximation (a syllable per maximal
``[aeiouy]+`` run) — that heuristic is what both engines compute here,
so the score is bit-identical cross-engine:

    words     = count of [A-Za-z0-9]+ runs
    sentences = max(1, count of [.!?]+ runs)   (floor: fragment = 1)
    syllables = count of [aeiouy]+ runs in lower(text)

    FRE  = 206.835 - 1.015 * words/sentences - 84.6 * syllables/words
    FKGL = 0.39 * words/sentences + 11.8 * syllables/words - 15.59

All three inputs are INTEGER counts (regexp run counts — same RE2/Java
regex semantics for these character-class patterns), so the only float
work is two divisions and the linear combination, evaluated in the same
order in both engines and rounded once.

Scale: pure per-row scalar functions over the documents scan — no
shuffle at all until the optional aggregation; this is the shape every
per-document quality signal should have at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_QREADABILITY_ORACLE = """
SELECT doc_id,
       n_words,
       n_syllables,
       FLOOR((206.835 - 1.015 * (n_words / n_sentences)
                     - 84.6 * (n_syllables / n_words)) * 1e4 + 0.5) / 1e4 AS flesch_ease,
       FLOOR((0.39 * (n_words / n_sentences)
             + 11.8 * (n_syllables / n_words) - 15.59) * 1e4 + 0.5) / 1e4 AS fk_grade
FROM (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
           AS n_words,
         CAST(GREATEST(1, len(regexp_extract_all(text, '[.!?]+')))
           AS BIGINT) AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS n_syllables
  FROM documents
)
WHERE n_words > 0
"""


@register(
    "q_text_readability",
    oracle=_QREADABILITY_ORACLE,
    description=(
        "Flesch reading-ease + Flesch-Kincaid grade per document with "
        "the deterministic vowel-group syllable heuristic — integer "
        "regexp-run counts, one rounded float combination, no shuffle"
    ),
    tags=("text", "readability", "quality", "curation", "llm-pipeline"),
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    n_words = F.size(F.regexp_extract_all("text", F.lit("[A-Za-z0-9]+"), F.lit(0))).cast(
        "long"
    )
    n_sentences = F.greatest(
        F.lit(1).cast("long"),
        F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), F.lit(0))).cast("long"),
    )
    n_syllables = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0))
    ).cast("long")
    counts = d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    wps = F.col("n_words") / F.col("n_sentences")
    spw = F.col("n_syllables") / F.col("n_words")
    return counts.select(
        "doc_id",
        "n_words",
        "n_syllables",
        (F.floor((F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw) * 1e4 + 0.5) / 1e4).alias("flesch_ease"),
        (F.floor((F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)) * 1e4 + 0.5) / 1e4).alias("fk_grade"),
    )
