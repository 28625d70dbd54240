"""PII redaction + document chunking — training-data curation operators.

A 100 TB pre-training corpus pass needs (a) PII scrubbing before any
export and (b) fixed-size overlapping chunks as the unit fed to the
tokenizer. Both are pure JVM-side expression work (regexp_replace /
sequence / transform / slice) — no Python UDF, fully codegen'd, scale
linearly with the scan and never shuffle.

The reference has no text surface at all (its data are numeric/`H|T`
traces, parallel_simulations/utils.py:15-23); these belong to the
§2.B north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Order matters: emails before phones (an email's digits must not be
#: half-eaten by the phone pattern first).
_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PHONE = r"\+?\d{3}[-. ]\d{3,4}[-. ]\d{4}"
_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def redact(col):
    """Chained full-string PII redaction; each regexp_replace replaces
    every match (Spark semantics; oracle passes the 'g' flag)."""
    c = F.regexp_replace(col, _EMAIL, "<EMAIL>")
    c = F.regexp_replace(c, _PHONE, "<PHONE>")
    return F.regexp_replace(c, _IPV4, "<IP>")


_QREDACT_ORACLE = rf"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(txt, '{_EMAIL}', '<EMAIL>', 'g'),
           '{_PHONE}', '<PHONE>', 'g'),
         '{_IPV4}', '<IP>', 'g') AS clean_text
FROM (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com or +1 555-01' || CAST(doc_id % 90 + 10 AS VARCHAR)
              || '-4242 at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS txt
  FROM documents WHERE doc_id < 100
)
"""


@register(
    "q_pii_redaction",
    oracle=_QREDACT_ORACLE,
    description="PII scrub: email/phone/IPv4 redaction via chained regexp_replace",
    tags=("text", "pii", "redaction", "curation"),
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    # Deterministically inject PII so the redaction has something to find
    # at every row (the synthetic corpus itself contains none).
    txt = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1 555-01"),
        (F.col("doc_id") % 90 + 10).cast("string"),
        F.lit("-4242 at 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1"),
    )
    return d.select("doc_id", redact(txt).alias("clean_text"))


def chunk_tokens(toks, size: int, stride: int):
    """Overlapping fixed-size chunks of a token array as
    array<struct<chunk_id int, chunk string>> — pure higher-order
    expressions, so chunking stays inside whole-stage codegen.

    Chunk starts: 0, stride, 2*stride, ... while start < len (last chunk
    may be short). A 100 TB corpus chunks in the scan stage with zero
    shuffle; downstream tokenization sees ~len/stride rows per doc.
    """
    n = F.size(toks)
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    return F.transform(
        starts,
        lambda start, i: F.struct(
            i.alias("chunk_id"),
            F.array_join(F.slice(toks, start + 1, size), " ").alias("chunk"),
        ),
    )


_QCHUNK_ORACLE = """
SELECT doc_id,
       CAST(s AS INTEGER) // 24 AS chunk_id,
       array_to_string(toks[s + 1 : s + 32], ' ') AS chunk,
       CAST(LEAST(32, n_toks - s) AS INTEGER) AS chunk_len
FROM (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n_toks
  FROM documents WHERE doc_id < 200
) t,
LATERAL (SELECT unnest(range(0, n_toks, 24)) AS s) u
"""


@register(
    "q_doc_chunking",
    oracle=_QCHUNK_ORACLE,
    description="overlapping token chunks (size 32, stride 24) via sequence+slice",
    tags=("text", "chunking", "curation", "higher_order"),
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.split("text", " ")
    t = d.select("doc_id", toks.alias("toks"), F.size(toks).alias("n_toks"))
    chunks = chunk_tokens(F.col("toks"), size=32, stride=24)
    out = t.select("doc_id", "n_toks", F.explode(chunks).alias("c"))
    return out.select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk").alias("chunk"),
        F.least(F.lit(32), F.col("n_toks") - F.col("c.chunk_id") * 24).alias(
            "chunk_len"
        ),
    )
