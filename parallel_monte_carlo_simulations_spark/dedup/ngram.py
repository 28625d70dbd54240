"""N-gram Jaccard near-duplicate detection (exact similarity).

Word-trigram shingle sets, pairwise Jaccard via a shingle-equality
self-join, threshold filter. This is the *exact* verifier; at 100 TB the
shingle join's fan-out on common shingles is the bottleneck, which is
why :mod:`.minhash` exists as the candidate-generation path — the exact
Jaccard here is what MinHash candidates are verified against.

The driver's documents table contains planted near-dup pairs (trigram
Jaccard ≈ 0.99), so the threshold asserts real pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import shingles, sql_shingles
from ..registry import register
from ..tables import table

JACCARD_THRESHOLD = 0.6

_SH = sql_shingles("text", 3)

_QNGRAM_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, unnest({_SH}) AS shingle FROM documents
),
counts AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
)
SELECT
  doc_a,
  doc_b,
  ROUND(n_common * 1.0 / (ca.n + cb.n - n_common), 4) AS jaccard
FROM inter
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= {JACCARD_THRESHOLD}
"""


def shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, shingle) pairs — the shared input of the exact
    and MinHash dedup paths.

    Formulated as posexplode + window lead, which is O(tokens) per doc;
    the array-lambda formulation (slice per shingle) is O(tokens^2) per
    doc and measurably slower on long documents. The window's shuffle is
    by doc_id — the same partitioning every downstream groupBy needs."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    shingle = F.concat_ws(
        " ", "tok", F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
    )
    return (
        toks.select(
            "doc_id",
            shingle.alias("shingle"),
            F.lead("tok", 2).over(w).alias("_t2"),
        )
        .filter(F.col("_t2").isNotNull())  # docs with <3 tokens: no shingles
        .select("doc_id", "shingle")
        .distinct()
    )


def jaccard_pairs(sh: DataFrame, threshold: float) -> DataFrame:
    """Exact pairwise Jaccard from a distinct (doc_id, shingle) frame."""
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    jac = F.col("n_common") / (F.col("ca.n") + F.col("cb.n") - F.col("n_common"))
    # No broadcast hint: per-doc counts scale with the corpus (AQE will
    # still broadcast when a side is genuinely small at runtime).
    return (
        inter.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


@register(
    "q_dedup_ngram_jaccard",
    oracle=_QNGRAM_ORACLE,
    description="near-dup pairs by exact word-trigram Jaccard >= 0.6",
    tags=("dedup", "ngram", "jaccard"),
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Persist: the frame feeds the self-join twice plus per-doc counts.
    return jaccard_pairs(shingle_sets(spark, sf_dir).persist(), JACCARD_THRESHOLD)
