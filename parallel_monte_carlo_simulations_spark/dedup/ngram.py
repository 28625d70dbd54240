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

from ..functions.hashing import (
    VERIFY_SEED,
    hash60_seeded,
    shingles,
    sql_hash60_seeded,
    sql_shingles,
)
from ..registry import register
from ..tables import table

JACCARD_THRESHOLD = 0.6

_SH = sql_shingles("text", 3)

_QNGRAM_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id,
         {sql_hash60_seeded('shingle', VERIFY_SEED)} AS h
  FROM (SELECT doc_id, unnest({_SH}) AS shingle FROM documents)
),
counts AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
)
SELECT
  doc_a,
  doc_b,
  FLOOR((n_common * 1.0 / (ca.n + cb.n - n_common)) * 1e4 + 0.5) / 1e4 AS jaccard
FROM inter
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= {JACCARD_THRESHOLD}
"""


def shingle_sets(spark: SparkSession, sf_dir: str, width: int = 3) -> DataFrame:
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
    leads = ["tok"] + [F.lead("tok", i).over(w) for i in range(1, width)]
    shingle = F.concat_ws(" ", *leads)
    last = F.lead("tok", width - 1).over(w)
    return (
        toks.select(
            "doc_id",
            shingle.alias("shingle"),
            last.alias("_tl"),
        )
        .filter(F.col("_tl").isNotNull())  # docs with <width tokens: none
        .select("doc_id", "shingle")
        .distinct()
    )


def jaccard_pairs(sh: DataFrame, threshold: float) -> DataFrame:
    """Exact pairwise Jaccard from a distinct (doc_id, shingle) frame.

    The self-join and counts run over 60-bit hashed shingles (see
    VERIFY_SEED) — the pair-generating shuffle carries longs, not
    strings."""
    hsh = (
        sh.select("doc_id", hash60_seeded("shingle", VERIFY_SEED).alias("h"))
        .distinct()
        .persist()
    )
    counts = hsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # Every frame here is corpus-sized but post-explode, so Catalyst's
    # static size estimate stays anchored to the tiny parquet scan and
    # the planner auto-broadcasts a side (round-8 registry audit; at
    # 10x docs the build dies, at 100 TB it's a guaranteed OOM). Pin
    # the spill-safe sort-merge strategy on every corpus-sided join.
    a = hsh.alias("a").hint("merge")
    b = hsh.alias("b").hint("merge")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.alias("ca").hint("merge")
    cb = counts.alias("cb").hint("merge")
    jac = F.col("n_common") / (F.col("ca.n") + F.col("cb.n") - F.col("n_common"))
    return (
        inter.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", (F.floor((jac) * 1e4 + 0.5) / 1e4).alias("jaccard"))
    )


@register(
    "q_dedup_ngram_jaccard",
    oracle=_QNGRAM_ORACLE,
    description="near-dup pairs by exact word-trigram Jaccard >= 0.6",
    tags=("dedup", "ngram", "jaccard"),
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # jaccard_pairs persists its hashed-shingle frame internally (it
    # feeds the self-join twice plus per-doc counts).
    return jaccard_pairs(shingle_sets(spark, sf_dir), JACCARD_THRESHOLD)


_SH8 = sql_shingles("text", 8)

_QSPANS_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, unnest({_SH8}) AS span FROM documents
),
dup AS (
  SELECT span,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM sh
  GROUP BY span
  HAVING COUNT(*) > 1
)
SELECT s.doc_id, d.span, d.n_docs
FROM sh s JOIN dup d ON s.span = d.span
"""


@register(
    "q_dedup_substring_spans",
    oracle=_QSPANS_ORACLE,
    description="cross-document duplicated 8-token spans (exact substring dedup)",
    tags=("dedup", "substring", "spans", "curation"),
)
def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level duplication (the Lee et al. 2022
    'Deduplicating Training Data' operation, simplified to fixed-width
    8-token spans): any span appearing in more than one document is
    boilerplate/contamination to cut. One groupBy on the span — at
    100 TB hash the span to a 64-bit key first so the shuffle carries
    8 bytes, not strings (here the string key keeps the oracle exact).
    Doc-level near-dup (`q_dedup_minhash_lsh`) won't catch a license
    header shared by 10k otherwise-distinct docs; this does."""
    sh = shingle_sets(spark, sf_dir, width=8).select(
        "doc_id", F.col("shingle").alias("span")
    )
    dup = (
        sh.groupBy("span")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )
    # dup is span-keyed — corpus-scaling with a bogus-small post-explode
    # static estimate; pin sort-merge (round-8 registry audit).
    return sh.join(dup.hint("merge"), "span").select("doc_id", "span", "n_docs")


_QLEV_ORACLE = """
WITH heads AS (
  SELECT doc_id, lang, substr(text, 1, 40) AS head
  FROM documents WHERE doc_id < 120
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.head, b.head) AS INTEGER) AS edit_dist
FROM heads a JOIN heads b
  ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= 22
"""


@register(
    "q_dedup_levenshtein",
    oracle=_QLEV_ORACLE,
    description="edit-distance fuzzy matching on doc heads, lang-blocked self-join",
    tags=("dedup", "levenshtein", "fuzzy"),
)
def q_dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-match — the character-level complement to the
    token-level Jaccard family (catches typo-level mutations trigrams
    miss). The self-join is blocked on `lang` (any bounded blocking key
    works: lang, length bucket, LSH bucket) so the pairwise levenshtein
    — O(len^2) per pair, JVM-side — never runs on the full cross
    product. At 100 TB the blocking key MUST come from a candidate
    generator (MinHash bands); this registers the verify kernel."""
    heads = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 120)
        .select("doc_id", "lang", F.substring("text", 1, 40).alias("head"))
    )
    a, b = heads.alias("a"), heads.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        # Threshold 22/40 chars chosen against the synthetic corpus so the
        # gate exercises real matches at every SF it runs (sf0.001: 11
        # pairs incl. two exact duplicates; sf0.01: 14 pairs) — a 0-vs-0
        # comparison would never test the cross-engine levenshtein
        # semantics.
        .filter(dist <= 22)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("int").alias("edit_dist"),
        )
    )
