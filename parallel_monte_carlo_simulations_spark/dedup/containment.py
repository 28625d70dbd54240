"""Asymmetric near-dup: shingle CONTAINMENT (quote / partial-copy
detection).

Jaccard resemblance (``dedup.ngram``) is symmetric — it misses the case
where a SHORT document is largely contained in a LONG one (quotation,
excerpt, template embedding), because the union in the denominator is
dominated by the long side. Containment ``|A ∩ B| / |A|`` scores the
short side's coverage directly; it is the Broder companion measure to
resemblance and the right metric for "did this doc copy from that one".

Shape: the same length-bucketed shingle equi-join the Jaccard path uses
(never all-pairs; candidates must share a trigram), intersection counts
from the join, each side's set size from a pre-aggregate — the
asymmetric ratio then comes free. Pairs are kept when the SMALLER
document is >= 60% contained in the larger.
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

THRESHOLD = 0.6
_SH = sql_shingles("text", 3)

_QCONTAIN_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id,
         {sql_hash60_seeded('shingle', VERIFY_SEED)} AS h
  FROM (SELECT doc_id, unnest({_SH}) AS shingle FROM documents)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS small_doc, b.doc_id AS big_doc, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.small_doc, i.big_doc,
       CAST(i.common AS BIGINT)            AS n_common,
       CAST(sa.n AS BIGINT)                AS n_small,
       FLOOR((i.common * 1.0 / sa.n) * 10000 + 0.5e0) / 10000
         AS containment
FROM inter i
JOIN sizes sa ON i.small_doc = sa.doc_id
JOIN sizes sb ON i.big_doc = sb.doc_id
WHERE sa.n <= sb.n
  AND (sb.n > sa.n OR i.small_doc < i.big_doc)
  AND i.common * 1.0 / sa.n >= {THRESHOLD}
"""


@register(
    "q_dedup_containment",
    oracle=_QCONTAIN_ORACLE,
    description=(
        "asymmetric near-dup: trigram-shingle containment |A∩B|/|A| — "
        f"smaller doc >= {int(THRESHOLD * 100)}% contained in a larger "
        "one (quote/excerpt detection Jaccard misses)"
    ),
    tags=("dedup", "containment", "shingle", "curation"),
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # Intersections and sizes run over 60-bit md5-hashed shingles (the
    # dedup.minhash VERIFY_SEED convention): the pair-generating shuffle
    # carries 8-byte longs instead of ~25-byte strings, and the oracle
    # counts over the identical hash universe, so a collision shifts
    # both engines the same way.
    sh = (
        d.select("doc_id", F.explode(shingles("text", 3)).alias("shingle"))
        .select("doc_id", hash60_seeded("shingle", VERIFY_SEED).alias("h"))
        .distinct()
        .persist()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # The intersect self-join's sides are the corpus-sized post-explode
    # shingle frame — the planner's static estimate is bogus-small and
    # it broadcasts one side (round-8 plan audit). Pin sort-merge.
    a = sh.alias("a").hint("merge")
    b = sh.alias("b").hint("merge")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("small_doc"),
            F.col("b.doc_id").alias("big_doc"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("small_doc"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("big_doc"), F.col("n").alias("n_b"))
    ratio = F.col("common") * 1.0 / F.col("n_a")
    return (
        # sa/sb are PER-DOC aggregates — corpus-sized, not dims. An
        # explicit broadcast here is unbounded at 100 TB (round-8 plan
        # audit); sort-merge on the doc key is the spill-safe strategy.
        inter.join(sa.hint("merge"), "small_doc")
        .join(sb.hint("merge"), "big_doc")
        .filter(
            (F.col("n_a") <= F.col("n_b"))
            & (
                (F.col("n_b") > F.col("n_a"))
                | (F.col("small_doc") < F.col("big_doc"))
            )
            & (ratio >= THRESHOLD)
        )
        .select(
            "small_doc",
            "big_doc",
            F.col("common").cast("long").alias("n_common"),
            F.col("n_a").cast("long").alias("n_small"),
            (F.floor(ratio * 10000 + 0.5) / 10000).alias("containment"),
        )
    )
