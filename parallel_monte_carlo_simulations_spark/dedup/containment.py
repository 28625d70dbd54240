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
#: Stop-shingle document-frequency cap (round-10 scale guard). The
#: candidate stage is a postings self-join whose row count is Σ df², so
#: one boilerplate/template shingle shared by df=1e6 docs mints 1e12
#: candidate rows. Dropping shingles with df > cap — the standard
#: stop-shingle practice (Broder '97 uses the mirror image, keeping
#: sketch minima; SpotSigs caps df outright) — bounds candidates at
#: cap * |postings|, i.e. LINEAR in corpus size. High-df shingles carry
#: no containment signal (they match everything), so precision is
#: unaffected; the cap is mirrored exactly in the DuckDB oracle, and at
#: the oracle scale factors max df = 25 < 64, so results are
#: bit-identical with or without it. Measured on the natural sf1.0
#: corpus: Σ df² 252.5M -> 156.6k candidate rows (~1600x).
DF_CAP = 64
_SH = sql_shingles("text", 3)

_QCONTAIN_ORACLE = f"""
WITH sh0 AS (
  SELECT DISTINCT doc_id,
         {sql_hash60_seeded('shingle', VERIFY_SEED)} AS h
  FROM (SELECT doc_id, unnest({_SH}) AS shingle FROM documents)
),
keep AS (SELECT h FROM sh0 GROUP BY h HAVING COUNT(*) <= {DF_CAP}),
sh AS (SELECT sh0.doc_id, sh0.h FROM sh0 JOIN keep USING (h)),
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
        "one (quote/excerpt detection Jaccard misses); stop-shingle "
        f"df-cap {DF_CAP} bounds the candidate self-join at "
        "cap*|postings| (linear); for resemblance-style near-dup at "
        "scale use q_dedup_minhash_lsh"
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
    sh0 = (
        d.select("doc_id", F.explode(shingles("text", 3)).alias("shingle"))
        .select("doc_id", hash60_seeded("shingle", VERIFY_SEED).alias("h"))
        .distinct()
    )
    # Stop-shingle df-cap (see DF_CAP): the keep-list is shingle-count
    # sized (small relative to postings) but unbounded at 100 TB, so it
    # joins back sort-merge on h — the same shuffle key the self-join
    # needs, so the exchange is reused, not added.
    keep = (
        sh0.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= DF_CAP)
        .select("h")
    )
    sh = sh0.join(keep.hint("merge"), "h").persist()
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


# Exact power-of-two bucket edges as integer comparisons (NOT
# floor(log2(df)) — both engines compute log2 in double and an exact
# hit on a power of two is implementation-defined at the ulp level).
_DF_EDGES = (128, 64, 32, 16, 8, 4, 2, 1)
_SQL_BUCKET = (
    "CASE "
    + " ".join(f"WHEN df >= {e} THEN {e}" for e in _DF_EDGES)
    + " END"
)

_QCONTAIN_DF_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id,
         {sql_hash60_seeded('shingle', VERIFY_SEED)} AS h
  FROM (SELECT doc_id, unnest({_SH}) AS shingle FROM documents)
),
dfh AS (SELECT h, COUNT(*) AS df FROM sh GROUP BY h)
SELECT {_SQL_BUCKET}                               AS df_bucket_lo,
       df <= {DF_CAP}                              AS kept,
       CAST(COUNT(*) AS BIGINT)                    AS n_shingles,
       CAST(SUM(df) AS BIGINT)                     AS n_postings,
       CAST(SUM(df * df) AS BIGINT)                AS candidate_mass
FROM dfh
GROUP BY 1, 2
"""


@register(
    "q_dedup_containment_df_report",
    oracle=_QCONTAIN_DF_ORACLE,
    description=(
        "containment scale diagnostic: shingle document-frequency "
        "histogram (power-of-two buckets) with posting and Σdf² "
        "candidate mass, split by the DF_CAP stop-shingle cut — shows "
        "exactly how much self-join work the cap removes"
    ),
    tags=("dedup", "containment", "diagnostic", "scale"),
)
def q_dedup_containment_df_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight profile for :func:`q_dedup_containment`: the candidate
    self-join materializes Σ df² rows, so the df histogram IS the cost
    model. One scan + one groupBy; candidate_mass in the kept=false rows
    is the work the DF_CAP stop-shingle cut avoids (measured 252.5M ->
    156.6k on the natural sf1.0 corpus)."""
    d = table(spark, sf_dir, "documents")
    dfh = (
        d.select("doc_id", F.explode(shingles("text", 3)).alias("shingle"))
        .select("doc_id", hash60_seeded("shingle", VERIFY_SEED).alias("h"))
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    bucket = F.expr(_SQL_BUCKET)
    return dfh.groupBy(
        bucket.alias("df_bucket_lo"),
        (F.col("df") <= DF_CAP).alias("kept"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum("df").cast("long").alias("n_postings"),
        F.sum(F.col("df") * F.col("df")).cast("long").alias("candidate_mass"),
    )
