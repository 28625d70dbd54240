"""Robust winnowing fingerprints (Schleimer, Wilkerson, Aiken — MOSS,
SIGMOD 2003): position-aware local document fingerprinting, and the
shared-fingerprint overlap join built on it.

Winnowing is the contamination/plagiarism primitive the hash-set dedup
family (minhash/simhash) cannot provide: it selects a GUARANTEED-dense
subset of k-gram hashes (at least one fingerprint per window of w
consecutive k-grams) such that any shared substring of length
w + k - 1 words contributes at least one SHARED fingerprint — so a
fingerprint equi-join finds copied passages, not just globally similar
documents.

Selection rule (robust winnowing): in each window of ``W`` consecutive
k-gram hashes, keep the minimum; on ties, the RIGHTMOST minimal hash.
Re-expressed per position so it is window-function computable (one sort
per document, no per-window loop): position q is selected iff for some
lag j in [0, W-1] with a full window ending at q + j,

    h(q) <  min h(q+1 .. q+j)        (q is the rightmost minimum), and
    h(q) <= min h(q+j-W+1 .. q-1)    (q is minimal among earlier rows).

Both frame mins are ROWS-frame window aggregates over the SAME
(doc_id, pos) sort, so Spark evaluates all 2(W-1) of them in a single
window pass; DuckDB spells the identical frames. Documents with fewer
than W k-grams are excluded (guarded identically in both engines).

Scale design: everything is per-document until the final overlap join —
narrow shuffles keyed by doc_id, O(text) state. The overlap join is an
equi-join on the 60-bit fingerprint hash: candidates are true shared
fingerprints (shared content), never an all-pairs comparison, and the
winnowing density guarantee (~2/(W+1) of k-grams selected) bounds the
join input at a fixed fraction of the corpus token count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import shingles, sql_hash60, sql_shingles
from ..registry import register
from ..tables import table

K_GRAM = 3  #: words per k-gram
W_WINDOW = 4  #: winnowing window (k-gram hashes per window)
MIN_SHARED = 3  #: overlap pairs reported at >= this many shared prints

_HASH_SQL = sql_hash60("shingle")


def _sql_fingerprints() -> str:
    """DuckDB CTE chain producing (doc_id, pos, h) selected fingerprints."""
    per_j = []
    for j in range(W_WINDOW):
        conds = [f"pos + {j} <= n_pos", f"pos + {j} >= {W_WINDOW}"]
        if j > 0:
            conds.append(
                f"h < MIN(h) OVER (PARTITION BY doc_id ORDER BY pos "
                f"ROWS BETWEEN 1 FOLLOWING AND {j} FOLLOWING)"
            )
        if j < W_WINDOW - 1:
            conds.append(
                f"h <= MIN(h) OVER (PARTITION BY doc_id ORDER BY pos "
                f"ROWS BETWEEN {W_WINDOW - 1 - j} PRECEDING AND 1 PRECEDING)"
            )
        per_j.append("(" + " AND ".join(conds) + ")")
    selected = " OR ".join(per_j)
    return f"""
grams AS (
  SELECT d.doc_id, i.i AS pos, {_HASH_SQL} AS h,
         len(s.sh) AS n_pos
  FROM (SELECT doc_id, {sql_shingles("text", K_GRAM)} AS sh
        FROM documents) s
  JOIN documents d ON d.doc_id = s.doc_id,
  LATERAL (SELECT unnest(range(1, len(s.sh) + 1)) AS i) i,
  LATERAL (SELECT s.sh[i.i] AS shingle) g
  WHERE len(s.sh) >= {W_WINDOW}
),
fp AS (
  SELECT doc_id, pos, h FROM (
    SELECT doc_id, pos, h, ({selected}) AS sel FROM grams
  ) WHERE sel
)"""


def _fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = d.select(
        "doc_id", shingles("text", K_GRAM).alias("sh")
    ).filter(F.size("sh") >= W_WINDOW)
    grams = sh.select(
        "doc_id",
        F.size("sh").alias("n_pos"),
        F.posexplode("sh").alias("pos0", "shingle"),
    ).select(
        "doc_id",
        "n_pos",
        (F.col("pos0") + 1).alias("pos"),
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    sel = F.lit(False)
    for j in range(W_WINDOW):
        cond = (F.col("pos") + j <= F.col("n_pos")) & (
            F.col("pos") + j >= W_WINDOW
        )
        if j > 0:
            cond = cond & (
                F.col("h") < F.min("h").over(w.rowsBetween(1, j))
            )
        if j < W_WINDOW - 1:
            cond = cond & (
                F.col("h")
                <= F.min("h").over(
                    w.rowsBetween(-(W_WINDOW - 1 - j), -1)
                )
            )
        sel = sel | cond
    return grams.withColumn("sel", sel).filter("sel").select(
        "doc_id", "pos", "h"
    )


_QWINNOW_ORACLE = f"""
WITH {_sql_fingerprints()}
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
       CAST(MIN(pos) AS BIGINT) AS first_pos,
       CAST(MAX(pos) AS BIGINT) AS last_pos
FROM fp
GROUP BY doc_id
"""


@register(
    "q_winnow_fingerprints",
    oracle=_QWINNOW_ORACLE,
    description=(
        f"robust winnowing (MOSS) fingerprint selection: {K_GRAM}-word "
        f"k-grams, window {W_WINDOW}, rightmost-min rule re-expressed as "
        "frame-exact window aggregates — per-document fingerprint counts"
    ),
    tags=("dedup", "winnowing", "fingerprint", "text", "curation"),
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = _fingerprints(spark, sf_dir)
    return fp.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_fingerprints"),
        F.min("pos").cast("long").alias("first_pos"),
        F.max("pos").cast("long").alias("last_pos"),
    )


#: Stop-fingerprint cap: a fingerprint present in more than this many
#: documents is non-discriminative boilerplate and is dropped before the
#: overlap join (standard MOSS-deployment practice). This bounds join
#: fan-out per fingerprint at MAX_DF^2/2 pairs — without it, hot common
#: k-grams make collision pairs grow ~quadratically with the corpus
#: (measured: 3.9k -> 347k pairs on 10x docs; capped: linear).
MAX_DF = 10

_QWINNOW_OVERLAP_ORACLE = f"""
WITH {_sql_fingerprints()},
dfp AS (SELECT DISTINCT doc_id, h FROM fp),
rare AS (
  SELECT h FROM dfp GROUP BY h HAVING COUNT(*) <= {MAX_DF}
),
kept AS (SELECT d.doc_id, d.h FROM dfp d JOIN rare r ON d.h = r.h)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {MIN_SHARED}
ORDER BY n_shared DESC, doc_a, doc_b
"""


@register(
    "q_winnow_overlap_pairs",
    oracle=_QWINNOW_OVERLAP_ORACLE,
    description=(
        "contamination screen on winnowed fingerprints: document pairs "
        f"sharing >= {MIN_SHARED} fingerprints via a hash equi-join with "
        f"stop-fingerprint pruning (df <= {MAX_DF}) — finds copied "
        "passages, join fan-out bounded per fingerprint, never all-pairs"
    ),
    tags=("dedup", "winnowing", "contamination", "join", "curation"),
)
def q_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    dfp = _fingerprints(spark, sf_dir).select("doc_id", "h").distinct()
    rare = dfp.groupBy("h").agg(F.count("*").alias("df")).filter(
        F.col("df") <= MAX_DF
    ).select("h")
    # rare (one row per kept fingerprint) and fp (corpus fingerprints)
    # both scale with the corpus, but derive from explode — bogus-small
    # static estimates; without hints the planner broadcasts them
    # (round-8 plan audit, unbounded at 100 TB). Pin sort-merge.
    fp = dfp.join(rare.hint("merge"), "h")
    a = fp.select(F.col("doc_id").alias("doc_a"), "h")
    b = fp.select(F.col("doc_id").alias("doc_b"), "h").hint("merge")
    return (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= MIN_SHARED)
        .orderBy(F.desc("n_shared"), "doc_a", "doc_b")
    )
