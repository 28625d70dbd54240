"""Prefix-filtered EXACT set-similarity join (PPJoin-style blocking).

The third near-dup blocking family, algorithmically distinct from
MinHash banding (:mod:`.minhash`, probabilistic) and length bucketing
(:mod:`.ngram`): for Jaccard threshold t, order every doc's token set by
GLOBAL rarity and emit only its first ``s - ceil(t·s) + 1`` tokens as
join keys. Two sets with Jaccard ≥ t MUST share a prefix token under a
consistent global order (pigeonhole on the ≤ s - ceil(t·s) tokens either
set can afford to miss), so the equi-join on prefix tokens has **zero
false negatives** — this is an exact join, not an approximation — while
the rare-token-first order keeps candidate lists short (the most
selective tokens block first).

At 100 TB: the token-rank dictionary is vocab-sized (a broadcastable
side the way TF-IDF's vocab already is, plan-asserted there); the
candidate join shuffles on prefix tokens whose per-key fan-out the
rarity order actively minimizes; verification joins the full token sets
only for surviving candidate pairs. All thresholds are integer-scaled
(``10·inter ≥ 7·union``, ``ceil(0.7·s)`` as ``(7s+9) div 10``) so both
engines make bit-identical keep/drop decisions.

Honest selectivity caveat: prefix filtering earns its keep on LARGE,
Zipf-distributed vocabularies, where the rare prefix tokens block
almost nothing together. The synthetic testdata corpus has a ~31-token
vocabulary (``q_text_zipf_fit`` measures slope −0.18 vs natural text's
−1), so every prefix token is common and candidate generation here
degenerates toward the dup-cluster quadratic — on real corpora the
rare-first order is precisely what prevents that. MinHash banding
(:mod:`.minhash`) is the scale path when the vocabulary itself is
degenerate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

# t = 0.7 as the exact fraction 7/10 — never a float threshold.
_T_NUM, _T_DEN = 7, 10

_QPREFIX_ORACLE = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM toks GROUP BY tok),
ranked AS (SELECT tok, ROW_NUMBER() OVER (ORDER BY df, tok) AS rnk FROM tf),
dt AS (
  SELECT t.doc_id, t.tok,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY r.rnk) AS pos,
         COUNT(*) OVER (PARTITION BY t.doc_id) AS s
  FROM toks t JOIN ranked r ON r.tok = t.tok
),
pref AS (
  SELECT doc_id, tok, s FROM dt
  WHERE pos <= s - (({_T_NUM} * s + {_T_DEN - 1}) // {_T_DEN}) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.s AS sa, b.s AS sb
  FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.da, c.db, c.sa, c.sb, CAST(COUNT(*) AS BIGINT) AS i
  FROM cand c
  JOIN toks ta ON ta.doc_id = c.da
  JOIN toks tb ON tb.doc_id = c.db AND tb.tok = ta.tok
  GROUP BY c.da, c.db, c.sa, c.sb
),
matched AS (
  SELECT da, db, i, sa, sb,
         CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE) AS jac_raw
  FROM inter
  WHERE {_T_DEN} * i >= {_T_NUM} * (sa + sb - i)
),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs_total FROM matched)
SELECT m.da AS doc_a, m.db AS doc_b, m.i AS n_common,
       m.sa AS size_a, m.sb AS size_b,
       ROUND(m.jac_raw, 4) AS jaccard,
       t.n_pairs_total
FROM matched m CROSS JOIN total t
ORDER BY m.jac_raw DESC, m.da, m.db
LIMIT 200
"""


@register(
    "q_dedup_prefix_filter_join",
    oracle=_QPREFIX_ORACLE,
    description=(
        "exact Jaccard>=0.7 set-similarity self-join via PPJoin-style "
        "prefix filtering (rare-token-first global order, zero false "
        "negatives, integer-scaled thresholds)"
    ),
    tags=("dedup", "similarity-join", "prefix-filter", "exact", "scale"),
)
def q_dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    ranked = tf.select(
        "tok", F.row_number().over(Window.orderBy("df", "tok")).alias("rnk")
    )
    dt = toks.join(ranked, on="tok").select(
        "doc_id",
        "tok",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy("rnk"))
        .alias("pos"),
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("s"),
    )
    pref = dt.where(
        F.col("pos")
        <= F.expr(f"s - (({_T_NUM} * s + {_T_DEN - 1}) div {_T_DEN}) + 1")
    ).select("doc_id", "tok", "s")

    a = pref.select(
        F.col("doc_id").alias("da"), F.col("tok").alias("tok"), F.col("s").alias("sa")
    )
    b = pref.select(
        F.col("doc_id").alias("db"), F.col("tok").alias("tok"), F.col("s").alias("sb")
    )
    cand = (
        a.join(b, on="tok")
        .where(F.col("da") < F.col("db"))
        .select("da", "db", "sa", "sb")
        .distinct()
    )

    ta = toks.select(F.col("doc_id").alias("da"), F.col("tok").alias("tok"))
    tb = toks.select(F.col("doc_id").alias("db"), F.col("tok").alias("tok"))
    inter = (
        cand.join(ta, on="da")
        .join(tb, on=["db", "tok"])
        .groupBy("da", "db", "sa", "sb")
        .agg(F.count(F.lit(1)).cast("long").alias("i"))
    )
    union = F.col("sa") + F.col("sb") - F.col("i")
    matched = inter.where(
        F.lit(_T_DEN) * F.col("i") >= F.lit(_T_NUM) * union
    ).withColumn("jac_raw", F.col("i").cast("double") / union.cast("double"))
    total = matched.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs_total")
    )
    # Top-200 by the UNROUNDED jaccard (identical doubles in both
    # engines -> identical order) with id tie-breaks, so the LIMIT
    # boundary is deterministic; the corpus is heavily templated, so the
    # full pair list is quadratic-ish in dup-cluster size at any SF.
    return (
        matched.crossJoin(F.broadcast(total))
        .orderBy(F.col("jac_raw").desc(), "da", "db")
        .limit(200)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.col("i").alias("n_common"),
            F.col("sa").alias("size_a"),
            F.col("sb").alias("size_b"),
            F.round(F.col("jac_raw"), 4).alias("jaccard"),
            "n_pairs_total",
        )
    )
