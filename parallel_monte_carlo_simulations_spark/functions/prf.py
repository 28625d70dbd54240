"""Pseudo-relevance-feedback query expansion (Rocchio-style, round 10).

The classic two-stage retrieval composite: run BM25 for the base
query, take the top ``_FB_DOCS`` documents as pseudo-relevant, mine
their ``_FB_TERMS`` highest tf·idf terms (excluding the base terms) as
expansion terms at a reduced weight, and re-run BM25 with the expanded
query. Every stage is the term-/doc-keyed aggregation BM25 already
uses; the expansion-term frame is LIMIT-bounded (3 rows), so stage 2's
extra cost over plain BM25 is one more tiny broadcast. All tie-breaks
cut on ROUNDED scores with id/term tiebreakers so both engines select
the identical feedback set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .text import _BM25_B, _BM25_K1, _BM25_TERMS

_FB_DOCS = 5
_FB_TERMS = 3
_EXP_WEIGHT = 0.5
_TOPK = 10

_T0 = "('" + "', '".join(_BM25_TERMS) + "')"

_QPRF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (
  SELECT doc_id, len(list_filter(string_split(text, ' '), t -> t <> '')) AS dl
  FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM dl
),
tf0 AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN {_T0} GROUP BY doc_id, term
),
df0 AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf0 GROUP BY term),
s0 AS (
  SELECT tf0.doc_id,
         SUM(CAST(FLOOR((LN((s.n_docs - df0.df + 0.5) / (df0.df + 0.5) + 1.0)
           * tf0.tf * ({_BM25_K1} + 1.0)
           / (tf0.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                                     + {_BM25_B} * dl.dl / s.avgdl))) * 1e8 + 0.5) / 1e8
           AS DECIMAL(24,8))) AS score_q
  FROM tf0
  JOIN df0 USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf0.doc_id
),
top_fb AS (
  SELECT doc_id FROM s0
  ORDER BY FLOOR((CAST(score_q AS DOUBLE)) * 1e4 + 0.5) / 1e4 DESC, doc_id
  LIMIT {_FB_DOCS}
),
cand AS (
  SELECT t.term, COUNT(*) AS tf_fb
  FROM toks t JOIN top_fb USING (doc_id)
  WHERE t.term NOT IN {_T0} AND t.term <> ''
  GROUP BY t.term
),
dfc AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df
  FROM toks JOIN cand USING (term) GROUP BY term
),
exp_terms AS (
  SELECT c.term FROM cand c JOIN dfc USING (term) CROSS JOIN stats s
  ORDER BY FLOOR((c.tf_fb * LN(CAST(s.n_docs AS DOUBLE) / dfc.df)) * 1e6 + 0.5) / 1e6 DESC,
           c.term
  LIMIT {_FB_TERMS}
),
q2 AS (
  SELECT term, 1.0 AS wq FROM (SELECT unnest({list(_BM25_TERMS)!r}) AS term)
  UNION ALL
  SELECT term, {_EXP_WEIGHT} AS wq FROM exp_terms
),
tf2 AS (
  SELECT t.doc_id, t.term, q2.wq, COUNT(*) AS tf
  FROM toks t JOIN q2 USING (term)
  GROUP BY t.doc_id, t.term, q2.wq
),
df2 AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf2 GROUP BY term),
s2 AS (
  SELECT tf2.doc_id,
         SUM(CAST(FLOOR((tf2.wq * LN((s.n_docs - df2.df + 0.5) / (df2.df + 0.5) + 1.0)
           * tf2.tf * ({_BM25_K1} + 1.0)
           / (tf2.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                                     + {_BM25_B} * dl.dl / s.avgdl))) * 1e8 + 0.5) / 1e8
           AS DECIMAL(24,8))) AS score_q
  FROM tf2
  JOIN df2 USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf2.doc_id
)
SELECT doc_id, FLOOR((CAST(score_q AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS prf_score
FROM s2
ORDER BY prf_score DESC, doc_id
LIMIT {_TOPK}
"""


@register(
    "q_search_query_expansion",
    oracle=_QPRF_ORACLE,
    description=(
        f"pseudo-relevance-feedback retrieval: BM25 for "
        f"{' '.join(_BM25_TERMS)!r} -> top-{_FB_DOCS} feedback docs -> "
        f"top-{_FB_TERMS} tf·idf expansion terms at weight "
        f"{_EXP_WEIGHT} -> expanded BM25 top-{_TOPK}; both stages are "
        "the same term-keyed aggregations, the expansion frame is "
        "LIMIT-bounded, ties cut on rounded scores"
    ),
    tags=("text", "retrieval", "prf", "query-expansion", "search"),
)
def q_search_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    dl = d.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("dl"),
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )

    def _bm25_scores(tf: DataFrame, weighted: bool) -> DataFrame:
        dfreq = tf.groupBy("term").agg(
            F.countDistinct("doc_id").alias("df")
        )
        idf = F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        )
        sat = (
            F.col("tf")
            * (_BM25_K1 + 1.0)
            / (
                F.col("tf")
                + _BM25_K1
                * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
            )
        )
        w = F.col("wq") if weighted else F.lit(1.0)
        return (
            tf.join(F.broadcast(dfreq), "term")
            .join(dl.hint("merge"), "doc_id")
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(
                F.sum(
                    (F.floor((w * idf * sat) * 1e8 + 0.5) / 1e8).cast("decimal(24,8)")
                ).alias("score_q")
            )
        )

    tf0 = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    s0 = _bm25_scores(tf0, weighted=False)
    top_fb = (
        s0.orderBy(
            (F.floor((F.col("score_q").cast("double")) * 1e4 + 0.5) / 1e4).desc(), F.asc("doc_id")
        )
        .limit(_FB_DOCS)
        .select("doc_id")
    )
    cand = (
        toks.join(F.broadcast(top_fb), "doc_id")
        .filter(~F.col("term").isin(*_BM25_TERMS) & (F.col("term") != ""))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf_fb"))
    )
    # df of candidate terms: vocab-keyed join of the corpus postings
    # with the (5-doc-vocabulary-sized, unbounded in principle)
    # candidate set — sort-merge, never broadcast.
    dfc = (
        toks.join(cand.hint("merge"), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    exp_terms = (
        cand.join(dfc.hint("merge"), "term")
        .crossJoin(F.broadcast(stats))
        .orderBy(
            (F.floor((F.col("tf_fb")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))) * 1e6 + 0.5) / 1e6).desc(),
            F.asc("term"),
        )
        .limit(_FB_TERMS)
        .select("term")
    )
    q2 = spark.createDataFrame(
        [(t, 1.0) for t in _BM25_TERMS], "term string, wq double"
    ).unionByName(exp_terms.withColumn("wq", F.lit(_EXP_WEIGHT)))
    tf2 = (
        toks.join(F.broadcast(q2), "term")
        .groupBy("doc_id", "term", "wq")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    s2 = _bm25_scores(tf2, weighted=True)
    return (
        s2.select(
            "doc_id",
            (F.floor((F.col("score_q").cast("double")) * 1e4 + 0.5) / 1e4).alias("prf_score"),
        )
        .orderBy(F.desc("prf_score"), F.asc("doc_id"))
        .limit(_TOPK)
    )
