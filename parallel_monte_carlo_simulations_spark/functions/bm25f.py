"""BM25F: field-weighted BM25 ranking (round 10).

Real documents have structure — a title match is worth more than a
body match. BM25F (Robertson/Zaragoza) folds per-field term
frequencies into one weighted tf with per-field length normalization,
then applies the usual saturation and idf ONCE on the combined tf.
Here the synthetic documents get a deterministic two-field split:
title = first ``_TITLE_K`` tokens (weight 2.0), body = the rest
(weight 1.0) — the plumbing (per-field tf/length aggregation, weighted
combination, shared idf) is exactly what a title/body/anchor corpus
needs at 100 TB: everything is term- or doc-keyed aggregation, the
idf/stats frames are tiny broadcasts, and the final cut is a
distributed top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table
from .text import _BM25_K1, _BM25_TERMS

_TITLE_K = 5
_W_TITLE = 2.0
_W_BODY = 1.0
_B_TITLE = 0.5   # titles are short: normalize them less
_B_BODY = 0.75
_TOPK = 20

_QBM25F_ORACLE = f"""
WITH fields AS (
  SELECT doc_id,
         string_split(text, ' ')[1:{_TITLE_K}]  AS title_toks,
         string_split(text, ' ')[{_TITLE_K + 1}:] AS body_toks
  FROM documents
),
fl AS (
  SELECT doc_id, len(title_toks) AS tl, len(body_toks) AS bl FROM fields
),
stats AS (
  SELECT COUNT(*)                  AS n_docs,
         SUM(tl) * 1.0 / COUNT(*)  AS avg_tl,
         SUM(bl) * 1.0 / COUNT(*)  AS avg_bl
  FROM fl
),
tf AS (
  SELECT f.doc_id, q.term,
         len(list_filter(f.title_toks, t -> t = q.term)) AS tf_t,
         len(list_filter(f.body_toks,  t -> t = q.term)) AS tf_b
  FROM fields f CROSS JOIN (SELECT unnest({list(_BM25_TERMS)!r}) AS term) q
  WHERE len(list_filter(f.title_toks, t -> t = q.term))
        + len(list_filter(f.body_toks, t -> t = q.term)) > 0
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         CAST(FLOOR((LN((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (({_W_TITLE} * tf.tf_t
               / (1.0 - {_B_TITLE} + {_B_TITLE} * fl.tl / s.avg_tl))
              + ({_W_BODY} * tf.tf_b
                 / (1.0 - {_B_BODY} + {_B_BODY} * fl.bl / s.avg_bl)))
           / ({_BM25_K1}
              + ({_W_TITLE} * tf.tf_t
                 / (1.0 - {_B_TITLE} + {_B_TITLE} * fl.tl / s.avg_tl))
              + ({_W_BODY} * tf.tf_b
                 / (1.0 - {_B_BODY} + {_B_BODY} * fl.bl / s.avg_bl)))) * 1e8 + 0.5) / 1e8 AS DECIMAL(24,8)) AS term_score
  FROM tf
  JOIN dfreq d USING (term)
  JOIN fl ON fl.doc_id = tf.doc_id
  CROSS JOIN stats s
)
SELECT doc_id, FLOOR((CAST(SUM(term_score) AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS bm25f
FROM scored GROUP BY doc_id
ORDER BY bm25f DESC, doc_id
LIMIT {_TOPK}
"""


@register(
    "q_search_bm25f",
    oracle=_QBM25F_ORACLE,
    description=(
        f"BM25F field-weighted retrieval for query "
        f"{' '.join(_BM25_TERMS)!r}: title (first {_TITLE_K} tokens, "
        f"weight {_W_TITLE}) + body, per-field length normalization, "
        "shared idf, saturation on the combined tf; per-term scores "
        "quantize to DECIMAL before the per-doc sum; distributed top-k"
    ),
    tags=("text", "bm25f", "retrieval", "scoring", "search"),
)
def q_search_bm25f(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    fields = d.select(
        "doc_id",
        F.slice(toks, 1, _TITLE_K).alias("title_toks"),
        F.expr(f"slice(split(text, ' '), {_TITLE_K + 1}, size(split(text, ' ')))")
        .alias("body_toks"),
    )
    fl = fields.select(
        "doc_id",
        F.size("title_toks").alias("tl"),
        F.size("body_toks").alias("bl"),
    )
    stats = fl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("tl") * 1.0 / F.count(F.lit(1))).alias("avg_tl"),
        (F.sum("bl") * 1.0 / F.count(F.lit(1))).alias("avg_bl"),
    )
    qterms = spark.createDataFrame(
        [(t,) for t in _BM25_TERMS], "term string"
    )
    cnt = lambda fcol: F.size(  # noqa: E731
        F.filter(F.col(fcol), lambda t: t == F.col("term"))
    )
    tf = (
        fields.crossJoin(F.broadcast(qterms))
        .select(
            "doc_id",
            "term",
            cnt("title_toks").alias("tf_t"),
            cnt("body_toks").alias("tf_b"),
        )
        .filter(F.col("tf_t") + F.col("tf_b") > 0)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    wtf = (
        _W_TITLE
        * F.col("tf_t")
        / (1.0 - _B_TITLE + _B_TITLE * F.col("tl") / F.col("avg_tl"))
    ) + (
        _W_BODY
        * F.col("tf_b")
        / (1.0 - _B_BODY + _B_BODY * F.col("bl") / F.col("avg_bl"))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(fl.hint("merge"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (F.floor((idf * wtf / (_BM25_K1 + wtf)) * 1e8 + 0.5) / 1e8)
            .cast("decimal(24,8)")
            .alias("term_score"),
        )
        .groupBy("doc_id")
        .agg((F.floor((F.sum("term_score").cast("double")) * 1e4 + 0.5) / 1e4).alias("bm25f"))
    )
    return scored.orderBy(F.desc("bm25f"), "doc_id").limit(_TOPK)
