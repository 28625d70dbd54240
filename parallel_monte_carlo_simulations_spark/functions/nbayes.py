"""Multinomial Naive Bayes text classifier — training as aggregation.

The "ML training at 100 TB is a groupBy" pattern, applied to
classification: the entire fit is three counts (class priors, per-class
token totals, per-(class, token) counts with Laplace smoothing) — one
pass, map-side combined, nothing collected. Scoring joins each doc's
term counts against the likelihood table (an equi-join on token; the
class dimension is a broadcast) and argmaxes the per-class score.
Trained and evaluated on the documents table's ``lang`` label; the
output is the confusion matrix.

Determinism engineering (the interesting part): a log-likelihood score
is a SUM of doubles, which is order-dependent under Spark's partial
aggregation — and an argmax over near-tied float sums is exactly where
cross-engine last-ulp differences become a WRONG ANSWER, not a rounding
blur. So each ``ln`` term is rounded to 9 decimals and quantized to
DECIMAL *before* summing: the sums become exact and order-independent in
both engines, the argmax compares identical decimals, and ties (e.g. an
all-out-of-vocabulary doc under equal priors) break on the class name
identically. The only residual risk is a 1-ulp libm ``ln`` difference
landing exactly on a 9-decimal rounding boundary — the same accepted
exposure as every rounded float in this repo, but paid once per TERM
instead of compounding across a sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

_NB_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
dt AS (
  SELECT doc_id, lang AS lang_true, tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks GROUP BY doc_id, lang, tok
),
cls AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs_c FROM documents GROUP BY lang),
tokc AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tok_c FROM toks GROUP BY lang),
vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM toks),
lw AS (
  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS n_wc
  FROM toks GROUP BY lang, tok
),
ndocs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
terms AS (
  SELECT dt.doc_id, dt.lang_true, tc.lang AS lang_pred, dt.cnt,
         CAST(FLOOR((ln((COALESCE(lw.n_wc, 0) + 1)
                       / CAST(tc.n_tok_c + v.v AS DOUBLE))) * 1e9 + 0.5) / 1e9
              AS DECIMAL(18,9)) AS lnp
  FROM dt
  CROSS JOIN tokc tc
  CROSS JOIN vocab v
  LEFT JOIN lw ON lw.lang = tc.lang AND lw.tok = dt.tok
),
scores AS (
  SELECT doc_id, lang_true, lang_pred, SUM(cnt * lnp) AS s
  FROM terms GROUP BY doc_id, lang_true, lang_pred
),
wpri AS (
  SELECT s.doc_id, s.lang_true, s.lang_pred,
         s.s + CAST(FLOOR((ln(c.n_docs_c / CAST(n.n AS DOUBLE))) * 1e9 + 0.5) / 1e9
                    AS DECIMAL(18,9)) AS score
  FROM scores s
  JOIN cls c ON c.lang = s.lang_pred
  CROSS JOIN ndocs n
),
pred AS (
  SELECT doc_id, lang_true, lang_pred,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang_pred) AS rk
  FROM wpri
)
SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred WHERE rk = 1
GROUP BY lang_true, lang_pred
ORDER BY lang_true, lang_pred
"""


@register(
    "q_naive_bayes_confusion",
    oracle=_NB_ORACLE,
    description=(
        "multinomial Naive Bayes lang classifier trained by aggregation "
        "(Laplace smoothing); exact-decimal log-likelihood argmax; "
        "confusion matrix over the documents table"
    ),
    tags=("ml", "classifier", "text", "llm-pipeline", "aggregate"),
)
def q_naive_bayes_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    dt = toks.groupBy(
        "doc_id", F.col("lang").alias("lang_true"), "tok"
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))

    cls = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_c")
    )
    tokc = toks.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok_c")
    )
    vocab = toks.agg(F.countDistinct("tok").cast("long").alias("v"))
    lw = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("n_wc")
    )
    ndocs = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))

    # Per-term log-likelihood, quantized to DECIMAL(18,9) before the sum
    # so the score aggregation is exact and order-independent.
    lnp = (F.floor((F.log(
            (F.coalesce(F.col("n_wc"), F.lit(0)) + 1)
            / (F.col("n_tok_c") + F.col("v")).cast("double")
        )) * 1e9 + 0.5) / 1e9).cast("decimal(18,9)")
    terms = (
        dt.crossJoin(F.broadcast(tokc.select(F.col("lang").alias("lang_pred"), "n_tok_c")))
        .crossJoin(F.broadcast(vocab))
        .join(
            # lw is (class x vocab)-sized — vocab grows with the corpus
            # and the post-explode static estimate is bogus-small, so
            # without a hint the planner broadcasts it (round-8 registry
            # audit). Pin sort-merge; the class-keyed tokc and keyless
            # vocab broadcasts above stay correct (bounded class domain).
            lw.select(
                F.col("lang").alias("lang_pred"),
                F.col("tok"),
                F.col("n_wc"),
            ).hint("merge"),
            on=["lang_pred", "tok"],
            how="left",
        )
        .select("doc_id", "lang_true", "lang_pred", "cnt", lnp.alias("lnp"))
    )
    scores = terms.groupBy("doc_id", "lang_true", "lang_pred").agg(
        F.sum(F.col("cnt") * F.col("lnp")).alias("s")
    )
    prior = (F.floor((F.log(F.col("n_docs_c") / F.col("n").cast("double"))) * 1e9 + 0.5) / 1e9).cast("decimal(18,9)")
    wpri = (
        scores.join(
            F.broadcast(cls.select(F.col("lang").alias("lang_pred"), "n_docs_c")),
            on="lang_pred",
        )
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id",
            "lang_true",
            "lang_pred",
            (F.col("s") + prior).alias("score"),
        )
    )
    pred = wpri.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.col("score").desc(), "lang_pred"
            )
        ),
    ).where(F.col("rk") == 1)
    return (
        pred.groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("lang_true", "lang_pred")
    )
