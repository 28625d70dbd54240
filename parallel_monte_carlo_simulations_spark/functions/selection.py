"""Quality-ranked data selection under a token budget — the
bucket-threshold formulation that scales.

"Take the best documents until the token budget is spent" is the core
move of quality-filtered pretraining mixes (quality classifiers ranked
+ budgeted). The naive formulation — global sort by quality, cumulative
token window, cut at the budget — is a SINGLE-PARTITION global window:
correct on a laptop, a straggler at 100 TB. The scalable equivalent:

1. Quantize the quality score into buckets (here: 3 decimals — ~1000
   distinct keys regardless of corpus size).
2. Aggregate tokens per bucket (map-side combinable groupBy) and run
   the cumulative sum over the BUCKET table — thousands of rows, not
   billions; the only full ordering lives there.
3. Every document strictly above the threshold bucket is selected
   outright; the boundary bucket alone gets a per-doc cumulative window
   (bounded by the bucket's size) to fill the remaining budget,
   ordered by doc_id for determinism.

The quality signal is deterministic lexical diversity (distinct tokens
/ tokens); tokens are whitespace words. Output: per-source selection
report (docs and tokens selected vs available), fully oracled — the
oracle spells the identical bucket-threshold algorithm, so the
boundary tie-handling is verified, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

TOKEN_BUDGET = 20_000  #: tokens to keep (of ~30k at sf0.01)

_QSELECT_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         FLOOR((len(list_distinct(string_split(text, ' ')))
               * 1.0 / len(string_split(text, ' '))) * 1e3 + 0.5) / 1e3 AS q
  FROM documents
  WHERE len(string_split(text, ' ')) > 0
),
buckets AS (
  SELECT q, CAST(SUM(n_tokens) AS BIGINT) AS bucket_tokens
  FROM scored GROUP BY q
),
cum AS (
  SELECT q, bucket_tokens,
         SUM(bucket_tokens) OVER (ORDER BY q DESC) AS cum_tokens
  FROM buckets
),
threshold AS (
  -- q_star: lowest FULLY-included bucket (NULL if even the top bucket
  -- overflows the budget); b_q: the boundary bucket filled partially.
  SELECT (SELECT MIN(q) FROM cum WHERE cum_tokens <= {TOKEN_BUDGET}) AS q_star
),
boundary_q AS (
  SELECT MAX(b.q) AS b_q FROM buckets b, threshold t
  WHERE t.q_star IS NULL OR b.q < t.q_star
),
above AS (
  SELECT s.* FROM scored s, threshold t WHERE s.q >= t.q_star
),
spent AS (SELECT COALESCE(CAST(SUM(n_tokens) AS BIGINT), 0) AS used
          FROM above),
boundary AS (
  SELECT s.doc_id, s.source, s.n_tokens
  FROM (
    SELECT s.*, SUM(s.n_tokens) OVER (ORDER BY s.doc_id) AS cum_b
    FROM scored s, boundary_q t WHERE s.q = t.b_q
  ) s, spent
  WHERE s.cum_b + spent.used <= {TOKEN_BUDGET}
),
selected AS (
  SELECT doc_id, source, n_tokens FROM above
  UNION ALL
  SELECT doc_id, source, n_tokens FROM boundary
)
SELECT sc.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs_available,
       CAST(SUM(sc.n_tokens) AS BIGINT) AS tokens_available,
       CAST(COUNT(sel.doc_id) AS BIGINT) AS n_docs_selected,
       CAST(COALESCE(SUM(sel.n_tokens), 0) AS BIGINT) AS tokens_selected
FROM scored sc LEFT JOIN selected sel ON sc.doc_id = sel.doc_id
GROUP BY sc.source
ORDER BY sc.source
"""


@register(
    "q_curation_token_budget",
    oracle=_QSELECT_ORACLE,
    description=(
        f"quality-ranked selection under a {TOKEN_BUDGET}-token budget "
        "via bucket-threshold (quantized-quality histogram cumsum + "
        "bounded boundary-bucket window — no global per-doc sort); "
        "per-source selection report"
    ),
    tags=("curation", "selection", "budget", "quality", "llm-pipeline"),
)
def q_curation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = F.split("text", " ")
    scored = d.select(
        "doc_id",
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        (F.floor((F.size(F.array_distinct(toks)) / F.size(toks)) * 1e3 + 0.5) / 1e3).alias("q"),
    ).filter(F.col("n_tokens") > 0)

    buckets = scored.groupBy("q").agg(
        F.sum("n_tokens").cast("long").alias("bucket_tokens")
    )
    wq = Window.orderBy(F.desc("q")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = buckets.withColumn("cum_tokens", F.sum("bucket_tokens").over(wq))
    # q_star: lowest FULLY-included bucket (NULL if even the top bucket
    # overflows the budget); b_q: the boundary bucket filled partially.
    threshold = cum.filter(F.col("cum_tokens") <= TOKEN_BUDGET).agg(
        F.min("q").alias("q_star")
    )
    boundary_q = (
        buckets.join(F.broadcast(threshold))
        .filter(F.col("q_star").isNull() | (F.col("q") < F.col("q_star")))
        .agg(F.max("q").alias("b_q"))
    )

    above = scored.join(F.broadcast(threshold)).filter(
        F.col("q") >= F.col("q_star")
    )
    spent = above.agg(
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("used")
    )
    # the boundary bucket can adversarially hold the whole corpus (all
    # docs sharing one 3-dp quality score), so its doc_id-ordered fill
    # runs through the range-bucketed kernel (round 11), not a global
    # window.
    from ..operators.rankstats import bucketed_running

    boundary = (
        bucketed_running(
            scored.join(F.broadcast(boundary_q)).filter(
                F.col("q") == F.col("b_q")
            ),
            axis="doc_id",
            order=[F.col("doc_id").asc()],
            cums={"cum_b": F.col("n_tokens")},
        )
        .join(F.broadcast(spent))
        .filter(F.col("cum_b") + F.col("used") <= TOKEN_BUDGET)
        .select("doc_id", "source", "n_tokens")
    )
    selected = above.select("doc_id", "source", "n_tokens").unionByName(
        boundary
    )
    return (
        scored.alias("sc")
        .join(
            selected.select(F.col("doc_id").alias("sel_id"), F.col("n_tokens").alias("sel_tokens")),
            F.col("sc.doc_id") == F.col("sel_id"),
            "left",
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs_available"),
            F.sum("sc.n_tokens").cast("long").alias("tokens_available"),
            F.count("sel_id").cast("long").alias("n_docs_selected"),
            F.coalesce(F.sum("sel_tokens"), F.lit(0))
            .cast("long")
            .alias("tokens_selected"),
        )
        .orderBy("source")
    )
