"""LLM-pipeline curation, second batch (round 10): quality-threshold
retention sweeps, temperature-scaled domain mixing, dedup savings
accounting, token-entropy profiling, n-gram novelty, and pairwise
Jensen-Shannon drift between language subcorpora.

These are the accounting queries a 100 TB pretraining-data pipeline
runs BEFORE committing to a mix: how many tokens does each quality
threshold keep, what does exact dedup save per source, how far apart
are the subcorpora distributionally. All pure DataFrame aggregations —
vocab-keyed or source-keyed shuffles only (never row-expansion joins),
DECIMAL-quantized summands wherever a float sum crosses rows so the
DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .microunit import rdiv_halfup_duck, rdiv_halfup_expr
from ..registry import register
from ..tables import table
from .text import STOPWORDS

# --------------------------------------------------------------------------
# Quality-threshold retention sweep: docs/tokens kept per threshold.
# --------------------------------------------------------------------------

_EN_SW_SQL = "('" + "', '".join(STOPWORDS["en"]) + "')"

#: threshold grid: 0.30 .. 0.75 step 0.05 (the operating range of the
#: composite quality score on this corpus).
_SWEEP_THRESHOLDS = [round(0.30 + 0.05 * i, 2) for i in range(10)]

_QSWEEP_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         FLOOR((0.4 * LEAST(length(text) / 500.0, 1.0)
           + 0.4 * (len(list_distinct(string_split(text, ' '))) * 1.0
                    / len(string_split(text, ' ')))
           + 0.2 * LEAST(len(list_filter(string_split(text, ' '),
                                         t -> t IN {_EN_SW_SQL})) * 5.0
                         / len(string_split(text, ' ')), 1.0)) * 1e6 + 0.5) / 1e6 AS q
  FROM documents
),
grid AS (SELECT unnest({_SWEEP_THRESHOLDS!r}) AS threshold),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS docs_total,
         CAST(SUM(n_tokens) AS BIGINT) AS tokens_total
  FROM scored
)
SELECT g.threshold,
       CAST(COUNT(*) FILTER (WHERE s.q >= g.threshold) AS BIGINT)
         AS docs_kept,
       CAST(COALESCE(SUM(s.n_tokens) FILTER (WHERE s.q >= g.threshold), 0)
            AS BIGINT) AS tokens_kept,
       FLOOR((COUNT(*) FILTER (WHERE s.q >= g.threshold) * 1.0
             / ANY_VALUE(t.docs_total)) * 1e6 + 0.5) / 1e6 AS doc_retention,
       FLOOR((COALESCE(SUM(s.n_tokens) FILTER (WHERE s.q >= g.threshold), 0)
             * 1.0 / ANY_VALUE(t.tokens_total)) * 1e6 + 0.5) / 1e6 AS token_retention
FROM grid g CROSS JOIN scored s CROSS JOIN tot t
GROUP BY g.threshold
"""


@register(
    "q_curation_quality_sweep",
    oracle=_QSWEEP_ORACLE,
    description=(
        "quality-threshold retention curve: for a 10-point threshold "
        "grid over the composite quality score, how many documents and "
        "tokens survive — the sweep a data-mix owner reads before "
        "picking the cut; comparisons happen on the ROUNDED score so "
        "the boundary is cross-engine exact"
    ),
    tags=("curation", "quality", "sweep", "llm-pipeline"),
)
def q_curation_quality_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan scores every doc; the 10-row threshold grid broadcasts
    and the sweep is a conditional aggregation — grid x corpus rows
    never materialize beyond the partial aggregates. At 100 TB this is
    a single pass regardless of grid size."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"])))
    q = (F.floor((0.4 * F.least(F.length("text") / 500.0, F.lit(1.0))
        + 0.4 * (F.size(F.array_distinct(toks)) / n)
        + 0.2 * F.least(sw * 5.0 / n, F.lit(1.0))) * 1e6 + 0.5) / 1e6)
    scored = d.select(n.alias("n_tokens"), q.alias("q"))
    grid = spark.createDataFrame(
        [(t,) for t in _SWEEP_THRESHOLDS], "threshold double"
    )
    tot = scored.agg(
        F.count(F.lit(1)).cast("long").alias("docs_total"),
        F.sum("n_tokens").cast("long").alias("tokens_total"),
    )
    kept = F.col("q") >= F.col("threshold")
    return (
        scored.crossJoin(F.broadcast(grid))
        .crossJoin(F.broadcast(tot))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("docs_kept"),
            F.coalesce(F.sum(F.when(kept, F.col("n_tokens"))), F.lit(0))
            .cast("long")
            .alias("tokens_kept"),
            (F.floor((F.sum(F.when(kept, 1).otherwise(0))
                / F.any_value("docs_total")) * 1e6 + 0.5) / 1e6).alias("doc_retention"),
            (F.floor((F.coalesce(F.sum(F.when(kept, F.col("n_tokens"))), F.lit(0))
                / F.any_value("tokens_total")) * 1e6 + 0.5) / 1e6).alias("token_retention"),
        )
    )


# --------------------------------------------------------------------------
# Temperature-scaled domain mixing weights (alpha = 0.5 -> sqrt scaling).
# --------------------------------------------------------------------------

_MIX_BUDGET = 1_000_000  # tokens drawn under the mixed distribution

_QTEMPMIX_ORACLE = f"""
WITH per_source AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS t FROM per_source),
w AS (
  SELECT source, toks,
         CAST(FLOOR((SQRT(CAST(toks AS DOUBLE) / t.t)) * 1e10 + 0.5) / 1e10
              AS DECIMAL(24,10)) AS wq
  FROM per_source CROSS JOIN tot t
),
norm AS (SELECT CAST(SUM(wq) AS DOUBLE) AS z FROM w)
SELECT w.source, w.toks AS tokens_available,
       FLOOR((CAST(w.wq AS DOUBLE) / n.z) * 1e6 + 0.5) / 1e6   AS mix_weight,
       CAST(FLOOR({_MIX_BUDGET} * CAST(w.wq AS DOUBLE) / n.z) AS BIGINT)
         AS tokens_drawn,
       FLOOR(({_MIX_BUDGET} * CAST(w.wq AS DOUBLE) / n.z
             / w.toks) * 1e6 + 0.5) / 1e6                      AS epochs_implied
FROM w CROSS JOIN norm n
"""


@register(
    "q_curation_temperature_mix",
    oracle=_QTEMPMIX_ORACLE,
    description=(
        "temperature-scaled domain mixing (alpha=0.5): per-source "
        "sampling weight proportional to sqrt(token share), the expected "
        "tokens drawn for a 1M budget, and the implied epoch count per "
        "source — the standard multi-domain pretraining mix computation; "
        "sqrt is IEEE-correctly-rounded so the weights are cross-engine "
        "exact, and the normalizer sums DECIMAL-quantized weights"
    ),
    tags=("curation", "mixing", "sampling", "llm-pipeline"),
)
def q_curation_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("toks")
    )
    tot = per_source.agg(F.sum("toks").cast("long").alias("t"))
    w = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "toks",
        (F.floor((F.sqrt(F.col("toks").cast("double") / F.col("t"))) * 1e10 + 0.5) / 1e10)
        .cast("decimal(24,10)")
        .alias("wq"),
    )
    norm = w.agg(F.sum("wq").cast("double").alias("z"))
    share = F.col("wq").cast("double") / F.col("z")
    return w.crossJoin(F.broadcast(norm)).select(
        "source",
        F.col("toks").alias("tokens_available"),
        (F.floor((share) * 1e6 + 0.5) / 1e6).alias("mix_weight"),
        F.floor(_MIX_BUDGET * share).cast("long").alias("tokens_drawn"),
        (F.floor((_MIX_BUDGET * share / F.col("toks")) * 1e6 + 0.5) / 1e6).alias(
            "epochs_implied"
        ),
    )


# --------------------------------------------------------------------------
# Dedup savings accounting: what exact dedup saves, per source.
# --------------------------------------------------------------------------

_QSAVINGS_ORACLE = """
WITH docs AS (
  SELECT doc_id, source, md5(text) AS h,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
canon AS (
  SELECT h, MIN(doc_id) AS keeper FROM docs GROUP BY h
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT)                         AS docs_total,
       CAST(SUM(CASE WHEN d.doc_id = c.keeper THEN 1 ELSE 0 END)
            AS BIGINT)                                  AS docs_kept,
       CAST(SUM(d.n_tokens) AS BIGINT)                  AS tokens_total,
       CAST(SUM(CASE WHEN d.doc_id = c.keeper THEN d.n_tokens ELSE 0 END)
            AS BIGINT)                                  AS tokens_kept,
       FLOOR((1.0 - SUM(CASE WHEN d.doc_id = c.keeper THEN d.n_tokens
                            ELSE 0 END) * 1.0 / SUM(d.n_tokens)) * 1e6 + 0.5) / 1e6
                                                        AS token_savings
FROM docs d JOIN canon c USING (h)
GROUP BY d.source
"""


@register(
    "q_curation_dedup_savings",
    oracle=_QSAVINGS_ORACLE,
    description=(
        "dedup savings accounting: per source, documents and tokens "
        "before/after exact (md5) dedup with min-doc_id keeper election "
        "— the 'what does dedup buy us' report that justifies the "
        "pipeline stage; the keeper join is content-hash-keyed, the "
        "shape that holds at 100 TB"
    ),
    tags=("curation", "dedup", "accounting", "llm-pipeline"),
)
def q_curation_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        "source",
        F.md5(F.col("text")).alias("h"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    canon = docs.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    kept = F.col("doc_id") == F.col("keeper")
    # canon is corpus-sized (one row per distinct content hash) — never
    # broadcast; sort-merge on the hash key.
    return (
        docs.join(canon.hint("merge"), "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs_total"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("docs_kept"),
            F.sum("n_tokens").cast("long").alias("tokens_total"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("tokens_kept"),
            (F.floor((1.0
                - F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
                / F.sum("n_tokens")) * 1e6 + 0.5) / 1e6).alias("token_savings"),
        )
    )


# --------------------------------------------------------------------------
# Token-entropy profile: per-doc Shannon entropy, aggregated per source.
# --------------------------------------------------------------------------

_QENTROPY_ORACLE = """
WITH tok AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
  FROM documents
),
cnt AS (
  SELECT doc_id, source, t, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY doc_id, source, t
),
n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY doc_id),
terms AS (
  SELECT cnt.doc_id, cnt.source,
         CAST(FLOOR(((CAST(cnt.c AS DOUBLE) / n.n)
                    * LN(CAST(n.n AS DOUBLE) / cnt.c)) * 1e10 + 0.5) / 1e10
              AS DECIMAL(24,10)) AS tq
  FROM cnt JOIN n USING (doc_id)
),
ent AS (
  SELECT doc_id, source,
         CAST(SUM(tq) AS DECIMAL(24,10)) AS h
  FROM terms GROUP BY doc_id, source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT)                   AS n_docs,
       FLOOR((CAST(SUM(h) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS avg_entropy,
       FLOOR((CAST(MIN(h) AS DOUBLE)) * 1e6 + 0.5) / 1e6            AS min_entropy,
       FLOOR((CAST(MAX(h) AS DOUBLE)) * 1e6 + 0.5) / 1e6            AS max_entropy
FROM ent GROUP BY source
"""


@register(
    "q_text_token_entropy",
    oracle=_QENTROPY_ORACLE,
    description=(
        "token-entropy profiling: per-document Shannon entropy (nats) "
        "over the token distribution, aggregated to per-source "
        "avg/min/max — low-entropy documents are repetitive boilerplate, "
        "the gibberish/spam screen in LLM curation; per-token plogp "
        "terms quantized to DECIMAL so per-doc entropies are "
        "order-independent"
    ),
    tags=("text", "entropy", "quality", "curation", "llm-pipeline"),
)
def q_text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    cnt = (
        d.select(
            "doc_id", "source", F.explode(F.split(F.col("text"), " ")).alias("t")
        )
        .groupBy("doc_id", "source", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n = cnt.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n"))
    # n is per-doc (corpus-sized): sort-merge on doc_id, not broadcast.
    terms = cnt.join(n.hint("merge"), "doc_id").select(
        "doc_id",
        "source",
        (F.floor(((F.col("c").cast("double") / F.col("n"))
            * F.log(F.col("n").cast("double") / F.col("c"))) * 1e10 + 0.5) / 1e10)
        .cast("decimal(24,10)")
        .alias("tq"),
    )
    ent = terms.groupBy("doc_id", "source").agg(
        F.sum("tq").cast("decimal(24,10)").alias("h")
    )
    return ent.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.floor((F.sum("h").cast("double") / F.count(F.lit(1))) * 1e6 + 0.5) / 1e6).alias(
            "avg_entropy"
        ),
        (F.floor((F.min("h").cast("double")) * 1e6 + 0.5) / 1e6).alias("min_entropy"),
        (F.floor((F.max("h").cast("double")) * 1e6 + 0.5) / 1e6).alias("max_entropy"),
    )


# --------------------------------------------------------------------------
# N-gram novelty: share of a doc's trigrams it introduced to the corpus.
# --------------------------------------------------------------------------

def _novelty_oracle() -> str:
    from .hashing import VERIFY_SEED, sql_hash60_seeded, sql_shingles

    sh = sql_shingles("text", 3)
    h = sql_hash60_seeded("raw_shingle", VERIFY_SEED)
    return f"""
WITH sh AS (
  SELECT DISTINCT doc_id, source, {h} AS shingle
  FROM (
    SELECT doc_id, source, unnest({sh}) AS raw_shingle
    FROM documents)
),
firsts AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle),
per_doc AS (
  SELECT sh.doc_id, sh.source,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN sh.doc_id = f.first_doc THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel,
         CAST(FLOOR((SUM(CASE WHEN sh.doc_id = f.first_doc THEN 1 ELSE 0 END)
                    * 1.0 / COUNT(*)) * 1e10 + 0.5) / 1e10 AS DECIMAL(24,10)) AS novelty_q
  FROM sh JOIN firsts f USING (shingle)
  GROUP BY sh.doc_id, sh.source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT)                         AS n_docs,
       CAST(SUM(n_grams) AS BIGINT)                     AS grams_total,
       CAST(SUM(n_novel) AS BIGINT)                     AS grams_novel,
       FLOOR((CAST(SUM(novelty_q) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS avg_novelty
FROM per_doc GROUP BY source
"""


@register(
    "q_text_ngram_novelty",
    oracle=_novelty_oracle(),
    description=(
        "n-gram novelty: per document, the share of its distinct "
        "trigrams whose FIRST corpus occurrence (min doc_id) is this "
        "document, aggregated per source — measures how much genuinely "
        "new text a source contributes vs recycling earlier content; "
        "the first-occurrence election is one shingle-keyed groupBy "
        "over 60-bit hashed shingles (8-byte shuffle keys, not strings)"
    ),
    tags=("text", "novelty", "dedup", "curation", "llm-pipeline"),
)
def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .hashing import VERIFY_SEED, hash60_seeded, shingles

    d = table(spark, sf_dir, "documents")
    # 60-bit md5 hashes (the dedup convention): the distinct + election
    # shuffles carry 8-byte longs instead of ~25-byte shingle strings —
    # the oracle hashes the identical universe so a collision shifts
    # both engines the same way.
    sh = (
        d.select(
            "doc_id", "source", F.explode(shingles("text", 3)).alias("raw")
        )
        .select(
            "doc_id",
            "source",
            hash60_seeded("raw", VERIFY_SEED).alias("shingle"),
        )
        .distinct()
    )
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
    per_doc = (
        # firsts is shingle-count sized (corpus-scale) — sort-merge on
        # the shingle key, the same exchange the groupBy just produced.
        sh.join(firsts.hint("merge"), "shingle")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(novel).cast("long").alias("n_novel"),
            (F.floor((F.sum(novel) * 1.0 / F.count(F.lit(1))) * 1e10 + 0.5) / 1e10)
            .cast("decimal(24,10)")
            .alias("novelty_q"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_grams").cast("long").alias("grams_total"),
        F.sum("n_novel").cast("long").alias("grams_novel"),
        (F.floor((F.sum("novelty_q").cast("double") / F.count(F.lit(1))) * 1e6 + 0.5) / 1e6).alias(
            "avg_novelty"
        ),
    )


# --------------------------------------------------------------------------
# Jensen-Shannon divergence between language subcorpora (pairwise).
# --------------------------------------------------------------------------

_QJSD_ORACLE = """
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents
),
cnt AS (SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY lang, t),
tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY lang),
langs AS (SELECT DISTINCT lang FROM cnt),
pairs AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b
  FROM langs a JOIN langs b ON a.lang < b.lang
),
joint AS (
  SELECT p.lang_a, p.lang_b, COALESCE(ca.t, cb.t) AS t,
         COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
  FROM pairs p
  LEFT JOIN cnt ca ON ca.lang = p.lang_a
  FULL JOIN cnt cb ON cb.lang = p.lang_b AND ca.t = cb.t
  WHERE ca.t IS NOT NULL OR cb.t IS NOT NULL
)
SELECT 1 AS placeholder
"""

# The pairwise full-outer-join formulation above is awkward in pure SQL
# (DuckDB's FULL JOIN inside a lateral pair loop); the oracle instead
# unions per-pair aligned distributions explicitly, which DuckDB
# evaluates exactly like the Spark plan below.

_QJSD_ORACLE = """
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents
),
cnt AS (SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY lang, t),
tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY lang),
langs AS (SELECT DISTINCT lang FROM cnt),
pairs AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b
  FROM langs a JOIN langs b ON a.lang < b.lang
),
vocab AS (
  SELECT p.lang_a, p.lang_b, c.t
  FROM pairs p JOIN cnt c ON c.lang IN (p.lang_a, p.lang_b)
  GROUP BY p.lang_a, p.lang_b, c.t
),
aligned AS (
  SELECT v.lang_a, v.lang_b, v.t,
         COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb,
         ta.n AS na, tb.n AS nb
  FROM vocab v
  LEFT JOIN cnt ca ON ca.lang = v.lang_a AND ca.t = v.t
  LEFT JOIN cnt cb ON cb.lang = v.lang_b AND cb.t = v.t
  JOIN tot ta ON ta.lang = v.lang_a
  JOIN tot tb ON tb.lang = v.lang_b
),
terms AS (
  SELECT lang_a, lang_b,
         CAST(FLOOR((0.5 * (CASE WHEN ca > 0 THEN (CAST(ca AS DOUBLE) / na)
                    * LN((CAST(ca AS DOUBLE) / na)
                         / (0.5 * (CAST(ca AS DOUBLE) / na
                                   + CAST(cb AS DOUBLE) / nb)))
                  ELSE 0 END)
           + 0.5 * (CASE WHEN cb > 0 THEN (CAST(cb AS DOUBLE) / nb)
                    * LN((CAST(cb AS DOUBLE) / nb)
                         / (0.5 * (CAST(ca AS DOUBLE) / na
                                   + CAST(cb AS DOUBLE) / nb)))
                  ELSE 0 END)) * 1e10 + 0.5) / 1e10 AS DECIMAL(24,10)) AS tq
  FROM aligned
)
SELECT lang_a, lang_b,
       FLOOR((CAST(SUM(tq) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS js_divergence
FROM terms GROUP BY lang_a, lang_b
"""


@register(
    "q_text_js_divergence",
    oracle=_QJSD_ORACLE,
    description=(
        "pairwise Jensen-Shannon divergence (nats) between the unigram "
        "distributions of every language-pair subcorpus — the "
        "distribution-drift matrix a mixing pipeline monitors; the "
        "language dim is tiny so the pair loop is bounded, and the "
        "per-token JSD terms quantize to DECIMAL before the sum"
    ),
    tags=("text", "divergence", "drift", "curation", "llm-pipeline"),
)
def q_text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    cnt = (
        d.select("lang", F.explode(F.split(F.col("text"), " ")).alias("t"))
        .groupBy("lang", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = cnt.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
    langs = cnt.select("lang").distinct()
    pairs = (
        langs.alias("a")
        .join(langs.alias("b"), F.col("a.lang") < F.col("b.lang"))
        .select(
            F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b")
        )
    )
    # pairs is C(|langs|, 2) rows (10 here) — a true bounded dim, safe
    # to broadcast; cnt is vocab-sized and joins it by containment.
    vocab = (
        cnt.crossJoin(F.broadcast(pairs))
        .filter(
            (F.col("lang") == F.col("lang_a"))
            | (F.col("lang") == F.col("lang_b"))
        )
        .select("lang_a", "lang_b", "t")
        .distinct()
    )
    ca = cnt.select(
        F.col("lang").alias("lang_a"), "t", F.col("c").alias("ca")
    )
    cb = cnt.select(
        F.col("lang").alias("lang_b"), "t", F.col("c").alias("cb")
    )
    ta = tot.select(F.col("lang").alias("lang_a"), F.col("n").alias("na"))
    tb = tot.select(F.col("lang").alias("lang_b"), F.col("n").alias("nb"))
    aligned = (
        vocab.join(ca.hint("merge"), ["lang_a", "t"], "left")
        .join(cb.hint("merge"), ["lang_b", "t"], "left")
        .join(F.broadcast(ta), "lang_a")
        .join(F.broadcast(tb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
            "na",
            "nb",
        )
    )
    pa = F.col("ca").cast("double") / F.col("na")
    pb = F.col("cb").cast("double") / F.col("nb")
    m = 0.5 * (pa + pb)
    term = 0.5 * F.when(F.col("ca") > 0, pa * F.log(pa / m)).otherwise(
        0.0
    ) + 0.5 * F.when(F.col("cb") > 0, pb * F.log(pb / m)).otherwise(0.0)
    terms = aligned.select(
        "lang_a",
        "lang_b",
        (F.floor((term) * 1e10 + 0.5) / 1e10).cast("decimal(24,10)").alias("tq"),
    )
    return terms.groupBy("lang_a", "lang_b").agg(
        (F.floor((F.sum("tq").cast("double")) * 1e6 + 0.5) / 1e6).alias("js_divergence")
    )


# --------------------------------------------------------------------------
# Curation funnel: docs/tokens surviving each pipeline stage, cumulative.
# --------------------------------------------------------------------------

_QFUNNEL_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang, md5(text) AS h,
         len(string_split(text, ' ')) AS n_tokens,
         FLOOR((0.4 * LEAST(length(text) / 500.0, 1.0)
           + 0.4 * (len(list_distinct(string_split(text, ' '))) * 1.0
                    / len(string_split(text, ' ')))
           + 0.2 * LEAST(len(list_filter(string_split(text, ' '),
                                         t -> t IN {_EN_SW_SQL})) * 5.0
                         / len(string_split(text, ' ')), 1.0)) * 1e6 + 0.5) / 1e6 AS q
  FROM documents
),
canon AS (SELECT h, MIN(doc_id) AS keeper FROM scored GROUP BY h),
flags AS (
  SELECT s.n_tokens,
         (s.doc_id = c.keeper)                  AS f_dedup,
         (s.doc_id = c.keeper AND s.q >= 0.5)   AS f_quality,
         (s.doc_id = c.keeper AND s.q >= 0.5
          AND s.lang = 'en')                    AS f_lang
  FROM scored s JOIN canon c USING (h)
),
stages AS (
  SELECT 0 AS stage_no, 'ingest' AS stage,
         CAST(COUNT(*) AS BIGINT) AS docs,
         CAST(SUM(n_tokens) AS BIGINT) AS tokens
  FROM flags
  UNION ALL
  SELECT 1, 'exact_dedup',
         CAST(COUNT(*) FILTER (WHERE f_dedup) AS BIGINT),
         CAST(COALESCE(SUM(n_tokens) FILTER (WHERE f_dedup), 0) AS BIGINT)
  FROM flags
  UNION ALL
  SELECT 2, 'quality_ge_0.5',
         CAST(COUNT(*) FILTER (WHERE f_quality) AS BIGINT),
         CAST(COALESCE(SUM(n_tokens) FILTER (WHERE f_quality), 0) AS BIGINT)
  FROM flags
  UNION ALL
  SELECT 3, 'lang_en',
         CAST(COUNT(*) FILTER (WHERE f_lang) AS BIGINT),
         CAST(COALESCE(SUM(n_tokens) FILTER (WHERE f_lang), 0) AS BIGINT)
  FROM flags
),
base AS (SELECT tokens AS t0, docs AS d0 FROM stages WHERE stage_no = 0)
SELECT s.stage_no, s.stage, s.docs, s.tokens,
       FLOOR((s.docs * 1.0 / b.d0) * 1e6 + 0.5) / 1e6   AS doc_retention,
       FLOOR((s.tokens * 1.0 / b.t0) * 1e6 + 0.5) / 1e6 AS token_retention
FROM stages s CROSS JOIN base b
"""


@register(
    "q_curation_funnel_report",
    oracle=_QFUNNEL_ORACLE,
    description=(
        "curation funnel: documents and tokens surviving each cumulative "
        "pipeline stage (ingest -> exact dedup -> quality >= 0.5 -> "
        "lang=en) with retention ratios — the end-to-end accounting view "
        "of the LLM curation pipeline; one scan + one content-hash "
        "keeper join, stages as conditional aggregates"
    ),
    tags=("curation", "funnel", "dedup", "quality", "llm-pipeline"),
)
def q_curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"])))
    q = (F.floor((0.4 * F.least(F.length("text") / 500.0, F.lit(1.0))
        + 0.4 * (F.size(F.array_distinct(toks)) / n)
        + 0.2 * F.least(sw * 5.0 / n, F.lit(1.0))) * 1e6 + 0.5) / 1e6)
    scored = d.select(
        "doc_id",
        "lang",
        F.md5("text").alias("h"),
        n.alias("n_tokens"),
        q.alias("q"),
    )
    canon = scored.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    flags = scored.join(canon.hint("merge"), "h").select(
        "n_tokens",
        (F.col("doc_id") == F.col("keeper")).alias("f_dedup"),
        ((F.col("doc_id") == F.col("keeper")) & (F.col("q") >= 0.5)).alias(
            "f_quality"
        ),
        (
            (F.col("doc_id") == F.col("keeper"))
            & (F.col("q") >= 0.5)
            & (F.col("lang") == "en")
        ).alias("f_lang"),
    )

    def _stage(no: int, name: str, flag):
        cond = F.lit(True) if flag is None else F.col(flag)
        return flags.agg(
            F.lit(no).alias("stage_no"),
            F.lit(name).alias("stage"),
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias("docs"),
            F.coalesce(F.sum(F.when(cond, F.col("n_tokens"))), F.lit(0))
            .cast("long")
            .alias("tokens"),
        )

    stages = (
        _stage(0, "ingest", None)
        .unionByName(_stage(1, "exact_dedup", "f_dedup"))
        .unionByName(_stage(2, "quality_ge_0.5", "f_quality"))
        .unionByName(_stage(3, "lang_en", "f_lang"))
    )
    base = stages.filter(F.col("stage_no") == 0).select(
        F.col("docs").alias("d0"), F.col("tokens").alias("t0")
    )
    return stages.crossJoin(F.broadcast(base)).select(
        "stage_no",
        "stage",
        "docs",
        "tokens",
        (F.floor((F.col("docs") * 1.0 / F.col("d0")) * 1e6 + 0.5) / 1e6).alias("doc_retention"),
        (F.floor((F.col("tokens") * 1.0 / F.col("t0")) * 1e6 + 0.5) / 1e6).alias(
            "token_retention"
        ),
    )


# --------------------------------------------------------------------------
# Cross-source duplication matrix: who copies whom.
# --------------------------------------------------------------------------

_QDUPMATRIX_ORACLE = """
WITH docs AS (
  SELECT doc_id, source,
         md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS h
  FROM documents
),
xdup AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM docs a JOIN docs b ON a.h = b.h AND a.doc_id < b.doc_id
  WHERE a.source <= b.source
  UNION ALL
  SELECT b.source AS source_a, a.source AS source_b
  FROM docs a JOIN docs b ON a.h = b.h AND a.doc_id < b.doc_id
  WHERE a.source > b.source
)
SELECT source_a, source_b,
       CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
FROM xdup GROUP BY source_a, source_b
"""


@register(
    "q_curation_dup_flow_matrix",
    oracle=_QDUPMATRIX_ORACLE,
    description=(
        "cross-source duplication matrix: duplicate-prefix pairs (same "
        "first-8-token fingerprint) counted per unordered source pair "
        "(diagonal = within-source copies, off-diagonal = content "
        "flowing between sources) — the provenance view of dedup; "
        "fingerprint equi-join, candidate volume Σ dup-cluster-size², "
        "bounded by the dup rate (prefix fingerprint per r11 verdict so "
        "the matrix is non-vacuous at every driver sf, not only sf0.1)"
    ),
    tags=("curation", "dedup", "provenance", "llm-pipeline"),
)
def q_curation_dup_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # NULL-text guard (r12 ADVICE): concat_ws would fold a NULL token
    # array to '' and give every NULL-text doc md5('') — joining them
    # with each other and with genuinely-empty texts — while DuckDB's
    # array_to_string(NULL) stays NULL and drops out of the equi-join.
    # Producing NULL here makes both engines drop NULL-text rows
    # identically (equi-joins never match NULL).
    docs = d.select(
        "doc_id",
        "source",
        F.when(
            F.col("text").isNotNull(),
            F.md5(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8))),
        ).alias("h"),
    )
    a = docs.select(
        F.col("h"), F.col("doc_id").alias("ida"), F.col("source").alias("sa")
    )
    b = docs.select(
        F.col("h"), F.col("doc_id").alias("idb"), F.col("source").alias("sb")
    )
    pairs = (
        a.hint("merge")
        .join(b.hint("merge"), "h")
        .filter(F.col("ida") < F.col("idb"))
        .select(
            F.least(F.col("sa"), F.col("sb")).alias("source_a"),
            F.greatest(F.col("sa"), F.col("sb")).alias("source_b"),
        )
    )
    return pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_pairs")
    )


# --------------------------------------------------------------------------
# Heaps-law vocabulary growth: distinct tokens vs corpus fraction.
# --------------------------------------------------------------------------

_QHEAPS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
firsts AS (SELECT t, MIN(doc_id) AS first_doc FROM tok GROUP BY t),
bounds AS (
  SELECT MIN(doc_id) AS lo, MAX(doc_id) - MIN(doc_id) + 1 AS span
  FROM documents
),
tok_per_decile AS (
  SELECT LEAST(10, 1 + (tok.doc_id - b.lo) * 10 // b.span) AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM tok CROSS JOIN bounds b GROUP BY 1
),
vocab_per_decile AS (
  SELECT LEAST(10, 1 + (f.first_doc - b.lo) * 10 // b.span) AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_new_types
  FROM firsts f CROSS JOIN bounds b GROUP BY 1
)
SELECT t.decile,
       CAST(SUM(t.n_tokens) OVER w AS BIGINT)                AS tokens_cum,
       CAST(SUM(COALESCE(v.n_new_types, 0)) OVER w AS BIGINT) AS vocab_cum,
       {rdiv_halfup_duck(
           "SUM(COALESCE(v.n_new_types, 0)) OVER w",
           "SUM(t.n_tokens) OVER w", 6)}                      AS type_token_ratio
FROM tok_per_decile t LEFT JOIN vocab_per_decile v USING (decile)
WINDOW w AS (ORDER BY t.decile ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
"""


@register(
    "q_text_vocab_growth",
    oracle=_QHEAPS_ORACLE,
    description=(
        "Heaps-law vocabulary growth: cumulative distinct token types "
        "vs cumulative tokens at corpus deciles (doc_id order) — "
        "saturating vocab means a recycling corpus, growing vocab means "
        "fresh content; first-occurrence election is one token-keyed "
        "groupBy, deciles are doc_id RANGE buckets from a scalar "
        "min/max (no global-sort window), the rollup is 10 rows"
    ),
    tags=("text", "vocabulary", "profiling", "curation", "llm-pipeline"),
)
def q_text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("t"))
    firsts = tok.groupBy("t").agg(F.min("doc_id").alias("first_doc"))
    from pyspark.sql import Window as W

    # deciles are doc_id RANGE buckets from a 1-row min/max aggregate —
    # an ntile window would global-sort the doc list, and a per-doc
    # decile map is corpus-sized (the audit flagged broadcasting it).
    bounds = d.agg(
        F.min("doc_id").alias("lo"),
        (F.max("doc_id") - F.min("doc_id") + 1).alias("span"),
    )

    def _decile(idcol):
        return F.least(
            F.lit(10),
            1 + ((F.col(idcol) - F.col("lo")) * 10 / F.col("span")).cast("long"),
        )

    tok_per_decile = (
        tok.crossJoin(F.broadcast(bounds))
        .groupBy(_decile("doc_id").alias("decile"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
    )
    vocab_per_decile = (
        firsts.crossJoin(F.broadcast(bounds))
        .groupBy(_decile("first_doc").alias("decile"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_new_types"))
    )
    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    joined = tok_per_decile.join(vocab_per_decile, "decile", "left").select(
        "decile",
        "n_tokens",
        F.coalesce(F.col("n_new_types"), F.lit(0)).alias("n_new_types"),
    )
    return joined.select(
        "decile",
        F.sum("n_tokens").over(w).cast("long").alias("tokens_cum"),
        F.sum("n_new_types").over(w).cast("long").alias("vocab_cum"),
    ).select(
        "decile",
        "tokens_cum",
        "vocab_cum",
        rdiv_halfup_expr("vocab_cum", "tokens_cum", 6).alias(
            "type_token_ratio"
        ),
    )
