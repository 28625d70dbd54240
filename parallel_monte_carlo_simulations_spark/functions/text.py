"""Text-analysis operators over the ``documents`` table: token statistics,
quality scoring, language-ID heuristic, fingerprinting.

All pure ``pyspark.sql.functions`` (codegen'd, no UDFs) so the same logic
is expressible as a DuckDB oracle. At 100 TB these are embarrassingly
parallel scans — no shuffle at all except where a query aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Stopword sets for the language-ID heuristic (tiny on purpose: the
#: operator demonstrates n-gram/stopword scoring, not a trained model).
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "un"),
    "de": ("der", "die", "und", "das", "von", "mit", "ein"),
}


def _tokens(c: Column | str = "text") -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.split(col, " ")


def _stopword_count(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


# --------------------------------------------------------------------------
# Token statistics.
# --------------------------------------------------------------------------

_QTOK_ORACLE = """
SELECT
  doc_id,
  CAST(len(string_split(text, ' ')) AS INTEGER)                   AS n_tokens,
  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)    AS n_unique_tokens,
  CAST(length(text) AS BIGINT)                                    AS n_chars_measured,
  FLOOR((length(text) * 1.0 / len(string_split(text, ' '))) * 1e4 + 0.5) / 1e4     AS avg_token_span,
  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit_chars
FROM documents
"""


@register(
    "q_text_token_stats",
    oracle=_QTOK_ORACLE,
    description="token counting: whitespace tokens, uniques, char spans",
    tags=("text", "tokens"),
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
        (F.floor((F.length("text") / F.size(toks)) * 1e4 + 0.5) / 1e4).alias("avg_token_span"),
        F.length(F.regexp_replace("text", "[^0-9]", ""))
        .cast("bigint")
        .alias("n_digit_chars"),
    )


# --------------------------------------------------------------------------
# Quality scoring: length + lexical-diversity + stopword composite.
# --------------------------------------------------------------------------

_EN_SW_SQL = "('" + "', '".join(STOPWORDS["en"]) + "')"

_QQUAL_ORACLE = f"""
SELECT
  doc_id,
  FLOOR((LEAST(length(text) / 500.0, 1.0)) * 1e6 + 0.5) / 1e6                       AS length_score,
  FLOOR((len(list_distinct(string_split(text, ' '))) * 1.0
        / len(string_split(text, ' '))) * 1e6 + 0.5) / 1e6                         AS diversity_score,
  FLOOR((len(list_filter(string_split(text, ' '),
                        t -> t IN {_EN_SW_SQL})) * 1.0
        / len(string_split(text, ' '))) * 1e6 + 0.5) / 1e6                         AS stopword_ratio,
  FLOOR((0.4 * LEAST(length(text) / 500.0, 1.0)
    + 0.4 * (len(list_distinct(string_split(text, ' '))) * 1.0
             / len(string_split(text, ' ')))
    + 0.2 * LEAST(len(list_filter(string_split(text, ' '),
                                  t -> t IN {_EN_SW_SQL})) * 5.0
                  / len(string_split(text, ' ')), 1.0)) * 1e6 + 0.5) / 1e6         AS quality_score
FROM documents
"""


@register(
    "q_text_quality_score",
    oracle=_QQUAL_ORACLE,
    description="doc quality scoring: length, lexical diversity, stopword ratio",
    tags=("text", "quality"),
)
def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    n = F.size(toks)
    length_score = F.least(F.length("text") / 500.0, F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)) / n
    sw_ratio = _stopword_count(toks, STOPWORDS["en"]) / n
    quality = (
        0.4 * length_score
        + 0.4 * diversity
        + 0.2 * F.least(sw_ratio * 5.0, F.lit(1.0))
    )
    return d.select(
        "doc_id",
        (F.floor((length_score) * 1e6 + 0.5) / 1e6).alias("length_score"),
        (F.floor((diversity) * 1e6 + 0.5) / 1e6).alias("diversity_score"),
        (F.floor((sw_ratio) * 1e6 + 0.5) / 1e6).alias("stopword_ratio"),
        (F.floor((quality) * 1e6 + 0.5) / 1e6).alias("quality_score"),
    )


# --------------------------------------------------------------------------
# Language-ID heuristic: stopword-set scoring with deterministic argmax.
# --------------------------------------------------------------------------


def _sql_sw_count(lang: str) -> str:
    words = "('" + "', '".join(STOPWORDS[lang]) + "')"
    return f"len(list_filter(string_split(text, ' '), t -> t IN {words}))"


_QLANG_ORACLE = f"""
SELECT
  doc_id,
  lang AS labeled_lang,
  CASE
    WHEN {_sql_sw_count('en')} = 0 AND {_sql_sw_count('es')} = 0
     AND {_sql_sw_count('fr')} = 0 AND {_sql_sw_count('de')} = 0 THEN 'unknown'
    WHEN {_sql_sw_count('en')} >= {_sql_sw_count('es')}
     AND {_sql_sw_count('en')} >= {_sql_sw_count('fr')}
     AND {_sql_sw_count('en')} >= {_sql_sw_count('de')} THEN 'en'
    WHEN {_sql_sw_count('es')} >= {_sql_sw_count('fr')}
     AND {_sql_sw_count('es')} >= {_sql_sw_count('de')} THEN 'es'
    WHEN {_sql_sw_count('fr')} >= {_sql_sw_count('de')} THEN 'fr'
    ELSE 'de'
  END AS lang_guess
FROM documents
"""


@register(
    "q_text_lang_id",
    oracle=_QLANG_ORACLE,
    description="language-ID heuristic: per-language stopword scoring + argmax",
    tags=("text", "langid"),
)
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    counts = {lang: _stopword_count(toks, ws) for lang, ws in STOPWORDS.items()}
    en, es, fr, de = counts["en"], counts["es"], counts["fr"], counts["de"]
    guess = (
        F.when((en == 0) & (es == 0) & (fr == 0) & (de == 0), "unknown")
        .when((en >= es) & (en >= fr) & (en >= de), "en")
        .when((es >= fr) & (es >= de), "es")
        .when(fr >= de, "fr")
        .otherwise("de")
    )
    return d.select(
        "doc_id", F.col("lang").alias("labeled_lang"), guess.alias("lang_guess")
    )


# --------------------------------------------------------------------------
# Document fingerprinting: content hash + order-insensitive token-set hash.
# --------------------------------------------------------------------------

_QFP_ORACLE = """
SELECT
  doc_id,
  md5(lower(text))                                             AS content_fp,
  md5(array_to_string(list_sort(list_distinct(
      string_split(lower(text), ' '))), ' '))                  AS tokenset_fp,
  CAST(length(text) AS BIGINT)                                 AS fp_len
FROM documents
"""


@register(
    "q_text_fingerprint",
    oracle=_QFP_ORACLE,
    description="document fingerprints: content md5 + sorted-token-set md5",
    tags=("text", "fingerprint"),
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    low_toks = F.split(F.lower(F.col("text")), " ")
    return d.select(
        "doc_id",
        F.md5(F.lower(F.col("text"))).alias("content_fp"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(low_toks)))).alias(
            "tokenset_fp"
        ),
        F.length("text").cast("bigint").alias("fp_len"),
    )


# --------------------------------------------------------------------------
# TF-IDF top terms: the classic corpus-statistics operator (term weighting
# for retrieval / keyword extraction over a training corpus).
# --------------------------------------------------------------------------

_QTFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
toks3 AS (SELECT doc_id, term FROM toks WHERE length(term) >= 3),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks3 GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks3 GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         FLOOR((tf.tf * LN((n.n_docs + 1.0) / (dfreq.df + 1.0))) * 1e4 + 0.5) / 1e4 AS tfidf,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC)
           AS rk
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       tfidf, CAST(rk AS INTEGER) AS rk
FROM scored WHERE rk <= 5
"""


@register(
    "q_text_tfidf_topterms",
    oracle=_QTFIDF_ORACLE,
    description="TF-IDF: per-doc top-5 terms (smoothed idf, integer-keyed rank)",
    tags=("text", "tfidf", "corpus", "window"),
)
def q_text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term weighting: tf per (doc, term), smoothed idf
    ``ln((N+1)/(df+1))``, top-5 terms per doc. The rank key is the pure
    INTEGER triple (tf desc, df asc, term) — "most frequent, rarest
    first" — so cross-engine ordering never depends on float ulps; the
    float tfidf score is display output, rounded identically on both
    engines. At 100 TB: two hash aggregates on (doc,term)/(term) and one
    per-doc window — the df side is the only corpus-wide shuffle and
    carries (term, count) pairs only."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.length("term") >= 3)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    # dfreq is VOCAB-sized (grows with the corpus under Heaps' law) with
    # a bogus-small post-explode static estimate — pin sort-merge so the
    # planner never broadcasts it (round-8 registry audit); n_docs is a
    # keyless scalar, broadcast stays correct.
    return (
        tf.join(dfreq.hint("merge"), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.floor((F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))) * 1e4 + 0.5) / 1e4),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "doc_id", "term", F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"), "tfidf",
            F.col("rk").cast("int").alias("rk"),
        )
    )


_BM25_TERMS = ("hash", "join", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20

_QBM25_ORACLE = f"""
WITH dl AS (
  SELECT doc_id, len(list_filter(string_split(text, ' '), t -> t <> '')) AS dl
  FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM dl
),
terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM terms
  WHERE term IN {_BM25_TERMS!r}
  GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id,
         SUM(
           LN((s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * tf.tf * ({_BM25_K1} + 1.0)
           / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl))
         ) AS score
  FROM tf
  JOIN dfreq ON tf.term = dfreq.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, FLOOR((score) * 1e4 + 0.5) / 1e4 AS bm25
FROM scored
ORDER BY FLOOR((score) * 1e4 + 0.5) / 1e4 DESC, doc_id
LIMIT {_BM25_TOPK}
"""


@register(
    "q_text_bm25",
    oracle=_QBM25_ORACLE,
    description=(
        f"BM25 retrieval scoring (k1={_BM25_K1}, b={_BM25_B}, Lucene idf) "
        f"for query {' '.join(_BM25_TERMS)!r}: top-{_BM25_TOPK} documents"
    ),
    tags=("text", "bm25", "retrieval", "scoring"),
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus BM25 ranking for a fixed query: term frequencies and
    document frequencies aggregate distributedly; the per-term idf and
    length-normalization fold into one scoring aggregate. Corpus stats
    (N, avgdl) and the per-term df table are scalar/tiny — broadcast —
    so the only data-sized shuffles are the tf groupBy and the final
    top-k. avgdl is SUM/COUNT (exact integer sum, one double division)
    on both engines, and the tie-break sorts on the ROUNDED score so the
    top-k cut is cross-engine stable."""
    d = table(spark, sf_dir, "documents")
    dl = d.select(
        "doc_id",
        F.size(F.filter(_tokens(F.col("text")), lambda t: t != "")).alias("dl"),
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") * F.lit(1.0) / F.count("*")).alias("avgdl"),
    )
    terms = d.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("term")
    ).filter(F.col("term").isin(*_BM25_TERMS))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * (_BM25_K1 + 1.0) / denom).alias("score"))
    )
    return (
        scored.select("doc_id", (F.floor((F.col("score")) * 1e4 + 0.5) / 1e4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_BM25_TOPK)
    )


_BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

_QREGEX_TOKENS_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}'))
            AS INTEGER)                                        AS n_regex_tokens,
       CAST(len(list_filter(regexp_extract_all(text, '{_BPE_PATTERN}'),
                            t -> t SIMILAR TO '[0-9]+'))
            AS INTEGER)                                        AS n_number_tokens,
       CAST(len(list_filter(regexp_extract_all(text, '{_BPE_PATTERN}'),
                            t -> NOT t SIMILAR TO '[a-zA-Z0-9]+'))
            AS INTEGER)                                        AS n_punct_tokens,
       CAST(len(list_distinct(regexp_extract_all(text, '{_BPE_PATTERN}')))
            AS INTEGER)                                        AS n_unique
FROM documents
"""


@register(
    "q_text_regex_tokens",
    oracle=_QREGEX_TOKENS_ORACLE,
    description=(
        "BPE-style regex tokenization: letter-run / digit-run / "
        "punctuation token counts per document"
    ),
    tags=("text", "tokens", "regexp"),
)
def q_text_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenizer accounting with a BPE-ish split (letter runs,
    digit runs, single punctuation marks — the GPT-2 pattern's
    ASCII core): the token-budget estimate a curation pipeline runs
    before committing corpus space. Pure columnar regexp built-ins,
    zero shuffle."""
    d = table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_regex_tokens"),
        F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$"))).cast("int").alias(
            "n_number_tokens"
        ),
        F.size(F.filter(toks, lambda t: ~t.rlike("^[a-zA-Z0-9]+$")))
        .cast("int")
        .alias("n_punct_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_unique"),
    )


_QZIPF_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok),
ranked AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rnk FROM tf
),
pts AS (
  SELECT CAST(FLOOR((ln(CAST(rnk AS DOUBLE))) * 1e9 + 0.5) / 1e9 AS DECIMAL(18,9)) AS x,
         CAST(FLOOR((ln(CAST(cnt AS DOUBLE))) * 1e9 + 0.5) / 1e9 AS DECIMAL(18,9)) AS y
  FROM ranked WHERE rnk <= 1000
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(y * y) AS DOUBLE) AS syy,
         CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM pts
),
fit AS (
  SELECT n_terms,
         (n * sxy) - (sx * sy) AS cov_n,
         (n * sxx) - (sx * sx) AS var_x,
         (n * syy) - (sy * sy) AS var_y,
         n, sx, sy
  FROM stats
)
SELECT n_terms,
       FLOOR((cov_n / var_x) * 1e6 + 0.5) / 1e6 AS zipf_slope,
       FLOOR(((sy - ((cov_n / var_x) * sx)) / n) * 1e6 + 0.5) / 1e6 AS intercept,
       FLOOR(((cov_n * cov_n) / (var_x * var_y)) * 1e6 + 0.5) / 1e6 AS r2
FROM fit
"""


@register(
    "q_text_zipf_fit",
    oracle=_QZIPF_ORACLE,
    description=(
        "Zipf-law fit: OLS of ln(freq) on ln(rank) over the top-1000 "
        "tokens, exact-decimal sufficient statistics"
    ),
    tags=("text", "zipf", "ml", "regression", "llm-pipeline"),
)
def q_text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health diagnostic: natural text follows ln(freq) ~
    -1·ln(rank); templated or synthetic corpora bend the slope. The fit
    reuses the sufficient-statistics OLS of ``operators/mlstats`` with
    the per-term quantization of ``functions/nbayes``: each ln() is
    rounded to 9 decimals and summed as DECIMAL, so the regression
    inputs are exact and order-independent, and the slope matches the
    oracle bit-for-bit. One groupBy + one vocab-sized ranked window +
    a 6-number aggregate — nothing corpus-sized moves."""
    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    ranked = tf.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), "tok"))
        .alias("rnk"),
    ).where(F.col("rnk") <= 1000)
    pts = ranked.select(
        (F.floor((F.log(F.col("rnk").cast("double"))) * 1e9 + 0.5) / 1e9)
        .cast("decimal(18,9)")
        .alias("x"),
        (F.floor((F.log(F.col("cnt").cast("double"))) * 1e9 + 0.5) / 1e9)
        .cast("decimal(18,9)")
        .alias("y"),
    )
    stats = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )
    cov_n = (F.col("n") * F.col("sxy")) - (F.col("sx") * F.col("sy"))
    var_x = (F.col("n") * F.col("sxx")) - (F.col("sx") * F.col("sx"))
    var_y = (F.col("n") * F.col("syy")) - (F.col("sy") * F.col("sy"))
    slope = cov_n / var_x
    return stats.select(
        "n_terms",
        (F.floor((slope) * 1e6 + 0.5) / 1e6).alias("zipf_slope"),
        (F.floor(((F.col("sy") - (slope * F.col("sx"))) / F.col("n")) * 1e6 + 0.5) / 1e6).alias(
            "intercept"
        ),
        (F.floor(((cov_n * cov_n) / (var_x * var_y)) * 1e6 + 0.5) / 1e6).alias("r2"),
    )


_QLEXSTATS_ORACLE = """
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
counts AS (
  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS n
  FROM toks GROUP BY lang, tok
),
totals AS (
  SELECT lang, CAST(SUM(n) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS vocab
  FROM counts GROUP BY lang
)
SELECT c.lang,
       ANY_VALUE(t.total) AS n_tokens,
       ANY_VALUE(t.vocab) AS vocab_size,
       FLOOR((ANY_VALUE(t.vocab) * 1.0 / ANY_VALUE(t.total)) * 1e6 + 0.5) / 1e6
         AS type_token_ratio,
       FLOOR((-SUM((c.n * 1.0 / t.total) * LOG2(c.n * 1.0 / t.total))) * 1e6 + 0.5) / 1e6
         AS unigram_entropy_bits,
       FLOOR((-SUM((c.n * 1.0 / t.total) * LOG2(c.n * 1.0 / t.total))
             / LOG2(ANY_VALUE(t.vocab))) * 1e6 + 0.5) / 1e6 AS entropy_efficiency
FROM counts c JOIN totals t USING (lang)
GROUP BY c.lang
ORDER BY c.lang
"""


@register(
    "q_text_lexical_stats",
    oracle=_QLEXSTATS_ORACLE,
    description=(
        "per-language lexical profile: token count, vocabulary size, "
        "type-token ratio, Shannon unigram entropy (bits) and entropy "
        "efficiency H/log2|V| — the corpus-level diversity screen a "
        "pretraining mix report leads with"
    ),
    tags=("text", "statistics", "curation", "diagnostics"),
)
def q_text_lexical_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two grouped aggregates: (lang, token) counts, then per-lang
    entropy from the count distribution. Both shuffles key on lang(+tok)
    — partial aggregation does the heavy lifting map-side, and the
    second stage is vocab-sized. Entropy sums ~|V| doubles per lang;
    round-6 output is stable far beyond float association noise."""
    d = table(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = counts.groupBy("lang").agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    p = F.col("n") / F.col("total")
    return (
        counts.join(totals, "lang")
        .groupBy("lang")
        .agg(
            F.any_value("total").alias("n_tokens"),
            F.any_value("vocab").alias("vocab_size"),
            (F.floor((F.any_value("vocab") / F.any_value("total")) * 1e6 + 0.5) / 1e6).alias(
                "type_token_ratio"
            ),
            (F.floor((-F.sum(p * F.log2(p))) * 1e6 + 0.5) / 1e6).alias("unigram_entropy_bits"),
            (F.floor((-F.sum(p * F.log2(p)) / F.log2(F.any_value("vocab"))) * 1e6 + 0.5) / 1e6).alias("entropy_efficiency"),
        )
        .orderBy("lang")
    )


_PMI_MIN_COUNT = 25
_PMI_TOP_K = 20

_QPMI_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS tok
  FROM documents
),
bigrams AS (
  SELECT a.tok AS w1, b.tok AS w2
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
pair_counts AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM bigrams GROUP BY w1, w2
  HAVING COUNT(*) >= {_PMI_MIN_COUNT}
),
uni AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks),
scored AS (
  SELECT p.w1, p.w2, p.c_ab, u1.c AS c_a, u2.c AS c_b,
         FLOOR((LN((CAST(p.c_ab AS DOUBLE) * t.n)
                  / (CAST(u1.c AS DOUBLE) * u2.c))) * 1e6 + 0.5) / 1e6 AS pmi
  FROM pair_counts p
  JOIN uni u1 ON p.w1 = u1.tok
  JOIN uni u2 ON p.w2 = u2.tok
  CROSS JOIN tot t
)
SELECT w1, w2, c_ab, c_a, c_b, pmi
FROM scored
ORDER BY pmi DESC, w1, w2
LIMIT {_PMI_TOP_K}
"""


@register(
    "q_text_pmi_collocations",
    oracle=_QPMI_ORACLE,
    description=(
        f"collocation mining: top-{_PMI_TOP_K} adjacent token pairs by "
        f"pointwise mutual information ln(c_ab*N / (c_a*c_b)) with a "
        f"min-count {_PMI_MIN_COUNT} support filter — the phrase-"
        f"discovery screen (multi-word expressions, named entities) "
        f"that feeds tokenizer merge lists and stop-phrase tables"
    ),
    tags=("text", "pmi", "collocation", "statistics", "llm-pipeline"),
)
def q_text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram counts via one lead-window pass, unigram counts and the
    grand total via vocab-keyed aggregates; PMI is integer products
    inside one LN so it oracles exactly. The min-count filter drops the
    long tail BEFORE the unigram joins, so the scored frame is bounded
    by frequent-pair count, not vocabulary squared. Distinct from the
    bigram backoff LM (smoothed probabilities): PMI ranks association
    strength, the classic collocation statistic."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = toks.withColumn("nxt", F.lead("tok").over(w)).where(
        F.col("nxt").isNotNull()
    )
    pair_counts = (
        bigrams.groupBy(F.col("tok").alias("w1"), F.col("nxt").alias("w2"))
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .where(F.col("c_ab") >= _PMI_MIN_COUNT)
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = toks.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # uni is VOCAB-sized (Heaps' law) — pin sort-merge like the other
    # vocab joins; pair_counts after the support filter is small but
    # derives from a post-explode aggregate, same discipline.
    scored = (
        pair_counts.join(
            uni.hint("merge").withColumnRenamed("tok", "w1").withColumnRenamed(
                "c", "c_a"
            ),
            "w1",
        )
        .join(
            uni.hint("merge").withColumnRenamed("tok", "w2").withColumnRenamed(
                "c", "c_b"
            ),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c_ab",
            "c_a",
            "c_b",
            (F.floor((F.log(
                    (F.col("c_ab").cast("double") * F.col("n"))
                    / (F.col("c_a").cast("double") * F.col("c_b"))
                )) * 1e6 + 0.5) / 1e6).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(_PMI_TOP_K)
