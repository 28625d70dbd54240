"""Full-text search primitives: positional inverted index, phrase and
boolean queries.

A search engine over a 100 TB corpus is three relational operations:

- **Index build**: ``posexplode`` the token stream into postings
  ``(term, doc_id, pos)`` — one narrow shuffle keyed on term. At scale
  this IS the index: term-partitioned posting lists, exactly what
  Lucene shards by.
- **Phrase query**: a self-join of the posting lists of the phrase's
  words on ``doc_id`` and ``pos_2 = pos_1 + 1`` — an equi-join on
  (doc, pos+1), never a scan of document text.
- **Boolean AND**: intersection of posting lists = two semi-joins.

To stay deterministic without hand-picking literals, the query terms
are data-derived: the corpus's most frequent bigram (ties broken
lexicographically) for the phrase, the two most frequent distinct
unigrams for the AND query. Everything is exact integer counts.

Tokenization is the repo-standard literal ``split(text, ' ')`` so the
DuckDB oracle replays it verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import adaptive_partitions, table

_POSTINGS_SQL = """
  SELECT d.doc_id, t.term, CAST(t.pos AS BIGINT) AS pos
  FROM documents d,
       LATERAL (SELECT UNNEST(string_split(d.text, ' ')) AS term,
                       generate_subscripts(string_split(d.text, ' '), 1) AS pos) t
"""


def _postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term, pos) postings; pos is 1-based to match DuckDB's
    generate_subscripts."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "term")
    ).select("doc_id", "term", (F.col("pos0") + 1).cast("long").alias("pos"))


_QPHRASE_ORACLE = f"""
WITH postings AS ({_POSTINGS_SQL}),
bigrams AS (
  SELECT a.term AS w1, b.term AS w2, COUNT(*) AS cnt
  FROM postings a
  JOIN postings b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY a.term, b.term
),
top_bigram AS (
  SELECT w1, w2 FROM bigrams
  ORDER BY cnt DESC, w1, w2 LIMIT 1
),
hits AS (
  SELECT a.doc_id, a.pos
  FROM postings a
  JOIN top_bigram q ON a.term = q.w1
  JOIN postings b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.term = q.w2
)
SELECT h.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       MIN(h.pos) AS first_pos,
       q.w1 AS phrase_w1, q.w2 AS phrase_w2
FROM hits h CROSS JOIN top_bigram q
GROUP BY h.doc_id, q.w1, q.w2
ORDER BY n_occurrences DESC, h.doc_id
LIMIT 20
"""


@register(
    "q_search_phrase",
    oracle=_QPHRASE_ORACLE,
    description=(
        "phrase search over a positional inverted index: most frequent "
        "corpus bigram located via posting-list self-join on "
        "(doc_id, pos+1), top matching docs"
    ),
    tags=("search", "text", "inverted-index", "join", "llm-pipeline"),
)
def q_search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 (guide §2.2/§2.4): the postings explode feeds FOUR join inputs
    # (both bigram-mining sides, the w1 probe, the hits extension side).
    # Cache it once in hash(doc_id) layout and materialize eagerly:
    # doc_id is a subset of every positional join's equi-keys, so a
    # VISIBLE cached hash(doc_id, P) satisfies both sides' clustering and
    # the self-joins keep only their Sorts (plan: corpus Exchanges under
    # the joins collapse to cached scans; the explode computes once, not
    # four times). P is byte-derived from the documents table so the
    # cached partition size tracks the corpus at any scale.
    p = (
        _postings(spark, sf_dir)
        .repartition(adaptive_partitions(spark, sf_dir, ("documents",)), "doc_id")
        .persist()
    )
    p.count()
    p2 = p.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("term").alias("term_b"),
        F.col("pos").alias("pos_b"),
    )
    # Both bigram-mining sides are the corpus postings (post-explode
    # bogus-small static estimate) — pin sort-merge so the planner
    # never broadcasts the corpus (round-8 registry audit).
    bigrams = (
        p.hint("merge").join(
            p2.hint("merge"),
            (F.col("doc_id_b") == F.col("doc_id"))
            & (F.col("pos_b") == F.col("pos") + 1),
        )
        .groupBy(F.col("term").alias("w1"), F.col("term_b").alias("w2"))
        .agg(F.count("*").alias("cnt"))
    )
    top_bigram = bigrams.orderBy(F.desc("cnt"), "w1", "w2").limit(1).select(
        "w1", "w2"
    )
    # probe side: postings of w1, extended by the (doc, pos+1) join to w2
    hits = (
        # top_bigram is limit(1)-bounded — broadcast correct; p2 is the
        # corpus postings — sort-merge (round-8 registry audit).
        p.join(F.broadcast(top_bigram), p.term == F.col("w1"))
        .join(
            p2.hint("merge"),
            (F.col("doc_id_b") == F.col("doc_id"))
            & (F.col("pos_b") == F.col("pos") + 1)
            & (F.col("term_b") == F.col("w2")),
        )
        .select("doc_id", "pos", "w1", "w2")
    )
    return (
        hits.groupBy("doc_id", "w1", "w2")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.min("pos").alias("first_pos"),
        )
        .select(
            "doc_id",
            "n_occurrences",
            "first_pos",
            F.col("w1").alias("phrase_w1"),
            F.col("w2").alias("phrase_w2"),
        )
        .orderBy(F.desc("n_occurrences"), "doc_id")
        .limit(20)
    )


_QBOOL_ORACLE = f"""
WITH postings AS ({_POSTINGS_SQL}),
freq AS (
  SELECT term, COUNT(*) AS cnt
  FROM postings GROUP BY term
),
top2 AS (
  SELECT term, ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rk
  FROM freq QUALIFY rk <= 2
),
t1 AS (SELECT term FROM top2 WHERE rk = 1),
t2 AS (SELECT term FROM top2 WHERE rk = 2),
docs1 AS (SELECT DISTINCT doc_id FROM postings WHERE term IN (SELECT term FROM t1)),
docs2 AS (SELECT DISTINCT doc_id FROM postings WHERE term IN (SELECT term FROM t2))
SELECT d1.doc_id,
       (SELECT term FROM t1) AS term_a,
       (SELECT term FROM t2) AS term_b
FROM docs1 d1
WHERE d1.doc_id IN (SELECT doc_id FROM docs2)
ORDER BY d1.doc_id
LIMIT 50
"""


@register(
    "q_search_boolean_and",
    oracle=_QBOOL_ORACLE,
    description=(
        "boolean AND query: posting-list intersection (semi-join) of the "
        "two most frequent corpus terms"
    ),
    tags=("search", "text", "inverted-index", "semi-join", "llm-pipeline"),
)
def q_search_boolean_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _postings(spark, sf_dir)
    freq = p.groupBy("term").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), "term")
    top2 = freq.select("term", F.row_number().over(w).alias("rk")).where(
        F.col("rk") <= 2
    )
    t1 = top2.where(F.col("rk") == 1).select(F.col("term").alias("term_a"))
    t2 = top2.where(F.col("rk") == 2).select(F.col("term").alias("term_b"))
    docs1 = (
        p.join(F.broadcast(t1), p.term == F.col("term_a"))
        .select("doc_id", "term_a")
        .distinct()
    )
    docs2 = (
        p.join(F.broadcast(t2), p.term == F.col("term_b"))
        .select("doc_id", "term_b")
        .distinct()
    )
    return (
        docs1.join(docs2, "doc_id")
        .select("doc_id", "term_a", "term_b")
        .orderBy("doc_id")
        .limit(50)
    )


_QPROX_ORACLE = f"""
WITH postings AS ({_POSTINGS_SQL}),
freq AS (
  SELECT term, COUNT(*) AS cnt FROM postings GROUP BY term
),
top2 AS (
  SELECT term, ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rk
  FROM freq QUALIFY rk <= 2
),
t1 AS (SELECT term FROM top2 WHERE rk = 1),
t2 AS (SELECT term FROM top2 WHERE rk = 2),
hits AS (
  SELECT a.doc_id,
         CAST(MIN(ABS(a.pos - b.pos)) AS BIGINT) AS min_gap,
         CAST(COUNT(*) AS BIGINT) AS n_windows
  FROM postings a
  JOIN postings b
    ON b.doc_id = a.doc_id
   AND b.pos BETWEEN a.pos - 3 AND a.pos + 3
   AND b.pos <> a.pos
  WHERE a.term IN (SELECT term FROM t1)
    AND b.term IN (SELECT term FROM t2)
  GROUP BY a.doc_id
)
SELECT h.doc_id, h.min_gap, h.n_windows,
       (SELECT term FROM t1) AS term_a,
       (SELECT term FROM t2) AS term_b
FROM hits h
ORDER BY h.n_windows DESC, h.doc_id
LIMIT 25
"""


@register(
    "q_search_proximity",
    oracle=_QPROX_ORACLE,
    description=(
        "proximity search (NEAR/3): top term pair co-occurring within "
        "3 token positions, per-doc window counts and min gap — a "
        "banded position join, never a per-doc scan"
    ),
    tags=("search", "text", "inverted-index", "proximity", "llm-pipeline"),
)
def q_search_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-operator semantics on the positional index: candidate rows
    are the two terms' posting lists joined on doc_id with a +-3
    position band — the join is keyed on doc_id with a residual range
    predicate, so it scales with posting-list length, not document
    text."""
    p = _postings(spark, sf_dir)
    freq = p.groupBy("term").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), "term")
    top2 = freq.select("term", F.row_number().over(w).alias("rk")).where(
        F.col("rk") <= 2
    )
    t1 = top2.where(F.col("rk") == 1).select(F.col("term").alias("term_a"))
    t2 = top2.where(F.col("rk") == 2).select(F.col("term").alias("term_b"))
    pa = p.join(F.broadcast(t1), p.term == F.col("term_a")).select(
        "doc_id", F.col("pos").alias("pos_a"), "term_a"
    )
    pb = p.join(F.broadcast(t2), p.term == F.col("term_b")).select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "term_b"
    )
    hits = (
        pa.join(
            pb,
            (F.col("doc_b") == F.col("doc_id"))
            & F.col("pos_b").between(F.col("pos_a") - 3, F.col("pos_a") + 3)
            & (F.col("pos_b") != F.col("pos_a")),
        )
        .groupBy("doc_id", "term_a", "term_b")
        .agg(
            F.min(F.abs(F.col("pos_a") - F.col("pos_b"))).alias("min_gap"),
            F.count("*").alias("n_windows"),
        )
    )
    return (
        hits.select("doc_id", "min_gap", "n_windows", "term_a", "term_b")
        .orderBy(F.desc("n_windows"), "doc_id")
        .limit(25)
    )


# --------------------------------------------------------------------------
# Sparse TF-IDF cosine: most similar document pairs via a term-keyed
# sparse-vector join (no dense vectors, no cartesian).
# --------------------------------------------------------------------------

_QTFIDFCOS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bigrams AS (
  -- bigram terms: the unigram vocabulary here is ~31 stop-dense terms
  -- whose posting lists pair-join quadratically; bigrams widen the
  -- vocabulary ~30x and thin every posting list
  SELECT doc_id, t[i] || '_' || t[i + 1] AS term
  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) i
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM bigrams GROUP BY doc_id, term
),
stats AS (
  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf
),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
wts AS (
  -- df ceiling: terms in more than 10% of docs are stop-terms — they
  -- carry no signal and their posting lists dominate the pair join
  SELECT tf.doc_id, tf.term,
         CAST(FLOOR((tf.tf * ln((s.n_docs + 1.0e0) / (df.df + 1.0e0))) * 1e9 + 0.5) / 1e9
              AS DECIMAL(18,9)) AS w
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN stats s
  WHERE df.df * 10 <= s.n_docs
),
norms AS (
  SELECT doc_id,
         CAST(SUM(CAST(FLOOR((CAST(w AS DOUBLE) * CAST(w AS DOUBLE)) * 1e9 + 0.5) / 1e9
                       AS DECIMAL(18,9))) AS DOUBLE) AS n2
  FROM wts GROUP BY doc_id
),
dots AS (
  -- query side restricted to a 20-doc sample: all-pairs on this corpus
  -- is Theta(sum df^2) ~ 20M rows even under the df ceiling; a bounded
  -- query set is how production similarity joins run (per-batch)
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(CAST(FLOOR((CAST(a.w AS DOUBLE) * CAST(b.w AS DOUBLE)) * 1e9 + 0.5) / 1e9
                       AS DECIMAL(18,9))) AS DOUBLE) AS dot
  FROM wts a JOIN wts b ON a.term = b.term AND a.doc_id <> b.doc_id
  WHERE a.doc_id < 20
  GROUP BY a.doc_id, b.doc_id
)
SELECT d.doc_a, d.doc_b,
       FLOOR((d.dot / SQRT(na.n2 * nb.n2)) * 1e6 + 0.5) / 1e6 AS cos_sim
FROM dots d
JOIN norms na ON na.doc_id = d.doc_a
JOIN norms nb ON nb.doc_id = d.doc_b
ORDER BY cos_sim DESC, d.doc_a, d.doc_b
LIMIT 20
"""


@register(
    "q_text_tfidf_cosine_pairs",
    oracle=_QTFIDFCOS_ORACLE,
    description=(
        "sparse TF-IDF cosine similarity: nearest documents to a 20-doc "
        "query sample via a term-keyed sparse join over bigram terms "
        "with a 10% df ceiling (pairs only materialize where terms "
        "overlap — no dense vectors, no cartesian)"
    ),
    tags=("search", "text", "tfidf", "similarity", "sparse", "llm-pipeline"),
)
def q_text_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IR-classic document-similarity join: weights live in the
    inverted index, so the pairwise dot product is a self-join keyed on
    TERM — pair (a, b) only appears if they share a term, and the
    shuffle is sized by posting-list lengths, not |docs|^2. Quantized
    ln/product terms keep the decimal sums order-independent
    cross-engine. At 100 TB add a df ceiling (drop stop-terms) to bound
    the hottest posting lists — the same skew story as every term join."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    idx = F.when(
        F.size("t") >= 2, F.sequence(F.lit(1), F.size("t") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bigrams = toks.select(
        "doc_id", F.explode(idx).alias("i"), "t"
    ).select(
        "doc_id",
        F.concat(
            F.element_at("t", F.col("i")),
            F.lit("_"),
            F.element_at("t", F.col("i") + 1),
        ).alias("term"),
    )
    tf = bigrams.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    stats = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    # df is bigram-VOCAB-sized with a bogus-small post-explode static
    # estimate — pin sort-merge (round-8 registry audit); the keyless
    # stats scalar stays a broadcast.
    wts = (
        tf.join(df.hint("merge"), "term")
        .crossJoin(F.broadcast(stats))
        .where(F.col("df") * 10 <= F.col("n_docs"))
        .select(
            "doc_id",
            "term",
            (F.floor((F.col("tf")
                * F.log(
                    (F.col("n_docs").cast("double") + 1.0)
                    / (F.col("df") + F.lit(1.0))
                )) * 1e9 + 0.5) / 1e9)
            .cast("decimal(18,9)")
            .alias("w"),
        )
    )
    norms = wts.groupBy("doc_id").agg(
        F.sum(
            (F.floor((F.col("w").cast("double") * F.col("w").cast("double")) * 1e9 + 0.5) / 1e9).cast("decimal(18,9)")
        )
        .cast("double")
        .alias("n2")
    )
    b = wts.select(
        F.col("doc_id").alias("doc_b"),
        F.col("term").alias("term_b"),
        F.col("w").alias("w_b"),
    )
    dots = (
        # b is the full corpus-sided weight index (post-explode bogus
        # estimate) — pin sort-merge on the term key; the probe side's
        # doc_id < 20 cut bounds the OUTPUT, not b.
        wts.where(F.col("doc_id") < 20)
        .join(
            b.hint("merge"),
            (F.col("term_b") == F.col("term"))
            & (F.col("doc_id") != F.col("doc_b")),
        )
        .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
        .agg(
            F.sum(
                (F.floor((F.col("w").cast("double") * F.col("w_b").cast("double")) * 1e9 + 0.5) / 1e9).cast("decimal(18,9)")
            )
            .cast("double")
            .alias("dot")
        )
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb2"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.floor((F.col("dot") / F.sqrt(F.col("na2") * F.col("nb2"))) * 1e6 + 0.5) / 1e6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "doc_a", "doc_b")
        .limit(20)
    )
