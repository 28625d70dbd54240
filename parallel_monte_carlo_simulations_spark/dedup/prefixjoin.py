"""Prefix-filtered EXACT set-similarity join (PPJoin-style blocking).

The third near-dup blocking family, algorithmically distinct from
MinHash banding (:mod:`.minhash`, probabilistic) and length bucketing
(:mod:`.ngram`): for Jaccard threshold t, order every set's tokens by
GLOBAL rarity and emit only its first ``s - ceil(t·s) + 1`` tokens as
join keys. Two sets with Jaccard ≥ t MUST share a prefix token under a
consistent global order (pigeonhole on the ≤ s - ceil(t·s) tokens
either set can afford to miss), so the equi-join on prefix tokens has
**zero false negatives** — an exact join, not an approximation.

Scale design (reworked after the sf0.1 robustness sweep caught the
first version at 300+ s):

1. **Join distinct TOKEN SETS, not documents.** This corpus is one big
   near-dup blob — 41% of all doc pairs clear Jaccard ≥ 0.7 at sf0.1 —
   so any doc-level pair join is quadratic in the corpus. The pair
   space here is |distinct sets|², bounded by vocabulary combinatorics
   (C(|V|, k)), NOT by corpus size; documents re-enter only as exact
   multiplicities and in the bounded top-K expansion.
2. **Small-vocabulary bitmask fast path.** The corpus vocabulary is
   ~31 tokens (``q_text_zipf_fit``); both engines GUARD |V| ≤ 62
   (loud ``raise_error`` / ``error`` otherwise) and encode each set as
   one BIGINT mask. Membership, set size, prefix position
   (``bit_count(mask & (2^rnk - 1)) + 1``) and intersection
   (``bit_count(mask_a & mask_b)``) are all O(1) bit arithmetic — the
   Jaccard filter runs INLINE in the candidate stream, before any
   distinct. On a real >62-token vocabulary this path fails loudly and
   the general array-intersect formulation applies (the pre-rework
   shape, kept in git history); the blocking algebra is identical.
3. **Top-K without global expansion.** Matched SET pairs carry exact
   expanded-pair counts (cnt_a·cnt_b cross, n·(n-1)/2 within); the
   top-200 doc pairs are found by a running-count window over set
   pairs ordered by Jaccard, expanding ONLY the set pairs at or above
   the 200th pair's Jaccard (tie-complete, so the doc-level order is
   exact), then one final bounded sort.

All thresholds are integer-scaled (``10·i ≥ 7·(sa+sb−i)``,
``ceil(0.7·s)`` as ``(7s+9) div 10``); Jaccard doubles are one
division of exact integers — identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

# t = 0.7 as the exact fraction 7/10 — never a float threshold.
_T_NUM, _T_DEN = 7, 10

#: Output cap: the K most-similar doc pairs (ties broken by ids).
_TOP_K = 200

#: Pre-flight budget on the candidate SET-pair space Σ_tok C(g_tok, 2)
#: (g_tok = sets carrying token tok in their prefix). ~5e7 popcount
#: checks is seconds of work; the sf1.0 tiled corpus that DNF'd this
#: operator implied ~1.55e9 — two orders past the budget. The |V| <= 62
#: raise_error guards the vocabulary axis; this guards the orthogonal
#: distinct-set axis the round-8 ladder exposed (copy-identifying
#: suffix tokens mint new sets without growing |V|).
_PAIR_BUDGET = 50_000_000

_QPREFIX_ORACLE = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM toks GROUP BY tok),
ranked AS (
  SELECT tok,
         CASE WHEN ROW_NUMBER() OVER (ORDER BY df, tok) > 62
              THEN error('vocabulary exceeds 62 tokens: bitmask path invalid')
              ELSE ROW_NUMBER() OVER (ORDER BY df, tok) END AS rnk
  FROM tf
),
doc_mask AS (
  SELECT t.doc_id,
         CAST(SUM(CAST(1 AS BIGINT) << (r.rnk - 1)) AS BIGINT) AS mask,
         CAST(COUNT(*) AS BIGINT) AS s
  FROM toks t JOIN ranked r ON r.tok = t.tok
  GROUP BY t.doc_id
),
sets AS (
  SELECT mask, CAST(MAX(s) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM doc_mask GROUP BY mask
),
pref AS (
  SELECT g.mask, g.s, g.cnt, r.tok
  FROM sets g JOIN ranked r
    ON ((g.mask >> (r.rnk - 1)) & 1) = 1
   AND bit_count(g.mask & ((CAST(1 AS BIGINT) << (r.rnk - 1)) - 1)) + 1
       <= g.s - (({_T_NUM} * g.s + {_T_DEN - 1}) // {_T_DEN}) + 1
),
cross_pairs AS (
  SELECT DISTINCT a.mask AS ma, b.mask AS mb, a.s AS sa, b.s AS sb,
         a.cnt AS ca, b.cnt AS cb,
         CAST(bit_count(a.mask & b.mask) AS BIGINT) AS i
  FROM pref a JOIN pref b
    ON a.tok = b.tok AND a.mask < b.mask
   AND {_T_NUM} * b.s <= {_T_DEN} * a.s
   AND {_T_NUM} * a.s <= {_T_DEN} * b.s
  WHERE {_T_DEN} * CAST(bit_count(a.mask & b.mask) AS BIGINT)
        >= {_T_NUM} * (a.s + b.s - CAST(bit_count(a.mask & b.mask) AS BIGINT))
),
pairgroups AS (
  SELECT ma, mb, sa, sb, i,
         CAST(ca * cb AS BIGINT) AS npairs,
         CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE) AS jac_raw
  FROM cross_pairs
  UNION ALL
  SELECT mask, mask, s, s, s,
         CAST(cnt * (cnt - 1) / 2 AS BIGINT) AS npairs,
         CAST(s AS DOUBLE) / CAST(s AS DOUBLE) AS jac_raw
  FROM sets WHERE cnt >= 2
),
total AS (
  SELECT CAST(SUM(npairs) AS BIGINT) AS n_pairs_total FROM pairgroups
),
running AS (
  SELECT *,
         SUM(npairs) OVER (ORDER BY jac_raw DESC, ma, mb
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM pairgroups
),
jac_cut AS (
  SELECT MIN(jac_raw) AS cut FROM running WHERE cum - npairs < {_TOP_K}
),
keep AS (
  SELECT r.* FROM running r CROSS JOIN jac_cut c WHERE r.jac_raw >= c.cut
),
expanded AS (
  SELECT CASE WHEN da.doc_id < db.doc_id THEN da.doc_id ELSE db.doc_id END
           AS doc_a,
         CASE WHEN da.doc_id < db.doc_id THEN db.doc_id ELSE da.doc_id END
           AS doc_b,
         k.i AS n_common,
         CASE WHEN da.doc_id < db.doc_id THEN k.sa ELSE k.sb END AS size_a,
         CASE WHEN da.doc_id < db.doc_id THEN k.sb ELSE k.sa END AS size_b,
         k.jac_raw
  FROM keep k
  JOIN doc_mask da ON da.mask = k.ma
  JOIN doc_mask db ON db.mask = k.mb
   AND (k.ma <> k.mb OR da.doc_id < db.doc_id)
)
SELECT e.doc_a, e.doc_b, e.n_common, e.size_a, e.size_b,
       FLOOR((e.jac_raw) * 1e4 + 0.5) / 1e4 AS jaccard,
       t.n_pairs_total
FROM expanded e CROSS JOIN total t
ORDER BY e.jac_raw DESC, e.doc_a, e.doc_b
LIMIT {_TOP_K}
"""


def _prefix_frames(spark: SparkSession, sf_dir: str):
    """Shared front half of the prefix-filter family: distinct token
    sets as guarded <=62-bit masks plus their rarity-ordered prefix
    expansion. Returns (doc_mask, sets, pref)."""
    docs = table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    ranked = tf.select(
        "tok", F.row_number().over(Window.orderBy("df", "tok")).alias("rnk")
    ).selectExpr(
        "tok",
        "CASE WHEN rnk > 62 THEN "
        "raise_error('vocabulary exceeds 62 tokens: bitmask path invalid') "
        "ELSE rnk END AS rnk",
    )
    doc_mask = (
        toks.join(ranked, "tok")
        .groupBy("doc_id")
        .agg(
            F.expr("CAST(SUM(shiftleft(1L, rnk - 1)) AS BIGINT)").alias("mask"),
            F.count(F.lit(1)).cast("long").alias("s"),
        )
    )
    sets = doc_mask.groupBy("mask").agg(
        F.max("s").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    # Prefix membership/position from pure bit math: ranked is
    # vocab-sized, so this is a broadcast nested loop over |sets| x |V|.
    pref = sets.join(
        F.broadcast(ranked),
        F.expr(
            "((mask >> (rnk - 1)) & 1) = 1 AND "
            "bit_count(mask & (shiftleft(1L, rnk - 1) - 1)) + 1 "
            f"<= s - (({_T_NUM} * s + {_T_DEN - 1}) div {_T_DEN}) + 1"
        ),
    ).select("mask", "s", "cnt", "tok")
    return doc_mask, sets, pref


@register(
    "q_dedup_prefix_filter_join",
    oracle=_QPREFIX_ORACLE,
    description=(
        "exact Jaccard>=0.7 set-similarity self-join via PPJoin-style "
        "prefix filtering over DISTINCT token sets (guarded <=62-token "
        "bitmask fast path, inline popcount verification, multiplicity-"
        "exact pair counting, tie-complete top-200 expansion); design "
        "domain is saturating vocabularies — a pre-flight raise_error "
        "fires when the candidate set-pair space exceeds 5e7 and names "
        "q_dedup_minhash_lsh as the scale path"
    ),
    tags=("dedup", "similarity-join", "prefix-filter", "exact", "scale"),
)
def q_dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Design domain (measured, round-8 sf1.0 ladder): the set-level
    pair space is bounded by DISTINCT token sets, which saturate toward
    2^|V| on a bounded vocabulary — that is what makes this exact join
    cheap here. Corpora whose vocabulary carries document-identifying
    tokens (the tiled sf1.0's per-copy suffix) keep minting new sets
    (10x sets -> 100x set pairs; the cell DNF'd), so for
    general/growing vocabularies the scale path is MinHash candidates
    (q_dedup_minhash_lsh, x10 1.91) with exact verification — this
    operator is the bounded-vocab exact kernel. Two loud edges fence
    the domain: the rnk > 62 raise_error (vocabulary axis) and the
    round-9 pre-flight candidate-pair budget (distinct-set axis,
    _PAIR_BUDGET) that turns the sf1.0 ladder's 28-minute DNF into a
    seconds-fast failure naming the MinHash scale path."""
    doc_mask, sets, pref = _prefix_frames(spark, sf_dir)

    # Pre-flight guard (round-9, after the sf1.0 DNF): the join below
    # does Σ_tok C(g_tok, 2) popcount checks. pref is at most
    # |sets| x 62 rows, so this aggregate costs nothing; the guard
    # fails in seconds instead of letting a non-saturating vocabulary
    # (document-identifying tokens keep minting new distinct sets
    # without tripping the |V| guard) run the join for half an hour.
    # Spark-side only: in the pass domain it contributes no rows, so
    # the oracle SQL is unchanged. The .where forces evaluation —
    # column pruning alone would dead-code the raise_error.
    pair_budget = (
        pref.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("g"))
        .agg(
            F.sum(F.expr("g * (g - 1) div 2")).cast("long").alias("cand")
        )
        .selectExpr(
            f"CASE WHEN cand > {_PAIR_BUDGET} THEN raise_error(CONCAT("
            "'prefix-filter candidate set-pair space ', CAST(cand AS STRING), "
            f"' exceeds budget {_PAIR_BUDGET}: vocabulary is not saturating "
            "(distinct token sets grow with the corpus); use "
            "q_dedup_minhash_lsh as the scale path')) "
            "ELSE coalesce(cand, 0L) END AS cand_pairs"
        )
    )

    a = (
        pref.crossJoin(F.broadcast(pair_budget))
        .where(F.col("cand_pairs") >= 0)
        .drop("cand_pairs")
        .select(
            F.col("mask").alias("ma"), F.col("s").alias("sa"),
            F.col("cnt").alias("ca"), "tok",
        )
    )
    b = pref.select(
        F.col("mask").alias("mb"), F.col("s").alias("sb"),
        F.col("cnt").alias("cb"), "tok",
    )
    cross_pairs = (
        a.join(b, "tok")
        .where(
            (F.col("ma") < F.col("mb"))
            & (F.lit(_T_NUM) * F.col("sb") <= F.lit(_T_DEN) * F.col("sa"))
            & (F.lit(_T_NUM) * F.col("sa") <= F.lit(_T_DEN) * F.col("sb"))
            & F.expr(
                f"{_T_DEN} * bit_count(ma & mb) "
                f">= {_T_NUM} * (sa + sb - bit_count(ma & mb))"
            )
        )
        .select(
            "ma", "mb", "sa", "sb", "ca", "cb",
            F.expr("CAST(bit_count(ma & mb) AS BIGINT)").alias("i"),
        )
        .distinct()
    )

    pairgroups = cross_pairs.select(
        "ma",
        "mb",
        "sa",
        "sb",
        "i",
        (F.col("ca") * F.col("cb")).cast("long").alias("npairs"),
        (
            F.col("i").cast("double")
            / (F.col("sa") + F.col("sb") - F.col("i")).cast("double")
        ).alias("jac_raw"),
    ).union(
        sets.filter(F.col("cnt") >= 2).select(
            F.col("mask").alias("ma"),
            F.col("mask").alias("mb"),
            F.col("s").alias("sa"),
            F.col("s").alias("sb"),
            F.col("s").alias("i"),
            (F.col("cnt") * (F.col("cnt") - 1) / 2).cast("long")
            .alias("npairs"),
            (F.col("s").cast("double") / F.col("s").cast("double"))
            .alias("jac_raw"),
        )
    )
    total = pairgroups.agg(
        F.sum("npairs").cast("long").alias("n_pairs_total")
    )

    w_run = Window.orderBy(
        F.col("jac_raw").desc(), "ma", "mb"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    running = pairgroups.withColumn("cum", F.sum("npairs").over(w_run))
    jac_cut = running.where(F.col("cum") - F.col("npairs") < _TOP_K).agg(
        F.min("jac_raw").alias("cut")
    )
    keep = running.crossJoin(F.broadcast(jac_cut)).where(
        F.col("jac_raw") >= F.col("cut")
    )

    da = doc_mask.select(F.col("mask").alias("ma"), F.col("doc_id").alias("ida"))
    db = doc_mask.select(F.col("mask").alias("mb"), F.col("doc_id").alias("idb"))
    expanded = (
        keep.join(da, "ma")
        .join(db, "mb")
        .where((F.col("ma") != F.col("mb")) | (F.col("ida") < F.col("idb")))
        .select(
            F.least("ida", "idb").alias("doc_a"),
            F.greatest("ida", "idb").alias("doc_b"),
            F.col("i").alias("n_common"),
            F.when(F.col("ida") < F.col("idb"), F.col("sa"))
            .otherwise(F.col("sb"))
            .alias("size_a"),
            F.when(F.col("ida") < F.col("idb"), F.col("sb"))
            .otherwise(F.col("sa"))
            .alias("size_b"),
            "jac_raw",
        )
    )
    return (
        expanded.crossJoin(F.broadcast(total))
        .orderBy(F.col("jac_raw").desc(), "doc_a", "doc_b")
        .limit(_TOP_K)
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            "size_a",
            "size_b",
            (F.floor((F.col("jac_raw")) * 1e4 + 0.5) / 1e4).alias("jaccard"),
            "n_pairs_total",
        )
    )


_QPREFIX_BUDGET_ORACLE = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM toks GROUP BY tok),
ranked AS (
  SELECT tok, ROW_NUMBER() OVER (ORDER BY df, tok) AS rnk FROM tf
),
doc_mask AS (
  SELECT t.doc_id,
         CAST(SUM(CAST(1 AS BIGINT) << (r.rnk - 1)) AS BIGINT) AS mask,
         CAST(COUNT(*) AS BIGINT) AS s
  FROM toks t JOIN ranked r ON r.tok = t.tok
  GROUP BY t.doc_id
),
sets AS (
  SELECT mask, CAST(MAX(s) AS BIGINT) AS s FROM doc_mask GROUP BY mask
),
pref AS (
  SELECT g.mask, r.tok
  FROM sets g JOIN ranked r
    ON ((g.mask >> (r.rnk - 1)) & 1) = 1
   AND bit_count(g.mask & ((CAST(1 AS BIGINT) << (r.rnk - 1)) - 1)) + 1
       <= g.s - (({_T_NUM} * g.s + {_T_DEN - 1}) // {_T_DEN}) + 1
),
groups AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS g FROM pref GROUP BY tok
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM doc_mask) AS n_docs,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM ranked)  AS vocab_size,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM sets)    AS n_distinct_sets,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM pref)    AS prefix_rows,
  CAST(COALESCE(SUM(g * (g - 1) // 2), 0) AS BIGINT) AS cand_pairs,
  CAST(COALESCE(SUM(g * (g - 1) // 2), 0) <= {_PAIR_BUDGET} AS BOOLEAN)
    AS within_budget
FROM groups
"""


@register(
    "q_dedup_prefix_budget_report",
    oracle=_QPREFIX_BUDGET_ORACLE,
    description=(
        "pre-flight scale report for the prefix-filter join: distinct "
        "token sets, prefix expansion size, exact candidate set-pair "
        "space sum C(g,2), and whether it is inside the 5e7 budget "
        "the join guards on — the metric that separates saturating "
        "vocabularies (in-domain) from corpora that mint new sets "
        "(MinHash territory)"
    ),
    tags=("dedup", "prefix-filter", "scale", "diagnostics"),
)
def q_dedup_prefix_budget_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-9 guard's pre-flight aggregate surfaced as a query:
    users can ask 'is this corpus in the prefix join's design domain?'
    for the cost of one tokenize + two small aggregates, instead of
    finding out via the guard mid-job. The candidate count here is
    EXACTLY the number of popcount checks q_dedup_prefix_filter_join
    would perform (sf1.0 tiled measured 3.23e9 — two orders over
    budget; driver SFs sit far inside it)."""
    doc_mask, sets, pref = _prefix_frames(spark, sf_dir)
    budget = (
        pref.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("g"))
        .agg(
            F.coalesce(
                F.sum(F.expr("g * (g - 1) div 2")), F.lit(0)
            ).cast("long").alias("cand_pairs")
        )
    )
    counts = (
        doc_mask.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(
            doc_mask.agg(
                F.countDistinct("mask").cast("long").alias("n_distinct_sets")
            )
        )
        .crossJoin(
            pref.agg(
                F.countDistinct("tok").cast("long").alias("vocab_size_pref"),
                F.count(F.lit(1)).cast("long").alias("prefix_rows"),
            )
        )
    )
    vocab = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .agg(F.countDistinct("tok").cast("long").alias("vocab_size"))
    )
    return (
        counts.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(budget))
        .select(
            "n_docs",
            "vocab_size",
            "n_distinct_sets",
            "prefix_rows",
            "cand_pairs",
            (F.col("cand_pairs") <= F.lit(_PAIR_BUDGET)).alias(
                "within_budget"
            ),
        )
    )
