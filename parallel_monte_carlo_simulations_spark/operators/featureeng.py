"""Feature-engineering operators for ML training pipelines.

The three encoders every tabular training job needs, each expressed as
pure aggregations/joins so they run JVM-side and oracle exactly:

- **Smoothed target encoding**: category -> shrunk mean of a binary
  target, ``(pos + m * prior) / (n + m)``. The prior and the encoding
  are computed from exact integer counts; the single double expression
  is mirrored verbatim in the oracle (one association order, rounded
  once).
- **Feature hashing (the hashing trick)**: portable md5-derived bucket
  ``h % B`` with a sign hash, aggregated to signed bucket counts — the
  fixed-width, vocabulary-free encoding used when the category space is
  unbounded. Collisions are part of the contract; the signed sum makes
  them unbiased.
- **Quantile binning**: ``ntile(10)`` over a deterministic total order
  (value, key) — equal-frequency discretization with exact bin stats.

Scale: target encoding is one groupBy on the category key plus a
broadcast of the (tiny) encoding table back onto the fact side;
feature hashing is a single map-side expression plus one groupBy on
the 64-bucket key; binning is a range-partitionable window. No
collects, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60, sql_hash60
from ..registry import register
from ..tables import table

#: Smoothing pseudo-count for target encoding.
SMOOTH_M = 10
#: Bucket count for the hashing trick.
HASH_BUCKETS = 64

# --------------------------------------------------------------------------
# Smoothed target encoding: c_mktsegment -> P(order is high-priority),
# shrunk toward the global prior.
# --------------------------------------------------------------------------

_QTENC_ORACLE = f"""
WITH joined AS (
  SELECT c.c_mktsegment AS segment,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS target
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
prior AS (
  SELECT CAST(SUM(target) AS BIGINT) AS gpos,
         CAST(COUNT(*) AS BIGINT) AS gn
  FROM joined
),
seg AS (
  SELECT segment,
         CAST(SUM(target) AS BIGINT) AS pos,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM joined
  GROUP BY segment
)
SELECT s.segment,
       s.n AS n_orders,
       s.pos AS n_positive,
       FLOOR(((CAST(s.pos AS DOUBLE)
              + {SMOOTH_M}.0e0 * (CAST(p.gpos AS DOUBLE) / CAST(p.gn AS DOUBLE)))
             / (CAST(s.n AS DOUBLE) + {SMOOTH_M}.0e0)) * 1e6 + 0.5) / 1e6 AS encoded
FROM seg s CROSS JOIN prior p
ORDER BY s.segment
"""


@register(
    "q_feat_target_encoding",
    oracle=_QTENC_ORACLE,
    description=(
        "smoothed target encoding: market segment -> shrunk "
        "high-priority-order rate (pos + m*prior)/(n + m), m=10"
    ),
    tags=("feature-engineering", "ml", "encoding", "aggregate", "llm-pipeline"),
)
def q_feat_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("target"),
    )
    prior = joined.agg(
        F.sum("target").alias("gpos"), F.count("*").alias("gn")
    )
    seg = joined.groupBy("segment").agg(
        F.sum("target").alias("pos"), F.count("*").alias("n")
    )
    m = float(SMOOTH_M)
    encoded = (F.floor(((
            F.col("pos").cast("double")
            + F.lit(m) * (F.col("gpos").cast("double") / F.col("gn").cast("double"))
        )
        / (F.col("n").cast("double") + F.lit(m))) * 1e6 + 0.5) / 1e6)
    return (
        seg.crossJoin(F.broadcast(prior))
        .select(
            "segment",
            F.col("n").alias("n_orders"),
            F.col("pos").alias("n_positive"),
            encoded.alias("encoded"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# Feature hashing: (segment, nation) categorical pairs -> 64 signed
# buckets.
# --------------------------------------------------------------------------

_FEAT_EXPR = "c_mktsegment || '|' || CAST(c_nationkey AS VARCHAR)"

_QHASH_ORACLE = f"""
WITH feats AS (
  SELECT {sql_hash60(_FEAT_EXPR)} % {HASH_BUCKETS} AS bucket,
         CASE WHEN {sql_hash60("'sign:' || " + _FEAT_EXPR)} % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM customer
)
SELECT bucket,
       CAST(SUM(sgn) AS BIGINT) AS signed_count,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM feats
GROUP BY bucket
ORDER BY bucket
"""


@register(
    "q_feat_hashing_trick",
    oracle=_QHASH_ORACLE,
    description=(
        "feature hashing: (segment, nation) pairs into 64 buckets with "
        "a sign hash — vocabulary-free fixed-width encoding, signed sums "
        "make collisions unbiased"
    ),
    tags=("feature-engineering", "ml", "hashing", "aggregate", "llm-pipeline"),
)
def q_feat_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    feat = F.concat(
        F.col("c_mktsegment"), F.lit("|"), F.col("c_nationkey").cast("string")
    )
    bucket = hash60(feat) % HASH_BUCKETS
    sgn = F.when(
        hash60(F.concat(F.lit("sign:"), feat)) % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        c.select(bucket.alias("bucket"), sgn.alias("sgn"))
        .groupBy("bucket")
        .agg(
            F.sum("sgn").alias("signed_count"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Equal-frequency binning: decile discretization of order totals.
# --------------------------------------------------------------------------

_QBIN_ORACLE = """
WITH binned AS (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
  FROM orders
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       FLOOR((MIN(o_totalprice)) * 1e2 + 0.5) / 1e2 AS lo,
       FLOOR((MAX(o_totalprice)) * 1e2 + 0.5) / 1e2 AS hi,
       FLOOR((CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
             / (100.0e0 * COUNT(*))) * 1e4 + 0.5) / 1e4 AS mean_price
FROM binned
GROUP BY bin
ORDER BY bin
"""


@register(
    "q_feat_quantile_binning",
    oracle=_QBIN_ORACLE,
    description=(
        "equal-frequency decile binning of order totals: ntile over a "
        "deterministic (value, key) order with exact cent-integer bin "
        "means"
    ),
    tags=("feature-engineering", "ml", "binning", "window", "llm-pipeline"),
)
def q_feat_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    # deciles via the range-bucketed rank kernel + closed-form NTILE
    # (round 11) — identical bins, no global-sort window.
    from .rankstats import bucketed_running, sql_ntile

    nt = o.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    binned = (
        bucketed_running(
            o.select("o_totalprice", "o_orderkey"),
            axis="o_totalprice",
            order=[F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
            cums={"rank": F.lit(1)},
        )
        .crossJoin(F.broadcast(nt))
        .select(
            "o_totalprice",
            sql_ntile(F.col("rank"), F.col("n_all"), 10).alias("bin"),
        )
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            (F.floor((F.min("o_totalprice")) * 1e2 + 0.5) / 1e2).alias("lo"),
            (F.floor((F.max("o_totalprice")) * 1e2 + 0.5) / 1e2).alias("hi"),
            (F.floor((F.sum(cents).cast("double")
                / (F.lit(100.0) * F.count("*"))) * 1e4 + 0.5) / 1e4).alias("mean_price"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# Equi-WIDTH histogram via width_bucket — the complement of the
# equi-frequency ntile binning above.
# --------------------------------------------------------------------------

_QWIDTH_ORACLE = """
WITH bounds AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
),
binned AS (
  -- DuckDB has no width_bucket; replay Spark's (Postgres) semantics:
  -- floor((x - lo) / ((hi - lo) / n)) + 1, with x = hi landing in n+1
  SELECT CAST(FLOOR((o.o_totalprice - b.lo) / ((b.hi - b.lo) / 20.0e0))
              AS BIGINT) + 1 AS bin
  FROM orders o CROSS JOIN bounds b
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM binned
GROUP BY bin
ORDER BY bin
"""


@register(
    "q_feat_equiwidth_histogram",
    oracle=_QWIDTH_ORACLE,
    description=(
        "equi-width 20-bin histogram of order totals via width_bucket "
        "over the data-derived [min, max] range — the complement of "
        "equi-frequency ntile binning"
    ),
    tags=("feature-engineering", "histogram", "width_bucket", "aggregate"),
)
def q_feat_equiwidth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .select(
            F.width_bucket(
                F.col("o_totalprice"), F.col("lo"), F.col("hi"), F.lit(20)
            )
            .cast("long")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("bin")
    )


_QWOE_ORACLE = """
WITH rows_t AS (
  SELECT CAST(CEIL(l_quantity / 10.0) AS BIGINT) AS bucket,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem
),
cells AS (
  SELECT bucket,
         CAST(SUM(y) AS BIGINT)      AS n_pos,
         CAST(SUM(1 - y) AS BIGINT)  AS n_neg
  FROM rows_t GROUP BY bucket
  HAVING SUM(y) > 0 AND SUM(1 - y) > 0
),
tot AS (
  SELECT CAST(SUM(n_pos) AS BIGINT) AS p_tot,
         CAST(SUM(n_neg) AS BIGINT) AS n_tot
  FROM cells
),
scored AS (
  SELECT c.bucket, c.n_pos, c.n_neg,
         LN((CAST(c.n_pos AS DOUBLE) * t.n_tot)
            / (CAST(c.n_neg AS DOUBLE) * t.p_tot)) AS woe_raw,
         (CAST(c.n_pos AS DOUBLE) / t.p_tot
          - CAST(c.n_neg AS DOUBLE) / t.n_tot)
         * LN((CAST(c.n_pos AS DOUBLE) * t.n_tot)
              / (CAST(c.n_neg AS DOUBLE) * t.p_tot)) AS iv_raw
  FROM cells c CROSS JOIN tot t
),
quant AS (
  SELECT bucket, n_pos, n_neg, woe_raw,
         CAST(FLOOR((iv_raw) * 1e10 + 0.5) / 1e10 AS DECIMAL(24,10)) AS iv_q
  FROM scored
)
SELECT bucket, n_pos, n_neg,
       FLOOR((woe_raw) * 1e6 + 0.5) / 1e6 AS woe,
       FLOOR((CAST(iv_q AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS iv_term,
       FLOOR((CAST(SUM(iv_q) OVER () AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS iv_total
FROM quant
ORDER BY bucket
"""


@register(
    "q_feat_woe_iv",
    oracle=_QWOE_ORACLE,
    description=(
        "weight-of-evidence / information-value screen: per quantity "
        "bucket, WoE = ln((pos_i/P)/(neg_i/N)) against the returned "
        "flag and the bucket's IV contribution plus the feature's "
        "total IV — the classic scorecard metric for ranking "
        "categorical features before model training"
    ),
    tags=("feature-engineering", "ml", "statistics", "woe", "aggregate"),
)
def q_feat_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan, one 5-cell grouped aggregate, totals broadcast back.
    WoE keeps integer products inside a single LN; per-bucket IV terms
    quantize to DECIMAL(24,10) before the window total so the
    cross-cell sum is order-independent (house float discipline)."""
    li = table(spark, sf_dir, "lineitem")
    rows_t = li.select(
        F.ceil(F.col("l_quantity") / 10.0).cast("long").alias("bucket"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    # Pure buckets (n_pos or n_neg = 0) make WoE = ln(0) — DuckDB raises,
    # Spark returns NULL (divergent). The standard scorecard treatment is
    # dropping (or smoothing) pure buckets; the filter is mirrored in the
    # oracle's HAVING so both engines score the same cells. No-op on the
    # driver testdata (no pure bucket exists at any SF).
    cells = rows_t.groupBy("bucket").agg(
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("long").alias("n_neg"),
    ).filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
    tot = cells.agg(
        F.sum("n_pos").cast("long").alias("p_tot"),
        F.sum("n_neg").cast("long").alias("n_tot"),
    )
    woe_raw = F.log(
        (F.col("n_pos").cast("double") * F.col("n_tot"))
        / (F.col("n_neg").cast("double") * F.col("p_tot"))
    )
    iv_raw = (
        F.col("n_pos").cast("double") / F.col("p_tot")
        - F.col("n_neg").cast("double") / F.col("n_tot")
    ) * woe_raw
    from pyspark.sql import Window

    quant = (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_pos",
            "n_neg",
            woe_raw.alias("woe_raw"),
            (F.floor((iv_raw) * 1e10 + 0.5) / 1e10).cast("decimal(24,10)").alias("iv_q"),
        )
    )
    return (
        quant.select(
            "bucket",
            "n_pos",
            "n_neg",
            (F.floor((F.col("woe_raw")) * 1e6 + 0.5) / 1e6).alias("woe"),
            (F.floor((F.col("iv_q").cast("double")) * 1e6 + 0.5) / 1e6).alias("iv_term"),
            (F.floor((F.sum("iv_q")
                .over(Window.partitionBy())
                .cast("double")) * 1e6 + 0.5) / 1e6).alias("iv_total"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Leakage-safe K-fold (out-of-fold) target encoding — the production
# form of q_feat_target_encoding: a row's own fold never contributes to
# its encoding, so the feature carries no target leakage into training.
# --------------------------------------------------------------------------

_KFOLDS = 5

_QTEKF_ORACLE = f"""
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         o.o_orderkey % {_KFOLDS} AS fold,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS target
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
prior AS (
  SELECT CAST(SUM(target) AS BIGINT) AS gpos,
         CAST(COUNT(*) AS BIGINT) AS gn
  FROM base
),
cells AS (
  SELECT segment, fold,
         CAST(SUM(target) AS BIGINT) AS pos,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM base GROUP BY segment, fold
),
cat AS (
  SELECT segment,
         CAST(SUM(pos) AS BIGINT) AS cpos,
         CAST(SUM(n) AS BIGINT) AS cn
  FROM cells GROUP BY segment
)
SELECT ce.segment,
       CAST(ce.fold AS BIGINT) AS fold,
       CAST(ce.n AS BIGINT) AS n_infold,
       CAST(ca.cn - ce.n AS BIGINT) AS n_outfold,
       FLOOR(((CAST(ca.cpos - ce.pos AS DOUBLE)
              + {SMOOTH_M}.0e0 * (CAST(p.gpos AS DOUBLE) / CAST(p.gn AS DOUBLE)))
             / (CAST(ca.cn - ce.n AS DOUBLE) + {SMOOTH_M}.0e0)) * 1e6 + 0.5) / 1e6
         AS enc_oof,
       FLOOR(((CAST(ca.cpos AS DOUBLE)
              + {SMOOTH_M}.0e0 * (CAST(p.gpos AS DOUBLE) / CAST(p.gn AS DOUBLE)))
             / (CAST(ca.cn AS DOUBLE) + {SMOOTH_M}.0e0)) * 1e6 + 0.5) / 1e6
         AS enc_full,
       FLOOR((FLOOR(((CAST(ca.cpos AS DOUBLE)
              + {SMOOTH_M}.0e0 * (CAST(p.gpos AS DOUBLE) / CAST(p.gn AS DOUBLE)))
             / (CAST(ca.cn AS DOUBLE) + {SMOOTH_M}.0e0)) * 1e6 + 0.5) / 1e6
           - FLOOR(((CAST(ca.cpos - ce.pos AS DOUBLE)
              + {SMOOTH_M}.0e0 * (CAST(p.gpos AS DOUBLE) / CAST(p.gn AS DOUBLE)))
             / (CAST(ca.cn - ce.n AS DOUBLE) + {SMOOTH_M}.0e0)) * 1e6 + 0.5) / 1e6) * 1e6 + 0.5) / 1e6
         AS leakage_delta
FROM cells ce
JOIN cat ca ON ca.segment = ce.segment
CROSS JOIN prior p
ORDER BY ce.segment, ce.fold
"""


@register(
    "q_feat_target_encoding_kfold",
    oracle=_QTEKF_ORACLE,
    description=(
        f"leakage-safe {_KFOLDS}-fold out-of-fold target encoding "
        f"(smoothing m={SMOOTH_M}): per (segment, fold) the encoding "
        "computed WITHOUT that fold's rows, beside the full-data "
        "encoding and the leakage delta — the production variant of "
        "q_feat_target_encoding, sibling of q_split_leakage_audit"
    ),
    tags=("featureeng", "target-encoding", "kfold", "leakage", "ml"),
)
def q_feat_target_encoding_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold encoding from ONE pass of sufficient statistics:
    per-(category, fold) cells aggregate once; the out-of-fold encoding
    for fold f is (cat_sum - cell_sum_f) / (cat_n - cell_n_f) with the
    usual m-smoothed global prior — no per-fold re-scan, so K costs
    nothing extra at 100 TB. Folds are deterministic (o_orderkey mod
    K), matching both engines bit-for-bit."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_orderkey") % _KFOLDS).alias("fold"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("target"),
    )
    prior = base.agg(
        F.sum("target").cast("long").alias("gpos"),
        F.count("*").cast("long").alias("gn"),
    )
    cells = base.groupBy("segment", "fold").agg(
        F.sum("target").cast("long").alias("pos"),
        F.count("*").cast("long").alias("n"),
    )
    cat = cells.groupBy("segment").agg(
        F.sum("pos").cast("long").alias("cpos"),
        F.sum("n").cast("long").alias("cn"),
    )
    m = float(SMOOTH_M)
    gprior = F.col("gpos").cast("double") / F.col("gn").cast("double")
    enc_oof = (F.floor((((F.col("cpos") - F.col("pos")).cast("double") + F.lit(m) * gprior)
        / ((F.col("cn") - F.col("n")).cast("double") + F.lit(m))) * 1e6 + 0.5) / 1e6)
    enc_full = (F.floor(((F.col("cpos").cast("double") + F.lit(m) * gprior)
        / (F.col("cn").cast("double") + F.lit(m))) * 1e6 + 0.5) / 1e6)
    return (
        cells.join(F.broadcast(cat), "segment")
        .crossJoin(F.broadcast(prior))
        .select(
            "segment",
            F.col("fold").cast("long").alias("fold"),
            F.col("n").cast("long").alias("n_infold"),
            (F.col("cn") - F.col("n")).cast("long").alias("n_outfold"),
            enc_oof.alias("enc_oof"),
            enc_full.alias("enc_full"),
            (F.floor((enc_full - enc_oof) * 1e6 + 0.5) / 1e6).alias("leakage_delta"),
        )
        .orderBy("segment", "fold")
    )


# --------------------------------------------------------------------------
# Feature hashing (the "hashing trick", round 11): fixed-dimension
# signed bag-of-words with NO vocabulary state — the vectorizer that
# scales to unbounded vocabularies because the dimension is a hash
# codomain, not a dictionary.
# --------------------------------------------------------------------------

_FH_D = 64  #: hashed feature dimension

_QFHASH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           AS t
  FROM documents
),
h AS (
  SELECT doc_id, t,
         {sql_hash60("'fh:' || t")} % {_FH_D} AS dim,
         CASE WHEN {sql_hash60("'fs:' || t")} % 2 = 0 THEN 1 ELSE -1 END
           AS sgn
  FROM tok
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT)           AS n_occurrences,
       CAST(COUNT(DISTINCT t) AS BIGINT)  AS n_distinct_tokens,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(SUM(sgn) AS BIGINT)           AS sum_signed
FROM h
GROUP BY dim
ORDER BY dim
"""


@register(
    "q_feat_hashing_text",
    oracle=_QFHASH_ORACLE,
    description=(
        f"feature hashing: tokens -> {_FH_D} signed hashed dimensions "
        "(portable 60-bit hash for index, an independent hash bit for "
        "the sign, so collisions cancel in expectation); per-dimension "
        "occupancy / collision-pressure / signed-mass report"
    ),
    tags=("feature-engineering", "ml", "hashing", "text", "llm-pipeline"),
)
def q_feat_hashing_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vocabulary-free vectorizer: dim = h(token) mod D with an
    independent sign hash (Weinberger et al.'s unbiased variant). No
    fitted dictionary means no driver-side state and no vocabulary
    broadcast — the property that makes it THE featurizer at 100 TB.
    The per-dimension report is the practical audit: occupancy shows
    load balance across dims, distinct-token counts show collision
    pressure (vocabulary / D per dim if the hash is uniform), and the
    signed mass shows how well collisions cancel. One token explode +
    one 64-key aggregation; everything exact integers."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).alias("t"),
    )
    h = tok.select(
        "doc_id",
        "t",
        (hash60(F.concat(F.lit("fh:"), F.col("t"))) % _FH_D).alias("dim"),
        F.when(
            hash60(F.concat(F.lit("fs:"), F.col("t"))) % 2 == 0, F.lit(1)
        )
        .otherwise(F.lit(-1))
        .alias("sgn"),
    )
    # Two pre-aggregated pipelines instead of one multi-countDistinct
    # aggregation: Spark plans 2 distincts as a 3x Expand of the token
    # stream (measured 4.7x at natural x10); pre-grouping by (dim, t)
    # and (dim, doc) keeps each shuffle at most token-stream-sized.
    # sgn is a function of t, so per-token occurrence counts carry the
    # signed sum exactly.
    per_tok = h.groupBy("dim", "t", "sgn").agg(
        F.count(F.lit(1)).cast("long").alias("occ")
    )
    tok_stats = per_tok.groupBy("dim").agg(
        F.sum("occ").cast("long").alias("n_occurrences"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_tokens"),
        F.sum(F.col("sgn") * F.col("occ")).cast("long").alias("sum_signed"),
    )
    doc_stats = (
        h.select("dim", "doc_id")
        .distinct()
        .groupBy("dim")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    return (
        tok_stats.join(doc_stats, "dim")
        .select(
            F.col("dim").cast("long").alias("dim"),
            "n_occurrences",
            "n_distinct_tokens",
            "n_docs",
            "sum_signed",
        )
        .orderBy("dim")
    )
