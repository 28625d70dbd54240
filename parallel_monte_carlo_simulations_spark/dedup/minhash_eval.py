"""MinHash estimator-quality evaluation: estimate vs exact Jaccard.

``q_dedup_minhash_lsh`` uses the k=8 MinHash signature only to *find*
candidates and verifies with exact Jaccard; this query measures how
good the signature itself is as a similarity ESTIMATOR — the number a
pipeline owner needs before trusting signature-only dedup at a scale
where exact verification is too expensive. (Companion of
``similarity/recall.py``, which makes the same measurement for the ANN
paths vs brute-force truth.)

Per LSH candidate pair: estimate = (matching signature components)/k,
truth = exact shingle Jaccard; pairs bucket by truth decile and report
count, mean estimate, mean truth and mean |error| per bucket.

Exactness: matches and set sizes are integers; each pair's estimate,
truth and |error| are quantized to DECIMAL(18,8) BEFORE the cross-pair
mean (float SUM is order-dependent; DECIMAL SUM is exact), then one
mirrored double division per bucket. The |error| numerator is the
integer ``|matches·union - k·n_common|`` over the common denominator
``k·union``, so even the absolute value is taken on an exact integer.

Scale notes: same shuffle profile as the LSH dedup itself — candidate
generation is the band-key equi-join (no all-pairs), the evaluation
adds one signature join (8 ints per doc) and the exact-verify join the
dedup already performs. The output is |buckets| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import sql_hash60_seeded, sql_shingles
from ..registry import register
from .minhash import (
    N_HASHES,
    VERIFY_SEED,
    lsh_candidates,
    minhash_signatures,
    shingle_hash_arrays,
)
from .ngram import shingle_sets

_SH = sql_shingles("text", 3)
_MINS_SQL = ",\n    ".join(
    f"MIN({sql_hash60_seeded('shingle', i)}) AS m{i}" for i in range(N_HASHES)
)
_BANDS_SQL = ", ".join(
    "CONCAT(" + ", ':', ".join([f"'{b}'"] + [f"m{b * 2 + r}" for r in range(2)]) + ")"
    for b in range(N_HASHES // 2)
)
_MATCHES_SQL = " + ".join(
    f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)" for i in range(N_HASHES)
)

_QMINHASH_EVAL_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, unnest({_SH}) AS shingle FROM documents
),
sig AS (
  SELECT doc_id,
    {_MINS_SQL}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, unnest([{_BANDS_SQL}]) AS band_key FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
matches AS (
  SELECT c.doc_a, c.doc_b,
         CAST({_MATCHES_SQL} AS BIGINT) AS m
  FROM cand c
  JOIN sig a ON a.doc_id = c.doc_a
  JOIN sig b ON b.doc_id = c.doc_b
),
hsh AS (
  SELECT DISTINCT doc_id, {sql_hash60_seeded('shingle', VERIFY_SEED)} AS h
  FROM sh
),
counts AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM hsh GROUP BY doc_id
),
verified AS (
  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM cand c
  JOIN hsh sa ON sa.doc_id = c.doc_a
  JOIN hsh sb ON sb.doc_id = c.doc_b AND sb.h = sa.h
  GROUP BY c.doc_a, c.doc_b
),
pairs AS (
  SELECT m.doc_a, m.doc_b, m.m,
         COALESCE(v.n_common, 0) AS n_common,
         ca.n + cb.n - COALESCE(v.n_common, 0) AS u
  FROM matches m
  LEFT JOIN verified v ON v.doc_a = m.doc_a AND v.doc_b = m.doc_b
  JOIN counts ca ON ca.doc_id = m.doc_a
  JOIN counts cb ON cb.doc_id = m.doc_b
),
quantized AS (
  SELECT
    CAST(floor((CAST(n_common AS DOUBLE) / CAST(u AS DOUBLE)) * 10.0e0)
         AS INTEGER) AS bucket,
    CAST(FLOOR((CAST(m AS DOUBLE) / {N_HASHES}.0e0) * 1e8 + 0.5) / 1e8 AS DECIMAL(18,8))
      AS est,
    CAST(FLOOR((CAST(n_common AS DOUBLE) / CAST(u AS DOUBLE)) * 1e8 + 0.5) / 1e8
         AS DECIMAL(18,8)) AS truth,
    CAST(FLOOR((CAST(abs((m * u) - ({N_HASHES} * n_common)) AS DOUBLE)
               / CAST({N_HASHES} * u AS DOUBLE)) * 1e8 + 0.5) / 1e8 AS DECIMAL(18,8))
      AS abs_err
  FROM pairs
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       FLOOR((CAST(SUM(est) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 1e6 + 0.5) / 1e6
         AS mean_estimate,
       FLOOR((CAST(SUM(truth) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 1e6 + 0.5) / 1e6
         AS mean_truth,
       FLOOR((CAST(SUM(abs_err) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 1e6 + 0.5) / 1e6
         AS mean_abs_error
FROM quantized
GROUP BY bucket
ORDER BY bucket
"""


@register(
    "q_dedup_minhash_error_eval",
    oracle=_QMINHASH_EVAL_ORACLE,
    description=(
        "MinHash estimator quality: signature-match similarity vs exact "
        "shingle Jaccard per truth decile over LSH candidate pairs "
        "(count, mean estimate, mean truth, mean |error|)"
    ),
    tags=("dedup", "minhash", "evaluation", "jaccard", "measurement"),
)
def q_dedup_minhash_error_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingle_sets(spark, sf_dir).persist()
    sig = minhash_signatures(sh).persist()
    cand = lsh_candidates(sig)

    # Every corpus-sided frame below (signatures, hashed-shingle
    # arrays) carries a bogus-small post-explode static estimate —
    # pin sort-merge so the planner never broadcasts the corpus
    # (round-8 registry audit; guaranteed OOM at 100 TB).
    a = sig.alias("a").hint("merge")
    b = sig.alias("b").hint("merge")
    m_expr = sum(
        F.when(F.col(f"a.m{i}") == F.col(f"b.m{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    matches = (
        cand.join(a, F.col("doc_a") == F.col("a.doc_id"))
        .join(b, F.col("doc_b") == F.col("b.doc_id"))
        .select("doc_a", "doc_b", m_expr.cast("long").alias("m"))
    )

    # Exact-Jaccard truth via per-doc hashed-shingle arrays (the same
    # scalar array_intersect verify as q_dedup_minhash_lsh — no
    # pair x shingle row expansion; oracle counts over the identical
    # md5 hash universe).
    arrs = shingle_hash_arrays(sh)
    pa = arrs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hs").alias("ha"),
        F.col("n").alias("n_a"),
    ).hint("merge")
    pb = arrs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hs").alias("hb"),
        F.col("n").alias("n_b"),
    ).hint("merge")
    pairs = (
        matches.join(pa, "doc_a")
        .join(pb, "doc_b")
        .select(
            "m",
            F.size(F.array_intersect("ha", "hb")).cast("long").alias("n_common"),
            F.col("n_a"),
            F.col("n_b"),
        )
        .select(
            "m",
            "n_common",
            (F.col("n_a") + F.col("n_b") - F.col("n_common")).alias("u"),
        )
    )

    truth_d = F.col("n_common").cast("double") / F.col("u").cast("double")
    quantized = pairs.select(
        F.floor(truth_d * 10.0).cast("int").alias("bucket"),
        (F.floor((F.col("m").cast("double") / float(N_HASHES)) * 1e8 + 0.5) / 1e8)
        .cast("decimal(18,8)")
        .alias("est"),
        (F.floor((truth_d) * 1e8 + 0.5) / 1e8).cast("decimal(18,8)").alias("truth"),
        (F.floor((F.abs((F.col("m") * F.col("u")) - (N_HASHES * F.col("n_common")))
            .cast("double")
            / (N_HASHES * F.col("u")).cast("double")) * 1e8 + 0.5) / 1e8)
        .cast("decimal(18,8)")
        .alias("abs_err"),
    )
    cnt_d = F.count(F.lit(1)).cast("double")
    return (
        quantized.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            (F.floor((F.sum("est").cast("double") / cnt_d) * 1e6 + 0.5) / 1e6).alias(
                "mean_estimate"
            ),
            (F.floor((F.sum("truth").cast("double") / cnt_d) * 1e6 + 0.5) / 1e6).alias(
                "mean_truth"
            ),
            (F.floor((F.sum("abs_err").cast("double") / cnt_d) * 1e6 + 0.5) / 1e6).alias(
                "mean_abs_error"
            ),
        )
        .orderBy("bucket")
    )
