"""SimHash near-duplicate detection.

60-bit SimHash over word-trigram shingles: bit j of a doc's signature is
the majority vote of bit j across its shingles' 60-bit hashes. Near-dups
are pairs within Hamming distance <= 3, found WITHOUT a quadratic scan by
pigeonhole blocking: split the 60 bits into 4 pieces of 15; any pair with
<= 3 differing bits must agree on at least one piece, so candidates come
from an equi-join on (piece_index, piece_value).

Both the signature and the blocking are generated expressions that stay
in whole-stage codegen; the DuckDB oracle is generated from the same
constants, so the two engines compute identical signatures.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60, sql_hash60, sql_shingles
from ..registry import register
from .ngram import shingle_sets

SIM_BITS = 60
N_PIECES = 4
PIECE_BITS = SIM_BITS // N_PIECES  # 15
MAX_HAMMING = N_PIECES - 1  # pigeonhole guarantee for the blocking

_SH = sql_shingles("text", 3)

_BITSUMS_SQL = ",\n    ".join(
    f"SUM(((h >> {j}) & 1) * 2 - 1) AS s{j}" for j in range(SIM_BITS)
)
_COMBINE_SQL = " + ".join(
    f"(CASE WHEN s{j} >= 0 THEN (1::BIGINT << {j}) ELSE 0::BIGINT END)"
    for j in range(SIM_BITS)
)
_PIECES_SQL = ", ".join(
    f"CONCAT('{p}', ':', (simhash >> {p * PIECE_BITS}) & {(1 << PIECE_BITS) - 1})"
    for p in range(N_PIECES)
)

_QSIMHASH_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, unnest({_SH}) AS shingle FROM documents
),
hashed AS (
  SELECT doc_id, {sql_hash60('shingle')} AS h FROM sh
),
bitsums AS (
  SELECT doc_id,
    {_BITSUMS_SQL}
  FROM hashed GROUP BY doc_id
),
sig AS (
  SELECT doc_id, {_COMBINE_SQL} AS simhash FROM bitsums
),
pieces AS (
  SELECT doc_id, simhash, unnest([{_PIECES_SQL}]) AS piece FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sig_a, b.simhash AS sig_b
  FROM pieces a JOIN pieces b
    ON a.piece = b.piece AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sig_a, sig_b)) <= {MAX_HAMMING}
"""


def simhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, simhash bigint) — one groupBy with 60 generated bit sums."""
    hashed = sh.select("doc_id", hash60("shingle").alias("h"))
    bitsums = hashed.groupBy("doc_id").agg(
        *[
            F.sum((F.shiftright("h", j).bitwiseAND(F.lit(1))) * 2 - 1).alias(f"s{j}")
            for j in range(SIM_BITS)
        ]
    )
    combined = functools.reduce(
        operator.add,
        [
            F.when(F.col(f"s{j}") >= 0, F.lit(1 << j).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
            for j in range(SIM_BITS)
        ],
    )
    return bitsums.select("doc_id", combined.alias("simhash"))


@register(
    "q_dedup_simhash",
    oracle=_QSIMHASH_ORACLE,
    description="SimHash(60-bit) near-dups, Hamming<=3 via 4-piece pigeonhole blocking",
    tags=("dedup", "simhash"),
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = simhash_signatures(shingle_sets(spark, sf_dir)).persist()
    piece_cols = [
        F.concat_ws(
            ":",
            F.lit(str(p)),
            F.shiftright("simhash", p * PIECE_BITS).bitwiseAND(
                F.lit((1 << PIECE_BITS) - 1)
            ),
        )
        for p in range(N_PIECES)
    ]
    pieces = sig.select(
        "doc_id", "simhash", F.explode(F.array(*piece_cols)).alias("piece")
    )
    # pieces is corpus-sized (one row per doc per band-slice) and
    # post-explode, so its static size estimate is tiny — without a
    # hint the planner broadcasts it (round-8 audit; unbounded at
    # 100 TB). Pin spill-safe sort-merge on the piece equi-key.
    a = pieces.alias("a").hint("merge")
    b = pieces.alias("b").hint("merge")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.piece") == F.col("b.piece"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= MAX_HAMMING)
    )


# ---------------------------------------------------------------------------
# Pigeonhole recall audit: prove the blocking guarantee on data.
# ---------------------------------------------------------------------------

_QSIMHASH_AUDIT_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, unnest({_SH}) AS shingle FROM documents
),
hashed AS (
  SELECT doc_id, {sql_hash60('shingle')} AS h FROM sh
),
bitsums AS (
  SELECT doc_id,
    {_BITSUMS_SQL}
  FROM hashed GROUP BY doc_id
),
sig AS (
  SELECT doc_id, {_COMBINE_SQL} AS simhash FROM bitsums
),
truth AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {MAX_HAMMING}
),
pieces AS (
  SELECT doc_id, simhash, unnest([{_PIECES_SQL}]) AS piece FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sig_a, b.simhash AS sig_b
  FROM pieces a JOIN pieces b
    ON a.piece = b.piece AND a.doc_id < b.doc_id
),
found AS (
  SELECT doc_a, doc_b FROM cand
  WHERE bit_count(xor(sig_a, sig_b)) <= {MAX_HAMMING}
),
missed AS (
  SELECT t.doc_a FROM truth t
  LEFT JOIN found f ON f.doc_a = t.doc_a AND f.doc_b = t.doc_b
  WHERE f.doc_a IS NULL
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth)  AS n_truth,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM found)  AS n_found,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM missed) AS n_missed,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cand)   AS n_candidates
"""


@register(
    "q_dedup_simhash_recall_audit",
    oracle=_QSIMHASH_AUDIT_ORACLE,
    description=(
        "SimHash pigeonhole recall audit: ALL-pairs Hamming truth vs the "
        f"{N_PIECES}-piece blocked index — n_missed MUST be 0 (<= "
        f"{MAX_HAMMING} bit errors cannot corrupt every piece), measured "
        "on data, plus the candidate-efficiency count"
    ),
    tags=("dedup", "simhash", "evaluation", "audit"),
)
def q_dedup_simhash_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The companion of ``minhash_eval`` for the SimHash path: MinHash's
    banding is probabilistic (missed pairs are expected and measured),
    but pigeonhole blocking carries a PROOF — with 4 pieces and at most
    3 differing bits, some piece is untouched, so every true pair
    shares a block. This query measures that guarantee instead of
    assuming it: n_missed is computed from the data and hash-verified
    to be the same number (zero) in both engines, alongside the price
    paid (candidate pairs vs true pairs).

    The all-pairs truth join runs on the SIGNATURE table (one bigint
    per doc), not the corpus — at production scale this is the audit-
    sample path: sample doc ids, all-pairs their signatures, never the
    corpus text."""
    sig = simhash_signatures(shingle_sets(spark, sf_dir)).persist()
    # The all-pairs truth join has no equi-key, so Spark would pick
    # BroadcastNestedLoop and broadcast the corpus-sized signature
    # frame; shuffle_replicate_nl is the partitioned cartesian that
    # spills instead (the docstring's audit-sample bound still applies
    # at production scale).
    a = sig.alias("a").hint("shuffle_replicate_nl")
    b = sig.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    truth = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(ham <= MAX_HAMMING)
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )
    found_full = q_dedup_simhash(spark, sf_dir)
    found = found_full.select("doc_a", "doc_b")
    # candidate count: re-derive the blocked pairs pre-verification
    piece_cols = [
        F.concat_ws(
            ":",
            F.lit(str(p)),
            F.shiftright("simhash", p * PIECE_BITS).bitwiseAND(
                F.lit((1 << PIECE_BITS) - 1)
            ),
        )
        for p in range(N_PIECES)
    ]
    pieces = sig.select("doc_id", F.explode(F.array(*piece_cols)).alias("piece"))
    cand = (
        pieces.alias("pa").hint("merge")
        .join(
            pieces.alias("pb"),
            (F.col("pa.piece") == F.col("pb.piece"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id")),
        )
        .select(
            F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # found is corpus-scale verified pairs (post-explode upstream) —
    # same bogus-estimate broadcast hazard; pin sort-merge for the
    # anti-join.
    missed = truth.join(
        found.hint("merge"), ["doc_a", "doc_b"], "left_anti"
    )
    n_truth = truth.agg(F.count("*").cast("long").alias("n_truth"))
    n_found = found.agg(F.count("*").cast("long").alias("n_found"))
    n_missed = missed.agg(F.count("*").cast("long").alias("n_missed"))
    n_cand = cand.agg(F.count("*").cast("long").alias("n_candidates"))
    return (
        n_truth.crossJoin(F.broadcast(n_found))
        .crossJoin(F.broadcast(n_missed))
        .crossJoin(F.broadcast(n_cand))
    )
