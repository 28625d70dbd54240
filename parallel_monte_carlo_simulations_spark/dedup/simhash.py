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
    a = pieces.alias("a")
    b = pieces.alias("b")
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
