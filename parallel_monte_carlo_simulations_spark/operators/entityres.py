"""Entity resolution: multi-pass blocking + edit-distance verification.

The canonical record-linkage shape (Fellegi-Sunter pipelines, Dedupe,
Zingg all reduce to it): never compare all pairs — generate CANDIDATE
pairs from cheap blocking keys, then run the expensive verifier only on
candidates. Here: product-catalog reconciliation over part names with
two blocking passes (first token, second token), unioned and deduped,
verified with Levenshtein <= threshold.

Scale design, in order of leverage:

1. **Dedupe to distinct values first.** Matching runs on DISTINCT names
   weighted by their row counts, never on the row table — at 100 TB the
   distinct-name table is orders of magnitude smaller than the fact
   table, and the resolved pairs join back by equality.
2. **Blocking bounds the pair space.** Each pass is a hash equi-join on
   its blocking key, so candidates are sum over blocks of |block|^2
   instead of N^2 (here 448 of 2016 possible pairs). More passes raise
   recall at linear candidate cost; a hot blocking key is a skew key
   and gets salted or length-capped like any other join key.
3. **The verifier sees candidates only.** Levenshtein is the expensive
   step; it runs on the blocked pairs, JVM-side (built-in function, no
   Python).

Both engines spell ``split_part`` and ``levenshtein`` identically with
identical semantics, so the oracle is the same algorithm verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Maximum edit distance for a verified match.
MAX_DIST = 3

_QER_ORACLE = f"""
WITH names AS (
  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM part GROUP BY p_name
),
cand AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b
  FROM names a JOIN names b
    ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
   AND a.p_name < b.p_name
  UNION
  SELECT a.p_name, b.p_name
  FROM names a JOIN names b
    ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
   AND a.p_name < b.p_name
)
SELECT c.name_a, c.name_b,
       CAST(levenshtein(c.name_a, c.name_b) AS BIGINT) AS dist,
       na.n_parts AS n_parts_a,
       nb.n_parts AS n_parts_b
FROM cand c
JOIN names na ON na.p_name = c.name_a
JOIN names nb ON nb.p_name = c.name_b
WHERE levenshtein(c.name_a, c.name_b) <= {MAX_DIST}
ORDER BY dist, name_a, name_b
"""


@register(
    "q_er_blocked_match",
    oracle=_QER_ORACLE,
    description=(
        "entity resolution: two-pass token blocking over distinct part "
        f"names + Levenshtein<={MAX_DIST} verification — candidate "
        "generation instead of all-pairs, match on distinct values "
        "weighted by row counts"
    ),
    tags=("dedup", "entity-resolution", "blocking", "join", "text"),
)
def q_er_blocked_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(F.count("*").alias("n_parts"))
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))

    def _pass(token_idx: int) -> DataFrame:
        return a.join(
            b,
            (
                F.split_part(F.col("name_a"), F.lit(" "), F.lit(token_idx))
                == F.split_part(F.col("name_b"), F.lit(" "), F.lit(token_idx))
            )
            & (F.col("name_a") < F.col("name_b")),
        )

    # UNION (not UNION ALL): a pair found by both passes is one candidate
    cand = _pass(1).union(_pass(2)).distinct()
    verified = cand.withColumn(
        "dist", F.levenshtein("name_a", "name_b").cast("long")
    ).filter(F.col("dist") <= MAX_DIST)
    return (
        verified.join(
            names.select(
                F.col("p_name").alias("name_a"),
                F.col("n_parts").alias("n_parts_a"),
            ),
            "name_a",
        )
        .join(
            names.select(
                F.col("p_name").alias("name_b"),
                F.col("n_parts").alias("n_parts_b"),
            ),
            "name_b",
        )
        .select("name_a", "name_b", "dist", "n_parts_a", "n_parts_b")
        .orderBy("dist", "name_a", "name_b")
    )
