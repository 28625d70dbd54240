"""Entity resolution: sorted-neighborhood blocking + edit-distance verify.

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
2. **Sorted-neighborhood blocking bounds the pair space at N*B.** A
   plain token block is NOT bounded here: TPC-H part-name tokens draw
   from ~92 colors, so block size grows with N and a token-only
   equi-join yields ~N^2/92 candidates — quadratic with a constant
   discount. Instead, each block orders its names (row_number) and
   pairs each name only with its next ``WINDOW_B`` neighbors in sort
   order. Crucially the pairing is an EQUI-join on the composite key
   ``(block_key, rn)`` against exploded ``(block_key, rn + d)``,
   d in 1..B — the join key is fully discriminating, so the shuffle
   join emits exactly the N*B neighbor pairs and never scans the
   |block|^2 cross product. Candidates grow linearly in N per pass.
3. **The verifier sees candidates only.** Levenshtein is the expensive
   step; it runs on the blocked pairs, JVM-side (built-in function, no
   Python).

Recall honesty: sorted-neighborhood trades recall for the linear bound
— a true match whose names sort > B apart inside a block is missed.
Both engines spell ``split_part``, ``row_number`` and ``levenshtein``
identically, so the oracle is the same algorithm verbatim. Empty
blocking keys (names with fewer tokens than the pass index) are
excluded in both engines — an empty-string key would be one mega-block.

``q_er_canonical_entities`` composes the verified pairs into canonical
entities via hash-min connected components (the same iterative
label-propagation used by ``dedup/clusters.py``) and emits the standard
record-linkage deliverable: one row per entity with its canonical
(minimum) name, member count, and total underlying part rows. The
oracle computes the same closure with a recursive CTE — fine at oracle
scale; the Spark side is the iterative O(diameter) join ladder that
scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Maximum edit distance for a verified match.
MAX_DIST = 3

#: Sorted-neighborhood window: each name pairs with its next B
#: neighbors (by name order) inside its block. Candidates <= N*B/pass.
WINDOW_B = 10

_QER_ORACLE = f"""
WITH names AS (
  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM part GROUP BY p_name
),
blk1 AS (
  SELECT p_name, split_part(p_name, ' ', 1) AS key,
         row_number() OVER (PARTITION BY split_part(p_name, ' ', 1)
                            ORDER BY p_name) AS rn
  FROM names WHERE split_part(p_name, ' ', 1) <> ''
),
blk2 AS (
  SELECT p_name, split_part(p_name, ' ', 2) AS key,
         row_number() OVER (PARTITION BY split_part(p_name, ' ', 2)
                            ORDER BY p_name) AS rn
  FROM names WHERE split_part(p_name, ' ', 2) <> ''
),
cand AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b
  FROM (SELECT p_name, key, rn + d.d AS rn_b
        FROM blk1, (SELECT unnest(range(1, {WINDOW_B} + 1)) AS d) d) a
  JOIN blk1 b ON a.key = b.key AND a.rn_b = b.rn
  UNION
  SELECT a.p_name, b.p_name
  FROM (SELECT p_name, key, rn + d.d AS rn_b
        FROM blk2, (SELECT unnest(range(1, {WINDOW_B} + 1)) AS d) d) a
  JOIN blk2 b ON a.key = b.key AND a.rn_b = b.rn
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


def _distinct_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.groupBy("p_name").agg(F.count("*").alias("n_parts"))


def _neighbor_pairs(names: DataFrame, token_idx: int) -> DataFrame:
    """Sorted-neighborhood candidate pairs for one blocking pass.

    Equi-join on (key, rn) vs exploded (key, rn+d): emits exactly the
    <= N*WINDOW_B neighbor pairs. rn is ordered by name, so a.rn < b.rn
    implies name_a < name_b — pairs arrive canonically ordered.
    """
    key = F.split_part(F.col("p_name"), F.lit(" "), F.lit(token_idx))
    w = Window.partitionBy("key").orderBy("p_name")
    blk = (
        names.select("p_name", key.alias("key"))
        .filter(F.col("key") != "")
        .withColumn("rn", F.row_number().over(w))
    )
    probe = blk.select(
        F.col("p_name").alias("name_a"),
        "key",
        F.explode(
            F.sequence(F.col("rn") + 1, F.col("rn") + F.lit(WINDOW_B))
        ).alias("rn_b"),
    )
    return probe.join(
        blk.select(F.col("p_name").alias("name_b"), "key", F.col("rn").alias("rn_b")),
        ["key", "rn_b"],
    ).select("name_a", "name_b")


def _verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = _distinct_names(spark, sf_dir)
    # UNION (not UNION ALL): a pair found by both passes is one candidate
    cand = _neighbor_pairs(names, 1).union(_neighbor_pairs(names, 2)).distinct()
    return cand.withColumn(
        "dist", F.levenshtein("name_a", "name_b").cast("long")
    ).filter(F.col("dist") <= MAX_DIST)


@register(
    "q_er_blocked_match",
    oracle=_QER_ORACLE,
    description=(
        "entity resolution: two-pass sorted-neighborhood blocking over "
        f"distinct part names (token block, window B={WINDOW_B}) + "
        f"Levenshtein<={MAX_DIST} verification — candidates bounded at "
        "N*B per pass via a fully-discriminating (key, rn) equi-join, "
        "never the |block|^2 cross product"
    ),
    tags=("dedup", "entity-resolution", "blocking", "join", "text"),
)
def q_er_blocked_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = _distinct_names(spark, sf_dir)
    verified = _verified_pairs(spark, sf_dir)
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


_QER_ENTITIES_ORACLE = f"""
WITH RECURSIVE names AS (
  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM part GROUP BY p_name
),
blk1 AS (
  SELECT p_name, split_part(p_name, ' ', 1) AS key,
         row_number() OVER (PARTITION BY split_part(p_name, ' ', 1)
                            ORDER BY p_name) AS rn
  FROM names WHERE split_part(p_name, ' ', 1) <> ''
),
blk2 AS (
  SELECT p_name, split_part(p_name, ' ', 2) AS key,
         row_number() OVER (PARTITION BY split_part(p_name, ' ', 2)
                            ORDER BY p_name) AS rn
  FROM names WHERE split_part(p_name, ' ', 2) <> ''
),
cand AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b
  FROM (SELECT p_name, key, rn + d.d AS rn_b
        FROM blk1, (SELECT unnest(range(1, {WINDOW_B} + 1)) AS d) d) a
  JOIN blk1 b ON a.key = b.key AND a.rn_b = b.rn
  UNION
  SELECT a.p_name, b.p_name
  FROM (SELECT p_name, key, rn + d.d AS rn_b
        FROM blk2, (SELECT unnest(range(1, {WINDOW_B} + 1)) AS d) d) a
  JOIN blk2 b ON a.key = b.key AND a.rn_b = b.rn
),
matched AS (
  SELECT name_a, name_b FROM cand
  WHERE levenshtein(name_a, name_b) <= {MAX_DIST}
),
edges AS (
  SELECT name_a AS src, name_b AS dst FROM matched
  UNION
  SELECT name_b, name_a FROM matched
  UNION
  SELECT name_a, name_a FROM matched
  UNION
  SELECT name_b, name_b FROM matched
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
labeled AS (
  SELECT src AS p_name, MIN(dst) AS canonical_name FROM reach GROUP BY src
)
SELECT l.canonical_name,
       CAST(COUNT(*) AS BIGINT) AS member_count,
       CAST(SUM(n.n_parts) AS BIGINT) AS total_parts
FROM labeled l JOIN names n ON n.p_name = l.p_name
GROUP BY l.canonical_name
ORDER BY member_count DESC, canonical_name
"""


@register(
    "q_er_canonical_entities",
    oracle=_QER_ENTITIES_ORACLE,
    description=(
        "entity resolution end-to-end: verified match pairs -> hash-min "
        "connected components -> one row per canonical entity "
        "(canonical = minimum member name) with member count and total "
        "underlying part rows"
    ),
    tags=("dedup", "entity-resolution", "graph", "connected-components"),
)
def q_er_canonical_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup.clusters import connected_components

    names = _distinct_names(spark, sf_dir)
    matched = _verified_pairs(spark, sf_dir).select("name_a", "name_b")

    # Reuse the convergence-checked hash-min label propagation from
    # dedup/clusters.py (O(diameter) co-partitioned join rounds, O(V)
    # state, stops when no label moves). Names matching nothing never
    # enter the closure, same as the oracle's FROM matched.
    labels = connected_components(matched, a="name_a", b="name_b")
    return (
        labels.select(
            F.col("doc_id").alias("p_name"),
            F.col("cluster_id").alias("canonical_name"),
        )
        .join(names, "p_name")
        .groupBy("canonical_name")
        .agg(
            F.count("*").cast("long").alias("member_count"),
            F.sum("n_parts").alias("total_parts"),
        )
        .orderBy(F.desc("member_count"), "canonical_name")
    )
