"""End-to-end record linkage: blocking -> Fellegi-Sunter weights ->
match threshold -> connected components -> canonical entities.

Round-7 verdict item 7: ``q_er_blocked_match`` (candidate pairs),
``q_er_agreement_patterns`` (Fellegi-Sunter profiling) and
``q_er_canonical_entities`` (CC) existed as three separate queries;
this module chains them into the single deliverable every record-
linkage pipeline (Fellegi-Sunter 1969, Dedupe, Zingg, Splink) ships —
mirroring ``q_pipeline_llm_curation``'s composite pattern:

1. **Blocking** — sorted-neighborhood pairs of part RECORDS within
   p_name blocks: row_number by p_partkey, each record pairs with its
   next ``WINDOW_B`` neighbors through the fully-discriminating
   ``(p_name, rn)`` equi-join. Candidates <= N*B, linear in the fact
   table (never |block|^2; see operators/entityres.py's bound note).
2. **Scoring** — training-free Fellegi-Sunter u-weights: with the
   match-probability term m ~ 1, the log-odds weight of agreement on
   field f reduces to -ln(u_f), u_f = the field's MARGINAL agreement
   rate over all candidates (rare agreements carry more evidence);
   disagreement contributes 0. Weights are the repo's quantized-log
   discipline (functions/text.py TF-IDF): each -ln(u_f) is rounded to
   9 decimals and cast DECIMAL(18,9) in BOTH engines before any
   arithmetic, so the per-pair score (a sum of <= 3 exact decimals) is
   bit-identical cross-engine. The u-rates come from ONE 1-row
   aggregate, broadcast — no second pass.
3. **Decision** — score >= W_MIN (pure decimal compare against a
   decimal literal; at the chosen threshold the nearest pattern score
   sits >= 0.1 away at every tested SF, so the 1-ulp log jitter the
   9-digit quantization absorbs can never flip a decision).
4. **Clustering** — accepted pairs feed the convergence-checked
   hash-min label propagation of ``dedup/clusters.py`` (O(diameter)
   co-partitioned join rounds, O(V) state); one row per entity with
   its canonical (minimum) member key, member count, block name, and
   distinct brand/type counts. Records matching nothing stay out of
   the closure, exactly as in the oracle's recursive CTE.

Scale: stage 1 is bounded by construction, stage 2 adds one broadcast
of a 1-row frame, stage 3 is a filter, stage 4 iterates on the ACCEPTED
edge set (two orders smaller than candidates at every tested SF). The
oracle computes the identical closure with a recursive CTE — fine at
oracle scale; the Spark side is the iteration ladder that scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Sorted-neighborhood window within each name block.
WINDOW_B = 10

#: Match threshold on the summed agreement weights (ln units). Field
#: weights at sf0.01 are ~3.2 (brand), ~1.8 (type), ~3.9 (size):
#: accepted patterns are {brand+type, brand+size, type+size, all three}
#: (scores 5.0-8.9); the best rejected single-field pattern scores
#: ~3.9. Margin to the boundary >= 0.1 at every tested SF.
W_MIN = "4.9"

_QERPIPE_ORACLE = f"""
WITH RECURSIVE recs AS (
  SELECT p_partkey, p_name, p_brand, p_type, p_size,
         row_number() OVER (PARTITION BY p_name ORDER BY p_partkey) AS rn
  FROM part
),
pairs AS (
  SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
         CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END AS brand_eq,
         CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0 END AS type_eq,
         CASE WHEN a.p_size = b.p_size THEN 1 ELSE 0 END AS size_eq
  FROM (SELECT p_name, p_partkey, rn + d.d AS rn_b, p_brand, p_type, p_size
        FROM recs, (SELECT unnest(range(1, {WINDOW_B} + 1)) AS d) d) a
  JOIN recs b ON a.p_name = b.p_name AND a.rn_b = b.rn
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS np,
         CAST(SUM(brand_eq) AS BIGINT) AS nb,
         CAST(SUM(type_eq) AS BIGINT) AS nt,
         CAST(SUM(size_eq) AS BIGINT) AS ns
  FROM pairs
),
weights AS (
  SELECT
    CAST(FLOOR((-LN(CAST(nb AS DOUBLE) / CAST(np AS DOUBLE))) * 1e9 + 0.5) / 1e9
         AS DECIMAL(18,9)) AS wb,
    CAST(FLOOR((-LN(CAST(nt AS DOUBLE) / CAST(np AS DOUBLE))) * 1e9 + 0.5) / 1e9
         AS DECIMAL(18,9)) AS wt,
    CAST(FLOOR((-LN(CAST(ns AS DOUBLE) / CAST(np AS DOUBLE))) * 1e9 + 0.5) / 1e9
         AS DECIMAL(18,9)) AS ws
  FROM tot
),
accepted AS (
  SELECT p.key_a, p.key_b
  FROM pairs p CROSS JOIN weights w
  WHERE p.brand_eq * w.wb + p.type_eq * w.wt + p.size_eq * w.ws
        >= CAST({W_MIN} AS DECIMAL(18,9))
),
edges AS (
  SELECT key_a AS src, key_b AS dst FROM accepted
  UNION
  SELECT key_b, key_a FROM accepted
  UNION
  SELECT key_a, key_a FROM accepted
  UNION
  SELECT key_b, key_b FROM accepted
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
labeled AS (
  SELECT src AS p_partkey, MIN(dst) AS entity_key FROM reach GROUP BY src
)
SELECT CAST(l.entity_key AS BIGINT) AS entity_key,
       ANY_VALUE(r.p_name) AS p_name,
       CAST(COUNT(*) AS BIGINT) AS member_count,
       CAST(COUNT(DISTINCT r.p_brand) AS BIGINT) AS n_brands,
       CAST(COUNT(DISTINCT r.p_type) AS BIGINT) AS n_types
FROM labeled l JOIN recs r ON r.p_partkey = l.p_partkey
GROUP BY l.entity_key
ORDER BY member_count DESC, entity_key
"""


@register(
    "q_er_pipeline",
    oracle=_QERPIPE_ORACLE,
    description=(
        "record linkage end-to-end: sorted-neighborhood blocking "
        f"(N*B={WINDOW_B} candidates) -> training-free Fellegi-Sunter "
        "u-weights (-ln of marginal agreement rates, quantized "
        "DECIMAL(18,9)) -> decimal match threshold -> hash-min "
        "connected components -> one row per canonical entity; "
        "caller contract: persists the blocking-join frame (read by "
        "the returned plan) — long-lived sessions must drain it via "
        "spark.catalog.clearCache() after consuming the result, as "
        "the test/bench fixtures do"
    ),
    tags=(
        "dedup",
        "entity-resolution",
        "pipeline",
        "graph",
        "statistics",
    ),
)
def q_er_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup.clusters import connected_components

    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_name").orderBy("p_partkey")
    recs = p.select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size"
    ).withColumn("rn", F.row_number().over(w))

    probe = recs.select(
        "p_name",
        F.col("p_partkey").alias("key_a"),
        F.col("p_brand").alias("brand_a"),
        F.col("p_type").alias("type_a"),
        F.col("p_size").alias("size_a"),
        F.explode(
            F.sequence(F.col("rn") + 1, F.col("rn") + F.lit(WINDOW_B))
        ).alias("rn_b"),
    )
    pairs = probe.join(
        recs.select(
            "p_name",
            F.col("rn").alias("rn_b"),
            F.col("p_partkey").alias("key_b"),
            F.col("p_brand").alias("brand_b"),
            F.col("p_type").alias("type_b"),
            F.col("p_size").alias("size_b"),
        ),
        ["p_name", "rn_b"],
    ).select(
        "key_a",
        "key_b",
        F.when(F.col("brand_a") == F.col("brand_b"), 1)
        .otherwise(0)
        .alias("brand_eq"),
        F.when(F.col("type_a") == F.col("type_b"), 1)
        .otherwise(0)
        .alias("type_eq"),
        F.when(F.col("size_a") == F.col("size_b"), 1)
        .otherwise(0)
        .alias("size_eq"),
    )
    # The blocking join is the pipeline's largest stage and feeds BOTH
    # the u-weight aggregate and the accepted-pairs filter; without a
    # persist it executes twice (round-9 advice). The first consumer
    # populates the MEMORY_AND_DISK blocks, the second reads them.
    # CALLER CONTRACT (also in the registry description / OPERATORS.md):
    # the returned plan reads these blocks, so they cannot unpersist
    # here — long-lived sessions drain them via catalog.clearCache()
    # after consuming the result, as the test/bench fixtures do.
    pairs = pairs.persist()

    def _w(n_col: str):
        return (F.floor((-F.log(F.col(n_col).cast("double") / F.col("np").cast("double"))) * 1e9 + 0.5) / 1e9).cast("decimal(18,9)")

    weights = pairs.agg(
        F.count("*").cast("long").alias("np"),
        F.sum("brand_eq").cast("long").alias("nb"),
        F.sum("type_eq").cast("long").alias("nt"),
        F.sum("size_eq").cast("long").alias("ns"),
    ).select(_w("nb").alias("wb"), _w("nt").alias("wt"), _w("ns").alias("ws"))

    score = (
        F.col("brand_eq") * F.col("wb")
        + F.col("type_eq") * F.col("wt")
        + F.col("size_eq") * F.col("ws")
    )
    accepted = (
        pairs.crossJoin(F.broadcast(weights))
        .filter(score >= F.lit(W_MIN).cast("decimal(18,9)"))
        .select("key_a", "key_b")
    )

    labels = connected_components(accepted, a="key_a", b="key_b")
    return (
        labels.select(
            F.col("doc_id").alias("p_partkey"),
            F.col("cluster_id").alias("entity_key"),
        )
        .join(recs.select("p_partkey", "p_name", "p_brand", "p_type"), "p_partkey")
        .groupBy("entity_key")
        .agg(
            F.any_value("p_name").alias("p_name"),
            F.count("*").cast("long").alias("member_count"),
            F.count_distinct("p_brand").cast("long").alias("n_brands"),
            F.count_distinct("p_type").cast("long").alias("n_types"),
        )
        .select(
            F.col("entity_key").cast("long").alias("entity_key"),
            "p_name",
            "member_count",
            "n_brands",
            "n_types",
        )
        .orderBy(F.desc("member_count"), "entity_key")
    )
