"""Duplicate clustering: connected components over the near-dup pair
graph (hash-min label propagation).

After candidate pairs (MinHash) are verified, dedup needs CLUSTERS —
"keep one doc per component" — not pairs. Components come from iterative
hash-min propagation: every node starts labeled with itself; each round
every node takes the min label among itself and its neighbors; stop at
fixpoint. This is the standard scalable formulation (each round = one
join + one aggregate, both shuffling on node id; rounds ~ O(log diameter),
and near-dup components are tiny, so 2-4 rounds in practice).

The driver-side convergence loop is legitimate iterative control flow —
the per-round work is fully distributed. The DuckDB oracle computes the
same components with a recursive CTE, so even the iterative algorithm is
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.microunit import rdiv_halfup_duck, rdiv_halfup_expr
from ..registry import register
from .minhash import q_dedup_minhash_lsh  # reuse the verified pair logic

MAX_ROUNDS = 20


def _release_local_checkpoint(df: DataFrame) -> None:
    """Release the RDD blocks behind a localCheckpointed DataFrame.

    ``Dataset.unpersist`` routes through the SQL cache manager, which
    never sees localCheckpoint blocks (they are RDD-level persisted),
    so ``df.unpersist()`` was a silent no-op here (round-9 advice) —
    the r7 "per-round block release" never actually happened. The
    blocks live on the internal RDD held by the checkpointed plan's
    ``LogicalRDD`` leaf; reach it through the analyzed plan and
    unpersist there. Best-effort by design: if the plan shape ever
    changes, blocks fall back to LRU eviction (MEMORY_AND_DISK)
    rather than failing the query. tests/test_hardening.py asserts
    the release is real via getRDDStorageInfo.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass


def connected_components(pairs: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """Hash-min label propagation; returns (doc_id, cluster_id) for every
    node that appears in a pair."""
    spark = pairs.sparkSession
    # localCheckpoint (eager) instead of persist: it caches the data AND
    # TRUNCATES THE LOGICAL PLAN. With plain persist, every round's plan
    # embeds all previous rounds' trees plus the whole upstream
    # pair-generation pipeline — execution is cached but per-round
    # ANALYSIS walks the growing tree (measured on the entity-resolution
    # consumer: round times 1.2 s -> 5.5 s over 5 rounds, ~13 s total;
    # checkpointed: flat rounds). Same lineage-cut lesson as
    # similarity/ivf.det_centroids.
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(MAX_ROUNDS):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
        )
        # The eager checkpoint materializes the round; the max(chg)
        # aggregate is then a cheap job over the checkpointed blocks and
        # answers "did anything move" without re-executing the round.
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("nlbl", F.col("lbl"))).alias("lbl"),
                F.when(F.col("nlbl") < F.col("lbl"), 1).otherwise(0).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.agg(F.max("chg")).first()[0] or 0
        # new_labels is materialized (eager checkpoint) and no longer
        # reads the previous round's blocks — release them now, or every
        # round's non-replicated localCheckpoint RDD stays resident
        # until driver GC (r7 advice; the release itself fixed in r9 —
        # Dataset.unpersist was a no-op for checkpoint blocks).
        # Trade-off, documented: an executor loss mid-iteration loses
        # checkpointed blocks with no lineage to recompute from and
        # fails the query — acceptable for a bounded MAX_ROUNDS batch
        # job; a resumable variant would use reliable checkpoint() to a
        # cluster FS instead.
        _release_local_checkpoint(labels)
        labels = new_labels
        if changed == 0:
            break
    else:
        # Fail loudly instead of returning non-converged (WRONG) labels:
        # a component whose hop-diameter exceeds MAX_ROUNDS would get a
        # silently split cluster, and consumers like the ER pipeline
        # build sorted-neighborhood chains whose diameter grows with
        # block size (round-9 advice). Release the live checkpoint
        # blocks BEFORE raising — the error path is exactly when
        # MAX_ROUNDS of them have accumulated (round-10 advice).
        _release_local_checkpoint(labels)
        _release_local_checkpoint(edges)
        raise RuntimeError(
            f"connected_components did not converge in {MAX_ROUNDS} "
            "hash-min rounds: a component's hop-diameter exceeds the "
            "round budget; raise MAX_ROUNDS or pre-contract long "
            "chains (labels at this point would be wrong, not "
            "approximate)"
        )
    # The returned plan reads only the final checkpointed labels; the
    # edge blocks are no longer reachable from it — release them too.
    _release_local_checkpoint(edges)
    return labels.select(F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id"))


def _oracle_sql() -> str:
    from .minhash import _QMINHASH_ORACLE

    inner = _QMINHASH_ORACLE.strip().rstrip(";")
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({inner}) mh
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
nodes AS (
  SELECT DISTINCT a AS node FROM edges
),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON r.node = e.a
)
SELECT node AS doc_id, MIN(lbl) AS cluster_id
FROM reach GROUP BY node
"""


@register(
    "q_dedup_connected_components",
    oracle=_oracle_sql(),
    description="iterative hash-min connected components over MinHash pairs",
    tags=("dedup", "clustering", "iterative", "graph"),
)
def q_dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = q_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs)


def _canonical_oracle() -> str:
    from ..functions.pipeline import _EN_SW_SQL
    from .minhash import _QMINHASH_ORACLE

    inner = _QMINHASH_ORACLE.strip().rstrip(";")
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({inner}) mh
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
nodes AS (
  SELECT DISTINCT a AS node FROM edges
),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON r.node = e.a
),
comp AS (
  SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
),
scored AS (
  SELECT doc_id,
    FLOOR((0.4 * LEAST(length(text) / 500.0, 1.0)
      + 0.4 * (len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')))
      + 0.2 * LEAST(len(list_filter(string_split(text, ' '),
                                    t -> t IN {_EN_SW_SQL})) * 5.0
                    / len(string_split(text, ' ')), 1.0)) * 1e6 + 0.5) / 1e6 AS quality
  FROM documents
),
ranked AS (
  SELECT c.cluster_id, c.doc_id, s.quality,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY s.quality DESC, c.doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members
  FROM comp c JOIN scored s ON c.doc_id = s.doc_id
)
SELECT cluster_id,
       doc_id AS canonical_doc,
       CAST(n_members AS BIGINT) AS n_members,
       quality AS best_quality
FROM ranked WHERE rk = 1
"""


@register(
    "q_dedup_canonical",
    oracle=_canonical_oracle(),
    description=(
        "canonical representative per near-dup cluster: highest-quality "
        "member (doc_id tie-break) with cluster size"
    ),
    tags=("dedup", "clustering", "canonical", "curation", "composition"),
)
def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-decision that follows clustering: instead of 'keep the
    lowest doc_id', keep each component's HIGHEST-QUALITY member (the
    curation-grade policy — rounded quality score, doc_id tie-break for
    determinism). Composes three verified blocks — MinHash pairs,
    hash-min components, quality scoring — into one plan: component
    labels join the scored docs, a per-cluster window picks the
    representative. Cluster count is tiny relative to the corpus, so
    the window shuffle is on near-dup members only."""
    from pyspark.sql import Window

    from ..functions.pipeline import QUALITY_MIN  # noqa: F401  (same module family)
    from ..functions.text import STOPWORDS, _stopword_count, _tokens
    from ..tables import table

    comp = q_dedup_connected_components(spark, sf_dir)
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    n = F.size(toks)
    quality = (F.floor((0.4 * F.least(F.length("text") / 500.0, F.lit(1.0))
        + 0.4 * (F.size(F.array_distinct(toks)) / n)
        + 0.2 * F.least(_stopword_count(toks, STOPWORDS["en"]) / n * 5.0, F.lit(1.0))) * 1e6 + 0.5) / 1e6)
    scored = d.select("doc_id", quality.alias("quality"))
    members = comp.join(scored, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), "doc_id")
    wc = Window.partitionBy("cluster_id")
    return (
        members.withColumn("rk", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(wc))
        .filter(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("canonical_doc"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("quality").alias("best_quality"),
        )
    )


def _histogram_oracle() -> str:
    from .minhash import _QMINHASH_ORACLE

    inner = _QMINHASH_ORACLE.strip().rstrip(";")
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({inner}) mh
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
nodes AS (
  SELECT DISTINCT a AS node FROM edges
),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON r.node = e.a
),
comp AS (
  SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
),
sizes AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
  FROM comp GROUP BY cluster_id
),
total_docs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS corpus_docs FROM documents
)
SELECT s.n_members AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(s.n_members) AS BIGINT) AS docs_in_bucket,
       CAST(SUM(s.n_members - 1) AS BIGINT) AS removable_docs,
       {rdiv_halfup_duck("SUM(s.n_members)", "ANY_VALUE(t.corpus_docs)", 6)}
         AS corpus_frac
FROM sizes s CROSS JOIN total_docs t
GROUP BY s.n_members
ORDER BY cluster_size
"""


@register(
    "q_dedup_cluster_size_histogram",
    oracle=_histogram_oracle(),
    description=(
        "near-dup cluster-size distribution with removable-doc counts "
        "and corpus fractions — the dedup REPORT a curation run ships: "
        "how much of the corpus sits in duplicate clusters of each "
        "size, and how many docs keep-one-per-cluster would remove"
    ),
    tags=("dedup", "clustering", "diagnostics", "curation"),
)
def q_dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes the MinHash pair graph and hash-min components into the
    histogram every dedup report leads with. The heavy lifting is the
    already-verified pair+CC path; this adds two tiny aggregates over
    cluster labels (cluster count << corpus)."""
    from ..tables import table

    comp = q_dedup_connected_components(spark, sf_dir)
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    total = table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("long").alias("corpus_docs")
    )
    return (
        sizes.groupBy(F.col("n_members").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("n_members").cast("long").alias("docs_in_bucket"),
            F.sum(F.col("n_members") - 1).cast("long").alias(
                "removable_docs"
            ),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "cluster_size",
            "n_clusters",
            "docs_in_bucket",
            "removable_docs",
            rdiv_halfup_expr("docs_in_bucket", "corpus_docs", 6).alias(
                "corpus_frac"
            ),
        )
        .orderBy("cluster_size")
    )


def _leakage_oracle() -> str:
    from .minhash import _QMINHASH_ORACLE

    inner = _QMINHASH_ORACLE.strip().rstrip(";")
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({inner}) mh
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON r.node = e.a
),
comp AS (
  SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
),
splits AS (
  SELECT doc_id,
         CASE WHEN b < 900 THEN 'train'
              WHEN b < 950 THEN 'val' ELSE 'test' END AS split
  FROM (
    SELECT doc_id,
           ('0x' || substr(md5(doc_id::VARCHAR || ':7'), 1, 8))::BIGINT
             % 1000 AS b
    FROM documents
  )
),
per AS (
  SELECT c.cluster_id, s.split, CAST(COUNT(*) AS BIGINT) AS n
  FROM comp c JOIN splits s ON c.doc_id = s.doc_id
  GROUP BY c.cluster_id, s.split
)
SELECT a.split AS split_a, b.split AS split_b,
       CAST(COUNT(*) AS BIGINT) AS leaky_clusters,
       CAST(SUM(a.n) AS BIGINT) AS docs_in_a,
       CAST(SUM(b.n) AS BIGINT) AS docs_in_b
FROM per a JOIN per b
  ON a.cluster_id = b.cluster_id AND a.split < b.split
GROUP BY a.split, b.split
ORDER BY split_a, split_b
"""


@register(
    "q_split_leakage_audit",
    oracle=_leakage_oracle(),
    description=(
        "eval-contamination audit: near-duplicate clusters straddling "
        "the deterministic 90/5/5 train/val/test split — per split "
        "pair, how many duplicate clusters leak across it and how many "
        "documents sit on each side; the pre-eval check every serious "
        "pretraining pipeline runs"
    ),
    tags=("dedup", "curation", "split", "audit", "llm-pipeline"),
)
def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes the verified MinHash+CC cluster labels with the
    verified md5 split buckets. Per-(cluster, split) counts first, then
    a self-join ON cluster_id with split_a < split_b — bounded at <= 3
    rows per cluster, so the pairing stage is cluster-count-sized
    regardless of corpus scale."""
    from ..functions.datasetops import _split_bucket
    from ..tables import table

    comp = q_dedup_connected_components(spark, sf_dir)
    splits = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(_split_bucket("doc_id") < 900, "train")
        .when(_split_bucket("doc_id") < 950, "val")
        .otherwise("test")
        .alias("split"),
    )
    per = (
        comp.join(splits, "doc_id")
        .groupBy("cluster_id", "split")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    a = per.select(
        "cluster_id",
        F.col("split").alias("split_a"),
        F.col("n").alias("n_a"),
    )
    b = per.select(
        F.col("cluster_id").alias("cid_b"),
        F.col("split").alias("split_b"),
        F.col("n").alias("n_b"),
    )
    return (
        a.join(
            b,
            (F.col("cluster_id") == F.col("cid_b"))
            & (F.col("split_a") < F.col("split_b")),
        )
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("leaky_clusters"),
            F.sum("n_a").cast("long").alias("docs_in_a"),
            F.sum("n_b").cast("long").alias("docs_in_b"),
        )
        .orderBy("split_a", "split_b")
    )
