"""TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
the word co-occurrence graph.

The graph-based keyword extractor: content words are nodes, adjacency
within a document (after the content-word filter, window 1) is an
undirected edge, and ten damped power iterations rank the vocabulary.
Re-uses the engine's exact-replay PageRank discipline
(``operators/graph.py``): a FIXED iteration count is deterministic
float math, the DuckDB oracle replays the identical ten iterations as
unrolled chained CTEs, and accumulated cross-engine divergence
(summation order, last ulps) sits ~1e-13 relative — eleven orders of
magnitude inside the FLOOR(() * 1e4 + 0.5) / 1e4 the gate hashes.

Content-word filter: length >= 4 (the cheap deterministic stand-in for
a POS filter). Adjacency is taken in the FILTERED sequence (positions
re-indexed after the filter), per the TextRank paper's setup.

Scale: vocabulary graphs are small relative to the corpus (nodes =
distinct content words), so after the one corpus-wide pass that builds
DISTINCT edges, iteration state is O(vocabulary) — the corpus itself
is never touched again. Edge building is the only corpus-scale stage:
posexplode + window lead, shuffled by doc_id once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

DAMPING = 0.85
N_ITERS = 10
MIN_LEN = 4
TOP_WORDS = 20


def _textrank_oracle() -> str:
    body = f"""
WITH toks AS (
  SELECT doc_id, p.pos, arr[p.pos] AS tok
  FROM (
    SELECT doc_id,
           list_filter(string_split(lower(text), ' '),
                       x -> length(x) >= {MIN_LEN}) AS arr
    FROM documents
  ),
  LATERAL (SELECT unnest(range(1, len(arr) + 1)) AS pos) p
),
adj AS (
  SELECT DISTINCT t.tok AS a, u.tok AS b
  FROM toks t JOIN toks u
    ON t.doc_id = u.doc_id AND u.pos = t.pos + 1 AND t.tok <> u.tok
),
edges AS (
  SELECT a AS src, b AS dst FROM adj
  UNION
  SELECT b AS src, a AS dst FROM adj
),
outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
pr0 AS (SELECT node, 1.0 AS rank FROM nodes)"""
    prev = "pr0"
    iters = []
    for i in range(1, N_ITERS + 1):
        iters.append(f""",
pr{i} AS (
  SELECT n.node,
         {1 - DAMPING} + {DAMPING} * COALESCE(c.contrib, 0.0) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM({prev}.rank / d.deg) AS contrib
    FROM edges e
    JOIN {prev} ON e.src = {prev}.node
    JOIN outdeg d ON e.src = d.src
    GROUP BY e.dst
  ) c ON n.node = c.node
)""")
        prev = f"pr{i}"
    return (
        body
        + "".join(iters)
        + f"""
SELECT word, score, CAST(rk AS INTEGER) AS rk FROM (
  SELECT node AS word, FLOOR((rank) * 1e4 + 0.5) / 1e4 AS score,
         row_number() OVER (ORDER BY FLOOR((rank) * 1e4 + 0.5) / 1e4 DESC, node) AS rk
  FROM {prev}
) WHERE rk <= {TOP_WORDS}
"""
    )


@register(
    "q_text_textrank_keywords",
    oracle=_textrank_oracle(),
    description=(
        f"TextRank keywords: {N_ITERS} damped power iterations over the "
        f"content-word (len>={MIN_LEN}) co-occurrence graph, top "
        f"{TOP_WORDS} by rounded score — iteration state is O(vocab), "
        "the corpus is read once to build distinct edges"
    ),
    tags=("text", "textrank", "keywords", "graph", "iterative", "llm-pipeline"),
)
def q_text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    arr = F.filter(
        F.split(F.lower(F.col("text")), " "),
        lambda x: F.length(x) >= MIN_LEN,
    )
    toks = d.select("doc_id", F.posexplode(arr).alias("pos0", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos0")
    adj = (
        toks.withColumn("nxt", F.lead("tok").over(w))
        .filter(F.col("nxt").isNotNull() & (F.col("tok") != F.col("nxt")))
        .select(F.col("tok").alias("a"), F.col("nxt").alias("b"))
        .distinct()
    )
    edges = (
        adj.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(adj.select(F.col("b"), F.col("a")))
        .distinct()
        # Eager localCheckpoint, not persist: vocabulary state is TINY
        # (distinct content words), so materialization is free while the
        # lineage cut collapses the 10-iteration plan depth — measured
        # 3x same-JVM (3.6 s vs 10.7 s at sf0.1, identical output). The
        # OPPOSITE call from operators/graph.py's PageRank, whose
        # per-node state is large and whose lazy unroll measured faster;
        # the deciding variable is state size vs plan-compile overhead.
        .localCheckpoint(eager=True)
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges_deg = edges.join(outdeg, "src").localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0))
    for i in range(N_ITERS):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        ranks = nodes.join(
            contrib, nodes.node == contrib.dst, "left"
        ).select(
            "node",
            (
                F.lit(1 - DAMPING)
                + F.lit(DAMPING) * F.coalesce("contrib", F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % 2 == 0 and i < N_ITERS - 1:
            ranks = ranks.localCheckpoint(eager=True)
    wr = Window.orderBy(F.desc("score"), F.asc("word"))
    return (
        ranks.select(
            F.col("node").alias("word"), (F.floor((F.col("rank")) * 1e4 + 0.5) / 1e4).alias("score")
        )
        .withColumn("rk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rk") <= TOP_WORDS)
    )
