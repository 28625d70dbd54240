"""pyspark.ml MinHashLSH variant of near-dup detection.

The engine's primary MinHash path (:mod:`.minhash`) is hand-rolled with
portable hashing so DuckDB can oracle it; this variant covers the
``pyspark.ml.feature`` API surface (HashingTF -> MinHashLSH ->
approxSimilarityJoin) — the stock route a Spark user would reach for.
Registered rows-only (ml's hash seeds are engine-internal); the property
test checks its pairs agree with the exact-Jaccard verifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

JACCARD_DISTANCE_MAX = 0.5  # distance = 1 - jaccard


@register(
    "q_dedup_ml_minhash",
    oracle=None,  # ml-internal hash seeds: not cross-engine reproducible
    description="pyspark.ml MinHashLSH approxSimilarityJoin near-dup pairs",
    tags=("dedup", "minhash", "ml"),
)
def q_dedup_ml_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("tokens"))
    tf = HashingTF(
        inputCol="tokens", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feats = tf.transform(toks)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, JACCARD_DISTANCE_MAX, distCol="jaccard_dist"
    )
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            (F.floor((F.col("jaccard_dist")) * 1e4 + 0.5) / 1e4).alias("jaccard_dist"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
