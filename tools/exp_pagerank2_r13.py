#!/usr/bin/env python
"""A/B experiment: PageRank edge-build exchange reduction (r13 round 2).

The registered query's setup pays several edge-scale exchanges:
``edges.join(outdeg, "src")`` shuffles both sides by src at the static
shuffle-partition count, then ``repartition(p, "src")`` re-exchanges
the joined frame to P, and ``nodes`` runs a separate distinct over the
full edge set plus its own repartition.

Variant B restructures the build around ONE edge exchange:
  edges_p   = edges.repartition(p, "src").persist() + count
  outdeg    = edges_p.groupBy(src).count()      -- zero-exchange agg
  edges_deg = edges_p.join(outdeg, "src")       -- zero-exchange join
  nodes     = outdeg.select(src as node)        -- outdeg IS the
              distinct node set (one row per src; both edge directions
              are materialized so every node appears as a src), already
              hash(src, P)-partitioned — the whole nodes-distinct
              subtree disappears
edges_p is unpersisted once edges_deg and nodes are materialized.
Iterations are unchanged. Output asserted cell-identical to variant A
before timing. Usage: python tools/exp_pagerank2_r13.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

DAMPING = 0.85
N_ITERS = 10
_PART_OFFSET = 1_000_000


def _iterate(nodes, edges_deg, p):
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(N_ITERS):
        contrib = (
            edges_deg.join(
                ranks.hint("shuffle_hash"), edges_deg.src == ranks.node
            )
            .repartition(p, "dst")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        ranks = nodes.join(
            contrib.hint("shuffle_hash"), nodes.node == contrib.dst, "left"
        ).select(
            "node",
            (
                F.lit(1 - DAMPING)
                + F.lit(DAMPING) * F.coalesce("contrib", F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select(
        "node", (F.floor((F.col("rank")) * 1e4 + 0.5) / 1e4).alias("rank")
    )


def variant_a(spark, sf_dir) -> DataFrame:
    """The PRE-restructure build (round-1 form), inlined so the script
    stays a faithful baseline regardless of the registered code."""
    from parallel_monte_carlo_simulations_spark.tables import (
        adaptive_partitions,
        table,
    )

    l = table(spark, sf_dir, "lineitem")
    pairs = (
        l.select(
            F.col("l_suppkey").alias("s"),
            (F.col("l_partkey") + _PART_OFFSET).alias("p"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("s").alias("src"), F.col("p").alias("dst"))
        .unionByName(
            pairs.select(F.col("p").alias("src"), F.col("s").alias("dst"))
        )
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    p = adaptive_partitions(spark, sf_dir)
    edges_deg = edges.join(outdeg, "src").repartition(p, "src").persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .repartition(p, "node")
        .persist()
    )
    edges_deg.count()
    nodes.count()
    return _iterate(nodes, edges_deg, p)


def _build(spark, sf_dir, repartition_caches: bool):
    from parallel_monte_carlo_simulations_spark.tables import (
        adaptive_partitions,
        table,
    )

    l = table(spark, sf_dir, "lineitem")
    pairs = (
        l.select(
            F.col("l_suppkey").alias("s"),
            (F.col("l_partkey") + _PART_OFFSET).alias("p"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("s").alias("src"), F.col("p").alias("dst"))
        .unionByName(
            pairs.select(F.col("p").alias("src"), F.col("s").alias("dst"))
        )
    )
    p = adaptive_partitions(spark, sf_dir)
    edges_p = edges.repartition(p, "src").persist()
    edges_p.count()
    outdeg = edges_p.groupBy("src").agg(F.count("*").alias("deg"))
    edges_deg = edges_p.join(outdeg.hint("shuffle_hash"), "src")
    nodes = outdeg.select(F.col("src").alias("node"))
    if repartition_caches:
        # an AQE-cached plan only exposes its output partitioning when
        # the build ends in a user repartition — without this the
        # per-iteration joins re-exchange both cached inputs
        edges_deg = edges_deg.repartition(p, "src")
        nodes = nodes.repartition(p, "node")
    edges_deg = edges_deg.persist()
    nodes = nodes.persist()
    edges_deg.count()
    nodes.count()
    edges_p.unpersist()
    return _iterate(nodes, edges_deg, p)


def variant_b(spark, sf_dir) -> DataFrame:
    return _build(spark, sf_dir, repartition_caches=False)


def variant_c(spark, sf_dir) -> DataFrame:
    return _build(spark, sf_dir, repartition_caches=True)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from parallel_monte_carlo_simulations_spark.session import get_spark

    spark = get_spark(
        app_name="pmcs-exp-pagerank2-r13",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.driver.memory": "1g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    variants = {
        "A_registered": variant_a,
        "B_no_cache_repart": variant_b,
        "C_cache_repart": variant_c,
    }
    base = [tuple(r) for r in sorted(variant_a(spark, SF_DIR).collect())]
    spark.catalog.clearCache()
    for name, fn in variants.items():
        if name == "A_registered":
            continue
        got = [tuple(r) for r in sorted(fn(spark, SF_DIR).collect())]
        assert got == base, f"{name} diverges from A"
        spark.catalog.clearCache()
        print(f"equivalence ok: {name}", flush=True)
    times: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(reps):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"pagerank:{name}:rep{rep}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times[name].append(round(dt, 3))
            spark.catalog.clearCache()
            print(f"rep{rep} {name:26s} {dt:6.3f}s", flush=True)

    print("\nmedians:")
    for name, xs in times.items():
        s = sorted(xs)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        print(f"  {name:26s} min={min(xs):6.3f} med={med:6.3f} {xs}")


if __name__ == "__main__":
    main()
