#!/usr/bin/env python
"""A/B experiment: PageRank iteration-plan variants (r13 optimization).

Same-JVM interleaved timing of q_graph_pagerank formulations; every
variant's quantized output is asserted identical to the registered
query's before timing counts. Usage:

    python tools/exp_pagerank_r13.py [reps]
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


def _base(spark: SparkSession, sf_dir: str):
    from parallel_monte_carlo_simulations_spark.tables import table

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
        .unionByName(pairs.select(F.col("p").alias("src"), F.col("s").alias("dst")))
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    return edges, outdeg


def variant(
    spark: SparkSession,
    sf_dir: str,
    repartition_cached: bool,
    repartition_contrib: bool,
    hint_shuffle_hash: bool,
    p: int | None = None,
    eager_cache: bool = False,
) -> DataFrame:
    edges, outdeg = _base(spark, sf_dir)
    if p is None:
        p = spark.sparkContext.defaultParallelism
    ed = edges.join(outdeg, "src")
    nd = edges.select(F.col("src").alias("node")).distinct()
    if repartition_cached:
        ed = ed.repartition(p, "src")
        nd = nd.repartition(p, "node")
    edges_deg = ed.persist()
    nodes = nd.persist()
    if eager_cache:
        # materialize so downstream planning SEES hash(src/node, p):
        # unmaterialized caches plan as UnknownPartitioning and every
        # iteration re-exchanges both join inputs.
        edges_deg.count()
        nodes.count()

    def h(df):
        return df.hint("shuffle_hash") if hint_shuffle_hash else df

    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(N_ITERS):
        j = edges_deg.join(h(ranks), edges_deg.src == ranks.node)
        if repartition_contrib:
            j = j.repartition(p, "dst")
        contrib = j.groupBy("dst").agg(
            F.sum(F.col("rank") / F.col("deg")).alias("contrib")
        )
        ranks = nodes.join(
            h(contrib), nodes.node == contrib.dst, "left"
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


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from parallel_monte_carlo_simulations_spark.registry import load_all_queries
    from parallel_monte_carlo_simulations_spark.session import get_spark

    spark = get_spark(
        app_name="pmcs-exp-pagerank",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.driver.memory": "1g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all_queries()

    variants = {
        "V0_registered": lambda: specs["q_graph_pagerank"].fn(spark, SF_DIR),
        "V1_norepart_cached": lambda: variant(
            spark, SF_DIR, repartition_cached=False,
            repartition_contrib=True, hint_shuffle_hash=True,
        ),
        "V5_norepart_all": lambda: variant(
            spark, SF_DIR, repartition_cached=False,
            repartition_contrib=False, hint_shuffle_hash=True,
        ),
        "V7_p8": lambda: variant(
            spark, SF_DIR, repartition_cached=False,
            repartition_contrib=False, hint_shuffle_hash=True, p=8,
        ),
        "V8_eager_p8": lambda: variant(
            spark, SF_DIR, repartition_cached=True,
            repartition_contrib=True, hint_shuffle_hash=True, p=8,
            eager_cache=True,
        ),
        "V9_eager_p32": lambda: variant(
            spark, SF_DIR, repartition_cached=True,
            repartition_contrib=True, hint_shuffle_hash=True, p=32,
            eager_cache=True,
        ),
    }

    # warm
    spark.range(1000).count()

    expected = None
    results: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(reps):
        for name, make in variants.items():
            spark.sparkContext.setJobDescription(f"pr:{name}#{r}")
            t0 = time.time()
            df = make()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            results[name].append(round(dt, 3))
            if r == 0:
                rows = sorted(
                    (int(x[0]), float(x[1])) for x in df.collect()
                )
                if expected is None:
                    expected = rows
                    print(f"{name}: {len(rows)} rows (reference)")
                else:
                    same = rows == expected
                    print(f"{name}: identical={same}")
                    if not same:
                        diff = [
                            (a, b) for a, b in zip(rows, expected) if a != b
                        ][:5]
                        print("  first diffs:", diff)
            spark.catalog.clearCache()
    print()
    for name, xs in results.items():
        xs2 = sorted(xs)
        med = xs2[len(xs2) // 2]
        print(f"{name:22s} med={med:7.3f} all={xs}")


if __name__ == "__main__":
    main()
