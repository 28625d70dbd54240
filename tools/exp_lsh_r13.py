#!/usr/bin/env python
"""A/B experiment: q_sim_lsh_topk candidate-generation variants (r13).

Variant A = registered form: explode both sides into (table_id, bucket)
rows, broadcast-join, wide DISTINCT over the duplicated (qemb, emb)
pairs.

Variant B = set-membership form: keep the 8 bucket entries as an array
of (table_id, bucket) structs on both sides and generate candidates
with a BroadcastNestedLoopJoin on ``arrays_overlap`` against the
N_QUERIES broadcast rows. A pair sharing k tables appears exactly once
(no explode duplication), so the wide DISTINCT exchange disappears
entirely; bucket math per vector is unchanged (same index-ordered
fold), so the candidate SET and all cosines are provably identical.

Both variants' full top-k outputs are asserted identical before timing.

Usage: python tools/exp_lsh_r13.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def variant_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parallel_monte_carlo_simulations_spark.similarity.lsh import (
        N_QUERIES,
        N_TABLES,
        TOP_K,
        _bucket,
    )
    from parallel_monte_carlo_simulations_spark.functions.vectors import (
        as_double,
        dot,
        norm,
    )
    from parallel_monte_carlo_simulations_spark.tables import table

    def entries(emb_col):
        return F.array(
            *[
                F.struct(
                    F.lit(t).alias("table_id"),
                    _bucket(F.col(emb_col), t).alias("bucket"),
                )
                for t in range(N_TABLES)
            ]
        )

    e = table(spark, sf_dir, "embeddings")
    corpus = e.select(
        "vec_id", as_double("embedding").alias("emb"), "label"
    ).withColumn("centries", entries("emb"))
    queries = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), as_double("embedding").alias("qemb"))
        .withColumn("qentries", entries("qemb"))
    )
    cand = (
        corpus.join(
            F.broadcast(queries),
            F.arrays_overlap(F.col("centries"), F.col("qentries"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select("query_id", "qemb", "vec_id", "emb", "label")
        .withColumn("qn", norm(F.col("qemb")))
        .withColumn("cn", norm(F.col("emb")))
    )
    cos = dot(F.col("qemb"), F.col("emb")) / (F.col("qn") * F.col("cn"))
    return (
        cand.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            cos.alias("cos_raw"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cos_raw"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            (F.floor((F.col("cos_raw")) * 1e6 + 0.5) / 1e6).alias("cos_sim"),
            "rk",
        )
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from parallel_monte_carlo_simulations_spark.registry import load_all_queries
    from parallel_monte_carlo_simulations_spark.session import get_spark

    spark = get_spark(
        app_name="pmcs-exp-lsh-r13",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.driver.memory": "1g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all_queries()
    q_a = specs["q_sim_lsh_topk"].fn

    base = sorted(tuple(r) for r in q_a(spark, SF_DIR).collect())
    got = sorted(tuple(r) for r in variant_b(spark, SF_DIR).collect())
    assert got == base, "variant B diverges"
    print("equivalence ok: B_arrays_overlap", flush=True)

    fns = {"A_current": lambda: q_a(spark, SF_DIR), "B_overlap": lambda: variant_b(spark, SF_DIR)}
    times = {k: [] for k in fns}
    for rep in range(reps):
        for name, fn in fns.items():
            spark.sparkContext.setJobDescription(f"lsh:{name}:rep{rep}")
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times[name].append(round(dt, 3))
            spark.catalog.clearCache()
            print(f"rep{rep} {name:12s} {dt:6.3f}s", flush=True)

    print("\nmedians:")
    for name, xs in times.items():
        s = sorted(xs)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        print(f"  {name:12s} min={min(xs):6.3f} med={med:6.3f} {xs}")


if __name__ == "__main__":
    main()
