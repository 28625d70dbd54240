#!/usr/bin/env python
"""A/B experiment: MinHash verify-side array frame caching (r13 round 2).

In the registered q_dedup_minhash_lsh, ``arrs = shingle_hash_arrays(sh)``
is referenced by BOTH verify join sides (pa on doc_a, pb on doc_b), so
its two hash aggregates (distinct (doc_id, h) + collect_list) run twice
— once per side — even though both read the cached shingle frame.
Variant B persists+materializes ``arrs`` so each side is a cached scan.

Output asserted cell-identical before timing.
Usage: python tools/exp_minhash2_r13.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def variant_a(spark, sf_dir) -> DataFrame:
    from parallel_monte_carlo_simulations_spark.dedup.minhash import (
        q_dedup_minhash_lsh,
    )

    return q_dedup_minhash_lsh(spark, sf_dir)


def variant_b(spark, sf_dir) -> DataFrame:
    from parallel_monte_carlo_simulations_spark.dedup.minhash import (
        VERIFY_DEN,
        VERIFY_NUM,
        lsh_candidates,
        minhash_signatures,
        shingle_hash_arrays,
    )
    from parallel_monte_carlo_simulations_spark.dedup.ngram import shingle_sets

    sh = shingle_sets(spark, sf_dir).persist()
    sh.count()
    sig = minhash_signatures(sh).persist()
    sig.count()
    cand = lsh_candidates(sig)
    arrs = shingle_hash_arrays(sh).persist()
    arrs.count()

    pa = arrs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hs").alias("ha"),
        F.col("n").alias("n_a"),
    ).hint("merge")
    pb = arrs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hs").alias("hb"),
        F.col("n").alias("n_b"),
    ).hint("merge")
    n_common = F.size(F.array_intersect("ha", "hb")).cast("long")
    union = F.col("n_a") + F.col("n_b") - F.col("n_common")
    jac = F.col("n_common") / union
    return (
        cand.join(pa, "doc_a")
        .join(pb, "doc_b")
        .withColumn("n_common", n_common)
        .filter(VERIFY_DEN * F.col("n_common") >= VERIFY_NUM * union)
        .select(
            "doc_a",
            "doc_b",
            (F.floor((jac) * 1e4 + 0.5) / 1e4).alias("jaccard"),
        )
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from parallel_monte_carlo_simulations_spark.session import get_spark

    spark = get_spark(
        app_name="pmcs-exp-minhash2-r13",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.driver.memory": "1g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = [tuple(r) for r in sorted(variant_a(spark, SF_DIR).collect())]
    spark.catalog.clearCache()
    got = [tuple(r) for r in sorted(variant_b(spark, SF_DIR).collect())]
    assert got == base, "variant B diverges from A"
    spark.catalog.clearCache()
    print("equivalence ok: B_arrs_cached", flush=True)

    variants = {"A_current": variant_a, "B_arrs_cached": variant_b}
    times: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(reps):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"minhash:{name}:rep{rep}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times[name].append(round(dt, 3))
            spark.catalog.clearCache()
            print(f"rep{rep} {name:16s} {dt:6.3f}s", flush=True)

    print("\nmedians:")
    for name, xs in times.items():
        s = sorted(xs)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        print(f"  {name:16s} min={min(xs):6.3f} med={med:6.3f} {xs}")


if __name__ == "__main__":
    main()
