#!/usr/bin/env python
"""A/B experiment: rank-1 ALS plan variants (r13 optimization).

Variant A = registered query (ratings cached in aggregation layout,
lazy persist). Variant B = ratings repartitioned hash(item_id, P) and
materialized eagerly, final scoring join reordered v2-then-u1 so the
item-keyed join is exchange-free against the pinned cache.

Both variants' full 50-row outputs are asserted identical (exact cell
compare after the deterministic ORDER BY) before timing counts.

Usage: python tools/exp_als_r13.py [reps]
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

LAMBDA = 10
QSCALE = 1_000_000


def _ratings(spark, sf_dir):
    from parallel_monte_carlo_simulations_spark.tables import table

    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
        )
        .agg(F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("r"))
    )


def _quant(col):
    return F.floor(col * QSCALE + F.lit(0.5)).cast("long")


def variant(
    spark: SparkSession,
    sf_dir: str,
    pin_item: bool,
    eager: bool,
    reorder_final: bool,
) -> DataFrame:
    from parallel_monte_carlo_simulations_spark.tables import adaptive_partitions

    r = _ratings(spark, sf_dir)
    if pin_item:
        p = adaptive_partitions(spark, sf_dir)
        r = r.repartition(p, "item_id")
    ratings = r.persist()
    if eager:
        ratings.count()

    lam = float(LAMBDA)
    v1 = ratings.groupBy("item_id").agg(
        (
            F.sum("r").cast("double")
            / (F.lit(lam) + F.count("*").cast("double"))
        ).alias("v")
    )
    u1 = (
        ratings.join(v1, "item_id")
        .groupBy("user_id")
        .agg(
            (
                (F.sum(_quant(F.col("r") * F.col("v"))).cast("double") / QSCALE)
                / (
                    F.lit(lam)
                    + F.sum(_quant(F.col("v") * F.col("v"))).cast("double")
                    / QSCALE
                )
            ).alias("u")
        )
        .persist()
    )
    if eager:
        u1.count()
    v2 = (
        ratings.join(u1, "user_id")
        .groupBy("item_id")
        .agg(
            (
                (F.sum(_quant(F.col("r") * F.col("u"))).cast("double") / QSCALE)
                / (
                    F.lit(lam)
                    + F.sum(_quant(F.col("u") * F.col("u"))).cast("double")
                    / QSCALE
                )
            ).alias("v")
        )
    )
    if reorder_final:
        joined = ratings.join(v2, "item_id").join(u1, "user_id")
    else:
        joined = ratings.join(u1, "user_id").join(v2, "item_id")
    return (
        joined.select(
            "user_id",
            "item_id",
            "r",
            (F.floor((F.col("u") * F.col("v")) * 1e6 + 0.5) / 1e6).alias(
                "predicted"
            ),
        )
        .orderBy(F.desc("predicted"), "user_id", "item_id")
        .limit(50)
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from parallel_monte_carlo_simulations_spark.session import get_spark

    spark = get_spark(
        app_name="pmcs-exp-als-r13",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.driver.memory": "1g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    variants = {
        "A_current": dict(pin_item=False, eager=False, reorder_final=False),
        "B_pin_eager_reorder": dict(pin_item=True, eager=True, reorder_final=True),
        "C_pin_eager": dict(pin_item=True, eager=True, reorder_final=False),
    }

    # equivalence gate: full 50-row output must match variant A exactly
    base = [
        tuple(r)
        for r in variant(spark, SF_DIR, **variants["A_current"]).collect()
    ]
    spark.catalog.clearCache()
    for name, kw in variants.items():
        if name == "A_current":
            continue
        got = [tuple(r) for r in variant(spark, SF_DIR, **kw).collect()]
        assert got == base, f"{name} diverges from A_current"
        spark.catalog.clearCache()
        print(f"equivalence ok: {name}", flush=True)

    times: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(reps):
        for name, kw in variants.items():
            spark.sparkContext.setJobDescription(f"als:{name}:rep{rep}")
            t0 = time.time()
            df = variant(spark, SF_DIR, **kw)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times[name].append(round(dt, 3))
            spark.catalog.clearCache()
            print(f"rep{rep} {name:22s} {dt:6.3f}s", flush=True)

    print("\nmedians:")
    for name, xs in times.items():
        s = sorted(xs)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        print(f"  {name:22s} min={min(xs):6.3f} med={med:6.3f} {xs}")


if __name__ == "__main__":
    main()
