#!/usr/bin/env python
"""Same-JVM A/B for q_mc_american_lsmc (r13 optimization round, cont.).

Questions:
  1. Where does the time go — planning/codegen or execution?
  2. Does materializing the spot chain once (cached temp view computed by
     the IDENTICAL SQL text) beat re-deriving it for the 3 regression
     aggregates + pricing pass?

Variants:
  current   — the registered single-statement form
  spotcache — sp4 (i, s1..s4) materialized via persist+count, downstream
              CTEs read the cache; all expression text identical

Equality gate: collected rows of both variants must match exactly.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_monte_carlo_simulations_spark.session import get_spark  # noqa: E402
from parallel_monte_carlo_simulations_spark.mc import lsmc  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build_current(spark):
    body = lsmc.lsmc_body()
    parts = max(1, min(spark.sparkContext.defaultParallelism, lsmc.N_PATHS // 512))
    return spark.sql(
        f"WITH idx AS (SELECT id AS i FROM range(0, {lsmc.N_PATHS}, 1, {parts}))\n, "
        + body[len("WITH ") :]
    )


def build_spotcache(spark):
    body = lsmc.lsmc_body()
    parts = max(1, min(spark.sparkContext.defaultParallelism, lsmc.N_PATHS // 512))
    # split the shared text: everything up to and incl. sp4 becomes the
    # cached frame; the remainder (reg/co CTEs + final select) runs over it.
    head, tail = body.split(",\nreg3 AS (", 1)
    spots_sql = (
        f"WITH idx AS (SELECT id AS i FROM range(0, {lsmc.N_PATHS}, 1, {parts}))\n, "
        + head[len("WITH ") :]
        + "\nSELECT * FROM sp4"
    )
    spots = spark.sql(spots_sql).persist()
    spots.count()
    spots.createOrReplaceTempView("_lsmc_spots")
    out = spark.sql("WITH sp4 AS (SELECT * FROM _lsmc_spots),\nreg3 AS (" + tail)
    return spots, out


def main():
    spark = get_spark(
        app_name="exp-lsmc",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.driver.memory": "1g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # equality gate
    a = build_current(spark).collect()
    spots, bdf = build_spotcache(spark)
    b = bdf.collect()
    spots.unpersist()
    print("rows equal:", a == b, a, b)

    # planning-only cost of the current form (analyze+optimize, no exec)
    t0 = time.time()
    d = build_current(spark)
    d.explain("cost")
    print(f"plan-only (current): {time.time()-t0:.3f}s")

    samples = {"current": [], "spotcache": []}
    for rep in range(5):
        t0 = time.time()
        noop(build_current(spark))
        samples["current"].append(round(time.time() - t0, 3))

        t0 = time.time()
        spots, bdf = build_spotcache(spark)
        noop(bdf)
        spots.unpersist()
        samples["spotcache"].append(round(time.time() - t0, 3))
    for k, v in samples.items():
        print(f"{k:10s} median={statistics.median(v):.3f} all={v}")
    spark.stop()


if __name__ == "__main__":
    main()
