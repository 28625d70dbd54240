#!/usr/bin/env python
"""A/B: bucketed-write layout for q_sink_bucketed_join (r13).

Current form: 32 scan tasks x 8 buckets -> up to 256 files per table.
Candidate: repartition(N_BUCKETS, key) before the bucketed write —
repartition and bucketing share pmod(murmur3(key), N), so each write
task holds exactly one bucket -> N_BUCKETS files per table (guide §6:
fewer, larger files; same rows stored, same query result).
"""

from __future__ import annotations

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_BUCKETS = 8
_SEQ = itertools.count()


def run(spark, align: bool) -> float:
    from parallel_monte_carlo_simulations_spark.functions.microunit import (
        rdiv_halfup_expr,
    )
    from parallel_monte_carlo_simulations_spark.sources.roundtrip import _tmpdir
    from parallel_monte_carlo_simulations_spark.tables import table

    run_id = next(_SEQ)
    l_name, o_name = f"exp_li_{run_id}", f"exp_ord_{run_id}"
    t0 = time.time()
    l = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    from parallel_monte_carlo_simulations_spark.functions.microunit import units_sql

    paths = {}
    for df, name, key in ((l, l_name, "l_orderkey"), (o, o_name, "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        if align:
            df = df.repartition(N_BUCKETS, F.col(key))
        paths[name] = _tmpdir(name)
        (
            df.write.format("parquet")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", paths[name])
            .mode("overwrite")
            .saveAsTable(name)
        )
    lb, ob = spark.table(l_name), spark.table(o_name)
    out = (
        lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        .filter(F.col("o_totalprice") > 1000)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            rdiv_halfup_expr(
                f"sum({units_sql('l_extendedprice', 2)})", "100", 2
            ).alias("sum_price"),
        )
    )
    out.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    # count files of the lineitem table
    d = paths[l_name]
    nfiles = sum(
        1 for f in os.listdir(d) if f.endswith(".parquet") or f.startswith("part-")
    )
    rows = sorted(map(str, out.collect()))
    return dt, nfiles, rows


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from parallel_monte_carlo_simulations_spark.session import get_spark

    spark = get_spark(
        app_name="pmcs-exp-bucketed",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.driver.memory": "1g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    res = {"current": [], "aligned": []}
    ref = None
    for r in range(reps):
        for label, align in (("current", False), ("aligned", True)):
            dt, nfiles, rows = run(spark, align)
            res[label].append(round(dt, 3))
            if r == 0:
                if ref is None:
                    ref = rows
                print(f"{label}: files={nfiles} identical={rows == ref}")
    for k, xs in res.items():
        print(f"{k:10s} med={sorted(xs)[len(xs)//2]:7.3f} all={xs}")


if __name__ == "__main__":
    main()
