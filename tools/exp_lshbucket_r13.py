#!/usr/bin/env python
"""Same-JVM A/B: LSH bucket computation — JVM HOF folds (32 per row)
vs a vectorized pandas_udf that replays the IDENTICAL left-to-right
IEEE fold per plane in numpy (guide §4.2).

Bit-parity argument: the JVM form computes, per plane,
  acc_0 = 0.0; acc_{d+1} = acc_d + (x[d] * w[d])
— two rounded double ops per dim. The numpy form runs
  acc = acc + X[:, d] * w[d]
per dim: the same two IEEE-754 ops per element in the same order
(separate ufunc calls — no FMA fusion). Buckets must match exactly.

Gate: full corpus bucket frames compared (diff rows must be 0), then
interleaved timing of the full q_sim_lsh_topk with each bucketing.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from parallel_monte_carlo_simulations_spark.session import get_spark  # noqa: E402
from parallel_monte_carlo_simulations_spark.tables import table  # noqa: E402
from parallel_monte_carlo_simulations_spark.similarity import lsh  # noqa: E402
from parallel_monte_carlo_simulations_spark.functions.vectors import (  # noqa: E402
    as_double,
    dot,
    norm,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# weight matrix W[t, p, d] materialized once
_W = np.array(
    [
        [
            [lsh._plane_weight(t, p, d) for d in range(lsh.DIM)]
            for p in range(lsh.N_PLANES)
        ]
        for t in range(lsh.N_TABLES)
    ]
)


from pyspark.sql.types import ArrayType, IntegerType  # noqa: E402


@F.pandas_udf(ArrayType(IntegerType()))
def _buckets_np(emb: pd.Series) -> pd.Series:
    X = np.stack(emb.to_numpy())  # (n, DIM) float64
    n = X.shape[0]
    out = np.zeros((n, lsh.N_TABLES), dtype=np.int32)
    for t in range(lsh.N_TABLES):
        bucket = np.zeros(n, dtype=np.int32)
        for p in range(lsh.N_PLANES):
            acc = np.zeros(n)
            for d in range(lsh.DIM):
                acc = acc + X[:, d] * _W[t, p, d]
            bucket += np.where(acc >= 0, 1 << p, 0).astype(np.int32)
        out[:, t] = bucket
    return pd.Series(list(out))


def lsh_buckets_np(vectors, emb_col="emb"):
    return vectors.select(
        "*", F.posexplode(_buckets_np(F.col(emb_col))).alias("table_id", "bucket")
    )


def q_lsh(spark, bucketer):
    e = table(spark, SF_DIR, "embeddings")
    corpus = bucketer(e.select("vec_id", as_double("embedding").alias("emb"), "label"))
    queries = bucketer(
        e.filter(F.col("vec_id") < lsh.N_QUERIES).select(
            F.col("vec_id").alias("query_id"), as_double("embedding").alias("qemb")
        ),
        "qemb",
    )
    cand = (
        F.broadcast(queries)
        .join(corpus, ["table_id", "bucket"])
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "qemb", "vec_id", "emb", "label")
        .distinct()
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
        .filter(F.col("rk") <= lsh.TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            (F.floor((F.col("cos_raw")) * 1e6 + 0.5) / 1e6).alias("cos_sim"),
            "rk",
        )
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(
        app_name="exp-lshbucket",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={
            "spark.driver.memory": "1g",
            # bench parity: no python worker reuse
            "spark.python.worker.reuse": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = table(spark, SF_DIR, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb"), "label"
    )
    jvm = lsh.lsh_buckets(e).select("vec_id", "table_id", "bucket")
    npy = lsh_buckets_np(e).select("vec_id", "table_id", "bucket")
    diff = jvm.exceptAll(npy).count() + npy.exceptAll(jvm).count()
    print("bucket diff rows:", diff)
    if diff:
        spark.stop()
        sys.exit(1)

    dp = spark.sparkContext.defaultParallelism

    def repart(v):
        return v.repartition(dp)

    variants = {
        "jvm": lambda: q_lsh(spark, lambda v, c="emb": lsh.lsh_buckets(v, c)),
        "np": lambda: q_lsh(spark, lambda v, c="emb": lsh_buckets_np(v, c)),
        "jvm_rp": lambda: q_lsh(
            spark, lambda v, c="emb": lsh.lsh_buckets(repart(v), c)
        ),
        "np_rp": lambda: q_lsh(
            spark, lambda v, c="emb": lsh_buckets_np(repart(v), c)
        ),
    }
    a = variants["jvm"]().orderBy("query_id", "rk").collect()
    b = variants["np"]().orderBy("query_id", "rk").collect()
    print("topk rows equal:", a == b)

    for fn in variants.values():
        noop(fn())
    samples = {k: [] for k in variants}
    for rep in range(5):
        for k, fn in variants.items():
            t0 = time.time()
            noop(fn())
            samples[k].append(round(time.time() - t0, 3))
    for k, v in samples.items():
        print(f"{k:4s} median={statistics.median(v):.3f} all={v}")
    spark.stop()


if __name__ == "__main__":
    main()
