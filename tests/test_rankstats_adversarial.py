"""Adversarial batch tests for the rankstats kernel — exhaustive where
the domain is small (every NTILE remainder boundary), adversarial-pool
randomized where it isn't (extreme doubles, heavy ties, negatives,
denormals), each as ONE batched Spark job so coverage is wide without
per-example session cost."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from parallel_monte_carlo_simulations_spark.operators.rankstats import (
    bucketed_running,
    sql_ntile,
)


def _py_ntile(rank: int, n: int, k: int) -> int:
    """Reference SQL NTILE: first n%k buckets take n//k+1 rows."""
    q, r = divmod(n, k)
    big = r * (q + 1)
    if rank <= big:
        return (rank + q) // (q + 1)
    return r + math.ceil((rank - big) / q)


def test_sql_ntile_exhaustive_small_domain(spark):
    """EVERY (n, k, rank) with n <= 40, k in {2,3,4,5,7,10} — complete
    coverage of the larger-buckets-first remainder rule, including
    n < k, n == k, and every n % k residue."""
    rows = [
        (n, k, rank)
        for n in range(1, 41)
        for k in (2, 3, 4, 5, 7, 10)
        for rank in range(1, n + 1)
    ]
    df = spark.createDataFrame(rows, "n long, k int, rank long")
    got = df.select(
        "n",
        "k",
        "rank",
        F.when(F.col("k") == 2, sql_ntile(F.col("rank"), F.col("n"), 2))
        .when(F.col("k") == 3, sql_ntile(F.col("rank"), F.col("n"), 3))
        .when(F.col("k") == 4, sql_ntile(F.col("rank"), F.col("n"), 4))
        .when(F.col("k") == 5, sql_ntile(F.col("rank"), F.col("n"), 5))
        .when(F.col("k") == 7, sql_ntile(F.col("rank"), F.col("n"), 7))
        .otherwise(sql_ntile(F.col("rank"), F.col("n"), 10))
        .alias("t"),
    ).collect()
    for row in got:
        want = _py_ntile(row["rank"], row["n"], row["k"])
        assert row["t"] == want, (row["n"], row["k"], row["rank"], row["t"])


def test_sql_ntile_huge_counts_stay_exact():
    """The closed form divides exact multiples as doubles — exact while
    values < 2^53. Check the pure-integer identity at large n."""
    for n in (10**9, 10**12, 2**52):
        for k in (7, 10, 1000):
            q, r = divmod(n, k)
            for rank in (1, r * (q + 1), r * (q + 1) + 1, n):
                if rank < 1 or rank > n:
                    continue
                # mirror of the Column arithmetic in pure Python floats
                big = r * (q + 1)
                if rank <= big:
                    got = int(((rank + q) - ((rank + q) % (q + 1))) / (q + 1))
                else:
                    x = rank - big + max(q, 1) - 1
                    got = r + int((x - (x % max(q, 1))) / max(q, 1))
                assert got == _py_ntile(rank, n, k), (n, k, rank)


_POOLS = [
    [0.0, -0.0, 1.0, 2.0],                     # zeros and small ints
    [1e300, -1e300, 1e-300, 5e-324],           # extremes and a denormal
    [3.14, 3.14, 3.14, 2.71],                  # heavy ties
    [-5.5, -5.5, 0.0, 5.5, 5.5],               # symmetric ties
    [float(x) for x in range(-3, 4)],          # dense integers
    [42.0],                                     # constant (span = 0)
    [1e15, 1e15 + 1, 1e15 + 2],                # adjacent at low precision
]


def test_bucketed_running_adversarial_cases_batched(spark):
    """~40 randomized cases drawn from adversarial value pools, ALL run
    through ONE kernel invocation (partition_by=case id) and checked
    against Python-computed running sums."""
    rng = random.Random(20260816)
    rows, expected = [], {}
    for case in range(40):
        pool = _POOLS[case % len(_POOLS)]
        n = rng.randint(1, 60)
        vals = [rng.choice(pool) for _ in range(n)]
        order = sorted(range(n), key=lambda i: (vals[i], i))
        cum = 0
        for pos, i in enumerate(order):
            cum += 1
            expected[(case, i)] = cum
        rows.extend((case, i, vals[i]) for i in range(n))
    df = spark.createDataFrame(rows, "cid int, rid long, v double")
    out = bucketed_running(
        df,
        axis="v",
        order=[F.col("v").asc(), F.col("rid").asc()],
        cums={"c": F.lit(1)},
        partition_by=("cid",),
        n_buckets=8,
    ).collect()
    assert len(out) == len(rows)
    for row in out:
        assert row["c"] == expected[(row["cid"], row["rid"])], (
            row["cid"],
            row["rid"],
            row["v"],
            row["c"],
        )
