"""r13 optimization round: the LSH bucket computation moved from JVM
HOF folds to a vectorized numpy pandas_udf (similarity/lsh.py). The
optimization is only valid if every bucket is BIT-identical — a single
sign flip changes candidate sets and breaks the DuckDB oracle — so this
suite pins the vectorized form to the retained JVM reference form on
real corpus data plus adversarial edges (NULL embedding, zero vector,
sign boundaries).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_monte_carlo_simulations_spark.functions.vectors import as_double
from parallel_monte_carlo_simulations_spark.similarity.lsh import (
    DIM,
    N_TABLES,
    lsh_buckets,
    lsh_buckets_jvm,
)
from parallel_monte_carlo_simulations_spark.tables import table

SF_DIR = "/root/testdata/sf0.01"


def _bucket_rows(df):
    return sorted(
        (r.vec_id, r.table_id, r.bucket)
        for r in df.select("vec_id", "table_id", "bucket").collect()
    )


def test_numpy_buckets_match_jvm_on_corpus(spark):
    e = table(spark, SF_DIR, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    assert _bucket_rows(lsh_buckets(e)) == _bucket_rows(lsh_buckets_jvm(e))


def test_numpy_buckets_edge_vectors(spark):
    rows = [
        (0, [0.0] * DIM),            # zero vector: every dot == 0.0 -> bit set
        (1, [1e-300] * DIM),         # denormal-scale positives
        (2, [-1e-300] * DIM),        # denormal-scale negatives
        (3, [1.0] + [0.0] * (DIM - 1)),
        (4, [-1.0] * DIM),
        (5, None),                   # NULL embedding -> bucket 0 per table
    ]
    df = spark.createDataFrame(rows, "vec_id int, emb array<double>")
    got = _bucket_rows(lsh_buckets(df))
    ref = _bucket_rows(lsh_buckets_jvm(df))
    assert got == ref
    # NULL semantics pinned explicitly, not just by mirror
    nulls = [(t, b) for v, t, b in got if v == 5]
    assert nulls == [(t, 0) for t in range(N_TABLES)]


def test_numpy_buckets_schema_matches_jvm(spark):
    e = table(spark, SF_DIR, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb"), "label"
    )
    a, b = lsh_buckets(e), lsh_buckets_jvm(e)
    assert a.columns == b.columns
    assert [f.dataType for f in a.schema.fields] == [
        f.dataType for f in b.schema.fields
    ]


@pytest.mark.parametrize("n", [0, 1])
def test_numpy_buckets_tiny_frames(spark, n):
    e = (
        table(spark, SF_DIR, "embeddings")
        .select("vec_id", as_double("embedding").alias("emb"))
        .limit(n)
    )
    assert _bucket_rows(lsh_buckets(e)) == _bucket_rows(lsh_buckets_jvm(e))
