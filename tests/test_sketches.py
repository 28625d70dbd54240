"""Semantic properties of the sketch/sampling family — assertions the
oracle hash-match can't express: error bounds, merge laws, and
determinism under physical re-layout."""

from __future__ import annotations

from parallel_monte_carlo_simulations_spark.registry import load_all_queries

SF = "/root/testdata/sf0.01"
SPECS = load_all_queries()


def test_bloom_never_false_negative(spark):
    """Bloom passes must be a superset of true members: n_false_pos >= 0
    for every segment (a negative value would mean a dropped member)."""
    rows = SPECS["q_bloom_join_prune"].fn(spark, SF).collect()
    assert rows, "expected one row per segment"
    for r in rows:
        assert r.n_false_pos >= 0, r
        assert r.n_pass >= r.n_true, r


def test_cms_never_undercounts(spark):
    """Count-min estimates are exact-or-over: overcount >= 0 always."""
    rows = SPECS["q_cms_heavy_hitters"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.overcount >= 0, r
        assert r.est >= r.exact_cnt, r


def test_hll_error_bound_and_merge(spark):
    """256 registers -> ~6.5% standard error; assert within 4 sigma, and
    the two-shard register merge must equal the global build."""
    row = SPECS["q_hll_portable"].fn(spark, SF).collect()[0]
    assert row.merge_equal is True
    assert abs(row.rel_err_pct) < 4 * 6.5, row


def test_ddsketch_within_relative_error_bound(spark):
    """8 LINEAR sub-buckets/octave (HDR-histogram style): sub-bucket j
    has relative width 1/(8+j), worst at j=0 (12.5% of the lower bound),
    so with lower-bound semantics the estimate sits in
    [-1/9, 0] ~ [-11.2%, 0] of the exact value."""
    rows = SPECS["q_ddsketch_percentiles"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        for re in (r.re50_pct, r.re90_pct, r.re99_pct):
            assert -11.2 <= re <= 0.0, r


def test_weighted_reservoir_invariant_to_partitioning(spark):
    """No RNG state: the selected sample must be identical after an
    arbitrary repartition of the input — hash-derived keys cannot see
    physical layout. (A rand()-based sampler fails this.)"""
    from pyspark.sql import functions as F
    from parallel_monte_carlo_simulations_spark.functions.hashing import hash60
    from parallel_monte_carlo_simulations_spark.operators.sampling2 import (
        K,
        _TWO60,
    )
    from parallel_monte_carlo_simulations_spark.tables import table

    base = SPECS["q_sample_weighted_reservoir"].fn(spark, SF)
    picked = sorted(r.o_orderkey for r in base.collect())

    o = table(spark, SF, "orders").repartition(17, "o_orderdate")
    u = (hash60(F.col("o_orderkey").cast("string")) + 1).cast("double") / F.lit(
        _TWO60
    )
    kk = F.round(F.log(u) / F.col("o_totalprice"), 12)
    again = (
        o.select("o_orderkey", kk.alias("kk"))
        .orderBy(F.col("kk").desc(), "o_orderkey")
        .limit(K)
    )
    picked2 = sorted(r.o_orderkey for r in again.collect())
    assert picked == picked2
