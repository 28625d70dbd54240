"""Degenerate-input guards stay mirrored across engines (r12, from r11
ADVICE): Cochran-Armitage with zero trend variance, partial correlation
with a constant column, and Cohen's kappa over NULL-text documents must
all return the same (possibly NULL) values in Spark and DuckDB — the
divide-by-zero class where unguarded Spark yields NULL while DuckDB
yields inf/NaN. Each test fabricates a tiny degenerate parquet table
and runs the REGISTERED query against its REGISTERED oracle."""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parallel_monte_carlo_simulations_spark.registry import load_all_queries
from parallel_monte_carlo_simulations_spark.tables import TABLE_NAMES

from ._compare import compare

SPECS = load_all_queries()


def _write(tmp_path, name: str, data: dict) -> str:
    # the oracle harness binds a view per table at connect time, so
    # every table needs a (dummy) parquet file present.
    for other in TABLE_NAMES:
        pq.write_table(
            pa.table({"_": [0]}), os.path.join(tmp_path, f"{other}.parquet")
        )
    pq.write_table(pa.table(data), os.path.join(tmp_path, f"{name}.parquet"))
    return str(tmp_path)


def test_cochran_armitage_all_responders_is_null_both_engines(
    spark, tmp_path
):
    # every order is status 'F' => r == N => variance 0 => z/sig NULL
    sf = _write(
        tmp_path,
        "orders",
        {
            "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "1-URGENT"],
            "o_orderstatus": ["F", "F", "F", "F"],
        },
    )
    spec = SPECS["q_stat_cochran_armitage"]
    rep = compare(spec.fn(spark, sf), spec.oracle, sf)
    assert rep["ok"], rep
    row = spec.fn(spark, sf).collect()[0]
    assert row["z_trend"] is None and row["significant_05"] is None


def test_cochran_armitage_constant_score_is_null_both_engines(
    spark, tmp_path
):
    # one priority level => N*sum(w^2 n) == (sum w n)^2 => variance 0
    sf = _write(
        tmp_path,
        "orders",
        {
            "o_orderpriority": ["2-HIGH"] * 6,
            "o_orderstatus": ["F", "O", "F", "O", "O", "F"],
        },
    )
    spec = SPECS["q_stat_cochran_armitage"]
    rep = compare(spec.fn(spark, sf), spec.oracle, sf)
    assert rep["ok"], rep
    assert spec.fn(spark, sf).collect()[0]["z_trend"] is None


def test_partial_corr_constant_column_is_null_both_engines(spark, tmp_path):
    # l_quantity constant => every r involving x is NULL, partial NULL
    sf = _write(
        tmp_path,
        "lineitem",
        {
            "l_quantity": [7.0] * 5,
            "l_discount": [0.01, 0.02, 0.03, 0.04, 0.05],
            "l_tax": [0.05, 0.04, 0.03, 0.02, 0.01],
        },
    )
    spec = SPECS["q_stat_partial_corr"]
    rep = compare(spec.fn(spark, sf), spec.oracle, sf)
    assert rep["ok"], rep
    row = spec.fn(spark, sf).collect()[0]
    assert row["r_xy"] is None and row["r_xy_given_z"] is None
    # the unaffected pair still computes
    assert row["r_yz"] is not None


def test_partial_corr_perfect_confounder_is_null_both_engines(
    spark, tmp_path
):
    # y == z exactly => ryz = 1 => 1 - ryz^2 == 0 => partial NULL
    sf = _write(
        tmp_path,
        "lineitem",
        {
            "l_quantity": [1.0, 5.0, 2.0, 9.0, 4.0],
            "l_discount": [0.01, 0.02, 0.03, 0.04, 0.05],
            "l_tax": [0.01, 0.02, 0.03, 0.04, 0.05],
        },
    )
    spec = SPECS["q_stat_partial_corr"]
    rep = compare(spec.fn(spark, sf), spec.oracle, sf)
    assert rep["ok"], rep
    row = spec.fn(spark, sf).collect()[0]
    assert row["r_yz"] == pytest.approx(1.0)
    # ryz may sit one ulp below 1.0 (sqrt(v)*sqrt(v) != v), in which
    # case the guard legitimately passes and both engines agree on a
    # finite value; the contract is mirrored-finite-or-mirrored-NULL,
    # never inf/NaN.
    v = row["r_xy_given_z"]
    assert v is None or math.isfinite(v)


def test_cohens_kappa_retains_null_text_documents(spark, tmp_path):
    # two NULL-text docs: the oracle's PARTITION BY text groups them as
    # one retained dup partition; the engine's null-safe join must too.
    sf = _write(
        tmp_path,
        "documents",
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [None, None, "a b c d", "a a a a a a", "x y"],
        },
    )
    spec = SPECS["q_stat_cohens_kappa"]
    rep = compare(spec.fn(spark, sf), spec.oracle, sf)
    assert rep["ok"], rep
    assert spec.fn(spark, sf).collect()[0]["n_docs"] == 5


def test_dup_flow_matrix_drops_null_text_documents(spark, tmp_path):
    # r12 ADVICE: Spark's concat_ws folds a NULL token array to '' so
    # NULL-text docs used to fingerprint as md5('') and join with each
    # other (and with empty-text docs); DuckDB's array_to_string(NULL)
    # stays NULL and drops out. The guarded fingerprint must make both
    # engines drop NULL-text rows identically — here the only pair that
    # survives is the genuine 'a b' duplicate, never the two NULLs.
    sf = _write(
        tmp_path,
        "documents",
        {
            "doc_id": [1, 2, 3, 4],
            "text": [None, None, "a b", "a b"],
            "source": ["s1", "s2", "s1", "s2"],
        },
    )
    spec = SPECS["q_curation_dup_flow_matrix"]
    rep = compare(spec.fn(spark, sf), spec.oracle, sf)
    assert rep["ok"], rep
    rows = spec.fn(spark, sf).collect()
    assert len(rows) == 1
    assert (rows[0].source_a, rows[0].source_b, rows[0].n_dup_pairs) == (
        "s1",
        "s2",
        1,
    )
