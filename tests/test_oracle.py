"""The correctness gate, mirrored locally: every registered query with an
oracle must hash-match DuckDB at sf0.01 (same SF the driver uses)."""

from __future__ import annotations

import pytest

from parallel_monte_carlo_simulations_spark.registry import load_all_queries

from ._compare import compare

SF_DIR = "/root/testdata/sf0.01"

SPECS = load_all_queries()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    report = compare(df, spec.oracle, SF_DIR)
    assert report["ok"], f"{name}: {report}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
