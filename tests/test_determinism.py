"""Order-independence proofs for the exact-decimal ML/stats operators.

These operators claim their sufficient statistics are EXACT (integer /
decimal sums), making results invariant to physical layout — the
property that distinguishes them from naive float aggregation, whose
partial-sum order changes under repartitioning. Each test recomputes
the query after forcing a different partitioning of the input path and
asserts byte-identical results. (The registry fn reads from the
canonical path, so the re-layout runs the same plan over a reshuffled
copy written to a temp dir.)"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from parallel_monte_carlo_simulations_spark.registry import load_all_queries
from parallel_monte_carlo_simulations_spark.tables import TABLE_NAMES

SF = "/root/testdata/sf0.01"
SPECS = load_all_queries()

#: (query, tables it reads) — each is rerun over a 13-way hash-shuffled
#: rewrite of those tables.
CASES = [
    ("q_ols_regression", ["lineitem"]),
    ("q_pca_power_iteration", ["embeddings"]),
    ("q_naive_bayes_confusion", ["documents"]),
    ("q_text_zipf_fit", ["documents"]),
    ("q_chi_square_independence", ["events"]),
    ("q_hll_portable", ["events"]),
]


@pytest.fixture(scope="module")
def shuffled_sf(spark):
    """A copy of sf0.01 with every needed table rewritten in 13 shuffled
    partitions — different file count, different row order per file."""
    out = tempfile.mkdtemp(prefix="pmcs_shuffled_sf_")
    needed = sorted({t for _, ts in CASES for t in ts} | set(TABLE_NAMES))
    for t in needed:
        src = os.path.join(SF, f"{t}.parquet")
        df = spark.read.parquet(src)
        # repartition by a non-key expression: rows land in arbitrary
        # partitions, so float partial-agg order would differ.
        df.repartition(13).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    yield out
    shutil.rmtree(out, ignore_errors=True)


@pytest.mark.parametrize("name,_tables", CASES)
def test_result_invariant_under_repartition(spark, shuffled_sf, name, _tables):
    base = [tuple(r) for r in SPECS[name].fn(spark, SF).collect()]
    again = [tuple(r) for r in SPECS[name].fn(spark, shuffled_sf).collect()]
    assert sorted(map(repr, base)) == sorted(map(repr, again)), name
