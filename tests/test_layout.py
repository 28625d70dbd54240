"""Storage-layout pinning tests.

The oracle for ``q_sink_compaction`` deliberately checks invariants, not
the literal 64 -> 4 file counts (empty partitions write no file, so the
literal counts are not guaranteed at tiny scale factors).  These tests
pin the exact counts at the scale factors the suite actually runs, where
documents >> 64 rows makes the round-robin split deterministic in
practice, and check the invariant form stays green.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_monte_carlo_simulations_spark.sources.roundtrip import _tmpdir
from parallel_monte_carlo_simulations_spark.operators.layout import (
    q_sink_compaction,
)
from parallel_monte_carlo_simulations_spark.tables import table
from tests.conftest import SF_SMALL


def test_compaction_invariants_green(spark):
    row = q_sink_compaction(spark, SF_SMALL).collect()[0]
    assert row.fragmented is True
    assert row.compacted is True
    docs = table(spark, SF_SMALL, "documents")
    assert row.n_rows == docs.count()
    assert row.total_chars == docs.agg(F.sum("n_chars")).collect()[0][0]


def test_compaction_exact_counts_at_small_sf(spark):
    """At sf0.001 (hundreds of docs >> 64 partitions) the fragmented
    write yields exactly 64 files and the coalesce(4) rewrite exactly 4
    — the headline numbers in the query description."""
    d = table(spark, SF_SMALL, "documents").select("doc_id", "text", "n_chars")
    assert d.count() >= 64, "fixture assumption: enough docs to fill 64 files"
    frag_path, compact_path = _tmpdir("frag-test"), _tmpdir("compact-test")
    d.repartition(64).write.mode("overwrite").parquet(frag_path)
    frag = spark.read.parquet(frag_path)
    n_before = frag.select(F.input_file_name()).distinct().count()
    frag.coalesce(4).write.mode("overwrite").parquet(compact_path)
    n_after = (
        spark.read.parquet(compact_path)
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert n_before == 64
    assert n_after == 4
