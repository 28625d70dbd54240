"""Unit tests for tables.adaptive_partitions (r13 optimization round).

The helper replaces ``defaultParallelism`` for all explicit iteration-
state partition pins, so its three regimes (tiny input -> few fat
partitions, medium -> cluster width, huge -> guide-band partition size)
must hold exactly; a wrong count silently reshapes every iterative
graph/ALS plan.
"""

from __future__ import annotations

import os

from parallel_monte_carlo_simulations_spark.tables import (
    adaptive_partitions,
    input_file_bytes,
    partitions_for_bytes,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_input_file_bytes_matches_disk(spark):
    path = os.path.join(SF001, "lineitem.parquet")
    expected = (
        os.path.getsize(path)
        if os.path.isfile(path)
        else sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(path)
            for f in fs
        )
    )
    assert input_file_bytes(SF001, "lineitem") == expected
    assert expected > 0


def test_input_file_bytes_unknown_table_is_zero(spark):
    assert input_file_bytes(SF001, "no_such_table") == 0


def test_tiny_input_gives_fewer_partitions_than_cores(spark):
    # sf0.001 lineitem is well under defaultParallelism * 2 MiB: the pin
    # must back off from one-task-per-core to ceil(bytes / 2 MiB).
    dp = spark.sparkContext.defaultParallelism
    b = input_file_bytes(SF001, "lineitem")
    assert b < dp * (2 << 20)
    p = adaptive_partitions(spark, SF001)
    assert p == -(-b // (2 << 20))
    assert 1 <= p <= dp


def test_unknown_input_falls_back_to_cluster_parallelism(spark):
    dp = spark.sparkContext.defaultParallelism
    assert adaptive_partitions(spark, "/nonexistent/dir") == dp


def test_medium_input_saturates_cluster():
    # A byte count between dp * small and dp * large must pin exactly
    # cluster parallelism (every core busy, no oversizing).
    dp = 32
    assert partitions_for_bytes(dp * (8 << 20), dp) == dp


def test_huge_input_tracks_guide_band_not_cores():
    # 100 TB regime: the count must grow with bytes (ceil(B / 256 MiB)),
    # not stay pinned at the core count.
    dp = 512
    b = 100 << 40  # 100 TiB
    p = partitions_for_bytes(b, dp)
    assert p == -(-b // (256 << 20))
    assert p > dp
    # partitions land in the guide's 100 MB-1 GB band
    assert (100 << 20) <= b // p <= (1 << 30)


def test_monotone_across_sfs(spark):
    # More input bytes can never produce fewer partitions.
    assert adaptive_partitions(spark, SF01) >= adaptive_partitions(
        spark, SF001
    )
