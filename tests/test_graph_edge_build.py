"""Focused tests for the r13 round-2 single-edge-exchange graph build.

The restructured q_graph_pagerank / q_graph_ppr setup derives the node
set from the outdegree table instead of a separate distinct over the
full edge frame. That is only sound because BOTH edge directions are
materialized, so every node appears at least once as a src — these
tests pin that property and the end-to-end invariants that depend on
it on real driver testdata.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_monte_carlo_simulations_spark.operators.graph import (
    _PART_OFFSET,
    q_graph_pagerank,
)
from parallel_monte_carlo_simulations_spark.operators.graph2 import q_graph_ppr
from parallel_monte_carlo_simulations_spark.tables import table

SF = "/root/testdata/sf0.001"


def _edges(spark):
    pairs = (
        table(spark, SF, "lineitem")
        .select(
            F.col("l_suppkey").alias("s"),
            (F.col("l_partkey") + _PART_OFFSET).alias("p"),
        )
        .distinct()
    )
    return pairs.select(F.col("s").alias("src"), F.col("p").alias("dst")).unionByName(
        pairs.select(F.col("p").alias("src"), F.col("s").alias("dst"))
    )


def test_outdeg_keys_are_the_distinct_node_set(spark):
    """src-set == src ∪ dst set: the outdeg table's key column IS the
    node set, so replacing the nodes-distinct subtree with
    outdeg.select(src) loses no node and invents none."""
    edges = _edges(spark)
    srcs = {r.src for r in edges.select("src").distinct().collect()}
    nodes = {
        r.node
        for r in edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .collect()
    }
    assert srcs == nodes and len(nodes) > 0


def test_pagerank_covers_every_node_and_conserves_mass(spark):
    """One output row per node, and the unnormalized formulation's mass
    invariant (ranks sum to the node count) still holds after the
    edge-build restructure."""
    edges = _edges(spark)
    n_nodes = edges.select("src").distinct().count()
    out = q_graph_pagerank(spark, SF)
    rows = out.collect()
    assert len(rows) == n_nodes
    assert len({r.node for r in rows}) == n_nodes
    total = sum(r.rank for r in rows)
    # ranks are 1e-4-quantized, so the conserved sum is exact to n*1e-4
    assert abs(total - n_nodes) <= n_nodes * 1e-4 + 1e-6


def test_ppr_covers_every_node_and_masses_bounded(spark):
    edges = _edges(spark)
    n_nodes = edges.select("src").distinct().count()
    rows = q_graph_ppr(spark, SF).collect()
    assert len(rows) == n_nodes
    assert all(r.rank >= 0.0 for r in rows)
    # personalized mass leaks only through quantization: sum <= 1 + eps
    assert sum(r.rank for r in rows) <= 1.0 + n_nodes * 1e-6
