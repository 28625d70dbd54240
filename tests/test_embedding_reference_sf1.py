"""Independent sf1.0 verification for q_dedup_embedding_cosine, whose
DuckDB oracle cannot replay at that scale (2e8 interpreted list-fold
cosines — >40 min of uninterruptible native execution in the r13
sweep). The reference here is numpy, but BIT-EXACT to the engine's
semantics, not approximate: Spark's ``dot``/``norm``
(functions/vectors.py) LEFT-FOLD the products in index order starting
from 0.0, and the loop below reproduces that exact IEEE op sequence —
sequential over the 64 dimensions, vectorized over the 2e8 pairs
(``acc += outer(col_i, col_i)`` performs acc[p,q] += A[p,i]*A[q,i],
the same add in the same order). The quotient, threshold compare and
floor-form 1e-6 quantization are then the same single IEEE ops in both
implementations, so the expected pair set and every cos_sim value are
bit-equal by construction, with no tolerance anywhere.

Opt-in: set PMCS_SF1_HEAVY=1 to run. At the suite's default session
(local[4], 1g heap) the Spark side alone exceeds any sane per-test
budget (the r13 driver run hit the 1200 s wall-clock guard), so the
test only runs when explicitly requested on a box sized for it; it
also skips when the generated .scale/sf1.0 dataset is absent
(gitignored; regenerate with tools/gen_sf1.py). The sf1.0 evidence it
produces is recorded once per round, not on every pytest invocation.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from parallel_monte_carlo_simulations_spark.registry import load_all_queries

SF_DIR = "/root/repo/.scale/sf1.0"

pytestmark = pytest.mark.skipif(
    os.environ.get("PMCS_SF1_HEAVY") != "1"
    or not os.path.exists(os.path.join(SF_DIR, "embeddings.parquet")),
    reason=(
        "sf1.0 heavy test: opt-in with PMCS_SF1_HEAVY=1 and a generated "
        ".scale/sf1.0 dataset (tools/gen_sf1.py); exceeds the per-test "
        "budget at the suite's local[4]/1g session"
    ),
)

SPECS = load_all_queries()
THRESHOLD = 0.45


@pytest.mark.timeout_s(1200)
def test_embedding_cosine_pairs_match_numpy_exact_fold(spark):
    t = pq.read_table(
        os.path.join(SF_DIR, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    vec_ids = np.asarray(t.column("vec_id"))
    # float32 -> float64 cast is exact, same as the engine's as_double.
    a = np.asarray(
        t.column("embedding").combine_chunks().flatten(), dtype=np.float64
    ).reshape(len(vec_ids), -1)
    n, dims = a.shape

    # Exact left-fold norms: sequential over dims (the fold order,
    # starting from 0.0), vectorized over vectors.
    sq = np.zeros(n, dtype=np.float64)
    for i in range(dims):
        sq += a[:, i] * a[:, i]
    nrm = np.sqrt(sq)

    # Candidate pruning with BLAS (pairwise-summed, hence approximate):
    # |pairwise sum - sequential fold| / (na*nb) < dims * eps * cond
    # ~ 1e-14 here, so a 1e-9 margin below the threshold cannot drop a
    # true pair. Exactness comes from re-evaluating candidates below.
    g = a @ a.T
    approx = g / np.outer(nrm, nrm)
    cand = np.argwhere(np.triu(approx >= THRESHOLD - 1e-9, k=1))
    pi, pj = cand[:, 0], cand[:, 1]

    # Exact left-fold dot for every candidate pair: sequential over
    # dims, vectorized over pairs — the identical IEEE add sequence.
    acc = np.zeros(len(pi), dtype=np.float64)
    for i in range(dims):
        acc += a[pi, i] * a[pj, i]
    cos = acc / (nrm[pi] * nrm[pj])  # same single multiply + divide
    keep = cos >= THRESHOLD

    # vec_id order, not row order: the join condition is on vec_id
    ida, idb = vec_ids[pi[keep]], vec_ids[pj[keep]]
    swap = ida > idb
    ida2 = np.where(swap, idb, ida)
    idb2 = np.where(swap, ida, idb)
    q = np.floor(cos[keep] * 1e6 + 0.5) / 1e6
    expected = {
        (int(x), int(y)): float(c) for x, y, c in zip(ida2, idb2, q)
    }

    rows = SPECS["q_dedup_embedding_cosine"].fn(spark, SF_DIR).collect()
    got = {(r["vec_a"], r["vec_b"]): r["cos_sim"] for r in rows}
    assert len(rows) == len(got), "duplicate pairs in Spark output"
    assert len(got) == len(expected), (len(got), len(expected))
    # exact equality — both sides executed the identical IEEE sequence
    mism = [
        k
        for k in expected
        if k not in got or got[k] != expected[k]
    ]
    assert mism == [], f"{len(mism)} mismatching pairs, e.g. {mism[:5]}"
