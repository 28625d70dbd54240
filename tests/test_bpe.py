"""Hand-computed BPE expectations (r12): the oracle gate proves the
engine and DuckDB agree; this proves they agree on the RIGHT answer.
The corpus is built so every merge round's winner, the greedy
left-to-right overlap behavior ([a,a,a,a] -> [a_a, a_a]), the
lexicographic tie-break, and the encode histogram are all derivable by
hand."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from parallel_monte_carlo_simulations_spark.registry import load_all_queries

SPECS = load_all_queries()

#: round 1: (a,a) and (x,y) both count 3 -> lexicographic tie-break
#: picks (a,a); greedy keeps even offsets so "a a a a" -> [a_a, a_a].
#: round 2: (x,y)=3 wins -> doc1 [x_y,x_y,z], doc2 [x_y,q].
#: round 3: all pairs count 1 -> (a_a,a_a) lexicographically first
#: -> doc3 [a_a_a_a].
DOCS = {
    "doc_id": [1, 2, 3],
    "text": ["x y x y z", "x y q", "a a a a"],
}


def _sf(tmp_path) -> str:
    pq.write_table(
        pa.table(DOCS), os.path.join(tmp_path, "documents.parquet")
    )
    return str(tmp_path)


def test_merge_rounds_hand_computed(spark, tmp_path):
    rows = {
        r["merge_round"]: r
        for r in SPECS["q_bpe_phrase_merges"].fn(spark, _sf(tmp_path)).collect()
    }
    assert (rows[1]["pair_a"], rows[1]["pair_b"], rows[1]["pair_count"]) == (
        "a", "a", 3,
    )
    assert rows[1]["tokens_after"] == 10  # 5 + 3 + 2
    assert (rows[2]["pair_a"], rows[2]["pair_b"], rows[2]["pair_count"]) == (
        "x", "y", 3,
    )
    assert rows[2]["tokens_after"] == 7  # 3 + 2 + 2
    assert (rows[3]["pair_a"], rows[3]["pair_b"], rows[3]["pair_count"]) == (
        "a_a", "a_a", 1,
    )
    assert rows[3]["tokens_after"] == 6  # 3 + 2 + 1


def test_encode_histogram_hand_computed(spark, tmp_path):
    out = SPECS["q_bpe_encode"].fn(spark, _sf(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bucket"] == 0
    assert r["n_docs"] == 3
    assert r["tokens_before"] == 12
    assert r["tokens_after"] == 6
    # merged tokens: doc1 [x_y, x_y, z] -> 2, doc2 [x_y, q] -> 1,
    # doc3 [a_a_a_a] -> 1
    assert r["merged_tokens"] == 4
    assert r["compression"] == 0.5
