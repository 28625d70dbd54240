"""The prefix-filter join's distinct-set-growth pre-flight guard.

Round-8's sf1.0 ladder showed the bitmask |V| <= 62 guard is necessary
but not sufficient: a corpus whose tokens identify documents (URLs,
copy suffixes) keeps minting NEW distinct token sets without growing
the vocabulary, and the set-pair space — not the vocabulary — is what
the join's cost is quadratic in (3,935 -> 39,350 sets meant 1.55e9
pairs and a 28-minute DNF). The round-9 fix is a pre-flight budget on
the exact candidate count the join would perform, failing in seconds
with the MinHash scale path named. These tests pin both edges:

- under budget: the guard is invisible (same rows as before the guard);
- over budget: the job dies fast, and the error names the escape hatch.
"""

from __future__ import annotations

import time

import pytest

from parallel_monte_carlo_simulations_spark.dedup import prefixjoin
from parallel_monte_carlo_simulations_spark.dedup.prefixjoin import (
    q_dedup_prefix_filter_join,
)

SF_SMALL = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_guard_invisible_under_budget(spark):
    # The real sf0.001 corpus is far under budget: the query must run
    # exactly as before the guard (rows > 0, schema intact). Value
    # parity vs the DuckDB oracle is tests/test_oracle.py's job.
    out = q_dedup_prefix_filter_join(spark, SF_SMALL).collect()
    assert len(out) > 0
    assert {r.jaccard >= 0.7 for r in out} == {True}


def test_guard_fires_fast_on_nonsaturating_sets(spark, tmp_path, monkeypatch):
    # 62-token vocabulary (passes the |V| guard) but every doc is a
    # fresh random ~20-subset, so distinct sets ~ corpus size: the
    # exact failure geometry the tiled sf1.0 corpus exposed. With the
    # budget pinned low the guard must kill the job in seconds, long
    # before the join would finish, and the message must point the
    # user at the MinHash scale path.
    import random

    rng = random.Random(9)
    vocab = [f"w{i:02d}" for i in range(62)]
    rows = [
        (i, " ".join(sorted(rng.sample(vocab, 20)))) for i in range(3000)
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    monkeypatch.setattr(prefixjoin, "_PAIR_BUDGET", 100_000)

    t0 = time.monotonic()
    with pytest.raises(Exception, match="q_dedup_minhash_lsh"):
        q_dedup_prefix_filter_join(spark, sf_dir).collect()
    assert time.monotonic() - t0 < 60


def test_vocab_guard_still_fires(spark, tmp_path):
    # The original vocabulary-axis guard is untouched: 63 distinct
    # tokens must still raise.
    rows = [(i, f"t{i:02d} shared") for i in range(62)]
    sf_dir = _write_docs(spark, tmp_path, rows)
    with pytest.raises(Exception, match="62"):
        q_dedup_prefix_filter_join(spark, sf_dir).collect()
