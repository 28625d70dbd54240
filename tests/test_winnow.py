"""Winnowing correctness: the per-position window-function reformulation
in dedup/winnow.py must select EXACTLY the fingerprints the reference
robust-winnowing algorithm (Schleimer et al. 2003, Fig. 5 semantics)
selects, and the density guarantee must hold on real data.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from parallel_monte_carlo_simulations_spark.dedup.winnow import (
    W_WINDOW,
    _fingerprints,
)

SF = "/root/testdata/sf0.001"


def _reference_winnow(hashes: list[int], w: int) -> set[int]:
    """Reference robust winnowing: per window of w consecutive hashes,
    select the minimum, rightmost on ties. Returns selected 1-based
    positions. Only full windows (matches the operator's guard)."""
    selected: set[int] = set()
    for end in range(w, len(hashes) + 1):  # window = [end-w+1 .. end]
        window = hashes[end - w : end]
        m = min(window)
        # rightmost minimal position within the window
        off = max(i for i, h in enumerate(window) if h == m)
        selected.add(end - w + 1 + off)
    return selected


def _formula_winnow(hashes: list[int], w: int) -> set[int]:
    """The per-position disjunction dedup/winnow.py evaluates with
    window frames: q selected iff for some lag j in [0, w-1] with a
    full window ending at q+j, h(q) < min of the j following hashes
    and h(q) <= min of the w-1-j preceding hashes."""
    n = len(hashes)
    selected: set[int] = set()
    for q in range(1, n + 1):
        h = hashes[q - 1]
        for j in range(w):
            p = q + j
            if p > n or p < w:
                continue
            following = hashes[q : q + j]  # positions q+1 .. q+j
            preceding = hashes[max(0, p - w) : q - 1]  # p-w+1 .. q-1
            if following and h >= min(following):
                continue
            if preceding and h > min(preceding):
                continue
            selected.add(q)
            break
    return selected


@given(
    st.lists(st.integers(min_value=0, max_value=12), min_size=4, max_size=40),
    st.integers(min_value=2, max_value=6),
)
@settings(max_examples=300, deadline=None)
def test_formula_matches_reference(hashes, w):
    """The window-frame disjunction == the reference algorithm, for any
    hash sequence (small value range forces heavy tie coverage) and any
    window size."""
    assert _formula_winnow(hashes, w) == _reference_winnow(hashes, w)


def test_density_guarantee_on_real_data(spark):
    """Every full window of W consecutive k-grams contains at least one
    selected fingerprint — the winnowing guarantee that makes shared
    passages of w+k-1 words detectable."""
    fp = _fingerprints(spark, SF)
    gaps = (
        fp.withColumn(
            "prev",
            F.lag("pos").over(Window.partitionBy("doc_id").orderBy("pos")),
        )
        .filter(F.col("prev").isNotNull())
        .filter(F.col("pos") - F.col("prev") > W_WINDOW)
        .count()
    )
    assert gaps == 0
    assert fp.count() > 0
