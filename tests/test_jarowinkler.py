"""Property tests: the from-scratch Jaro-Winkler kernel must agree with
DuckDB's independent C++ implementation on arbitrary strings."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parallel_monte_carlo_simulations_spark.operators.jarowinkler import jaro_winkler

_ALPHA = "abcde "  # small alphabet maximizes collisions/transpositions


def _duck_jw(a: str, b: str) -> float:
    return duckdb.sql(
        "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchone()[0]


@given(
    st.text(alphabet=_ALPHA, max_size=24),
    st.text(alphabet=_ALPHA, max_size=24),
)
@settings(max_examples=200, deadline=None)
def test_matches_duckdb_random(a, b):
    assert jaro_winkler(a, b) == pytest.approx(_duck_jw(a, b), abs=1e-12)


@pytest.mark.parametrize(
    ("a", "b"),
    [
        ("", ""),
        ("", "abc"),
        ("abc", ""),
        ("same", "same"),
        ("ab", "ba"),  # window 0: no matches at all
        ("abcdef", "fedcba"),
        ("MARTHA", "MARHTA"),  # the canonical transposition example
        ("DIXON", "DICKSONX"),
        ("CRATE", "TRACE"),  # jaro > 0.7 but zero shared prefix
        ("prefixion", "prefixes"),  # boost capped at 4 prefix chars
    ],
)
def test_matches_duckdb_edge_cases(a, b):
    assert jaro_winkler(a, b) == pytest.approx(_duck_jw(a, b), abs=1e-12)


def test_symmetry_and_bounds():
    pairs = [("abcab", "bacba"), ("aa bb cc", "aabbcc"), ("x", "yx")]
    for a, b in pairs:
        assert jaro_winkler(a, b) == jaro_winkler(b, a)
        assert 0.0 <= jaro_winkler(a, b) <= 1.0
