"""CUSUM changepoint unit properties: the pure-integer half-up division
both engines evaluate must equal decimal round-half-up for any positive
rational, including exact ties at the 5th decimal (the case where
double ROUND and decimal-division scales disagree cross-engine)."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st


def _rdiv_int(num: int, den: int) -> float:
    """Mirror of the SQL expression in operators/changepoint.py:
    (num div den)*10000 + ((num % den)*20000 + den) div (2*den),
    all integer, then /1e4."""
    whole = num // den
    frac = ((num % den) * 20000 + den) // (2 * den)
    return (whole * 10000 + frac) / 10000.0


@given(
    st.integers(min_value=0, max_value=10**14),
    st.integers(min_value=1, max_value=10**7),
)
@settings(max_examples=500, deadline=None)
def test_integer_round_half_up_matches_decimal(num, den):
    expect = float(
        (Decimal(num) / Decimal(den)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
    )
    assert _rdiv_int(num, den) == expect


def test_exact_tie_rounds_up():
    # 3031.93875 — the observed cross-engine disagreement case.
    # num/den = 2728744875/900000 hits the .93875 tie exactly.
    assert _rdiv_int(2728744875, 900000) == 3031.9388
