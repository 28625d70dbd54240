"""CUSUM changepoint unit properties: the split-form half-up division
both engines evaluate — double(whole) + double(frac4)/1e4 with whole and
frac4 exact BIGINTs — must equal decimal ROUND_HALF_UP for every
quotient below 2^53 (~9.0e15), including exact ties at the 5th decimal
(the case where double ROUND and decimal-division scales disagree
cross-engine).

Why the bound is 2^53 on the QUOTIENT and not on num*1e4: the old
single-division form (whole*10000 + frac) / 1e4 double-rounds once the
scaled integer exceeds 2^53 (num ~ 9e11 already breaks:
14411518807587.002 != 14411518807587.0 — the round-7 red test). The
split form keeps whole exactly representable and adds a fraction in
[0, 1]; a decimal fraction k/1e4 that is not exactly a dyadic rational
sits at least 1/(1e4 * 2^j) ~ 1e-7 from any half-ulp boundary of the
sum, nine orders above the single 1e-16 rounding error of frac/1e4, so
the addition rounds identically to the correctly-rounded single
conversion. DECIMAL(18,4) output was rejected after measurement: DuckDB
evaluates decimal division and decimal->double casts through doubles
(double-rounded), and fetchdf degrades DECIMAL columns to float64, so a
decimal output type would break cross-engine hashing, not fix it.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st


def _rdiv_int(num: int, den: int) -> float:
    """Mirror of the SQL expression in operators/changepoint.py:
    float(num div den) + float(((num % den)*20000 + den) div (2*den))
    / 1e4 — whole and 4-digit half-up fraction combined in ONE rounded
    addition, never a >2^53 scaled integer."""
    whole = num // den
    frac = ((num % den) * 20000 + den) // (2 * den)
    return float(whole) + float(frac) / 10000.0


@given(
    st.integers(min_value=0, max_value=8 * 10**15),
    st.integers(min_value=1, max_value=10**7),
)
@settings(max_examples=500, deadline=None)
def test_integer_round_half_up_matches_decimal(num, den):
    # Exactness contract: valid while the quotient stays below 2^53.
    # num <= 8e15 with den >= 1 keeps whole <= 8e15 < 2^53 always.
    expect = float(
        (Decimal(num) / Decimal(den)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
    )
    assert _rdiv_int(num, den) == expect


def test_round7_falsifier_now_exact():
    # The round-7 red-test case: single-division form returned
    # 14411518807587.002; the split form is exact.
    assert _rdiv_int(14_411_518_807_587, 1) == 14411518807587.0


def test_exact_tie_rounds_up():
    # 3031.93875 — the observed cross-engine disagreement case.
    # num/den = 2728744875/900000 hits the .93875 tie exactly.
    assert _rdiv_int(2728744875, 900000) == 3031.9388


def test_fraction_carry_to_next_whole():
    # remainder/den >= 0.99995 rounds the fraction to exactly 10000;
    # whole + 10000/1e4 must land on whole+1 exactly.
    assert _rdiv_int(99995, 100000) == 1.0  # 0.99995 -> carries
    assert _rdiv_int(12345 * 100000 + 99995, 100000) == 12346.0
