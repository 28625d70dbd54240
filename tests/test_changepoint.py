"""CUSUM changepoint unit properties: the string-form half-up division
both engines evaluate — exact BIGINT 4-digit half-up quantization, one
correctly-rounded string->double cast — must equal decimal
ROUND_HALF_UP at any magnitude, including exact ties at the 5th decimal
(the case where double ROUND and decimal-division scales disagree
cross-engine).

Form history (each prior form has its falsifier pinned below):
- (whole*10000 + frac) / 1e4 double-rounds once the scaled integer
  exceeds 2^53 (num ~ 9e11 already breaks: 14411518807587.002 !=
  14411518807587.0 — the round-7 red test);
- double(whole) + double(frac4)/1e4 (the r8 split form) claimed
  correctness below 2^53 quotients, but the final ADDITION is a second
  rounding: decimal values k/1e4 can sit ~5e-20 from a dyadic half-ulp
  boundary of the sum, far inside the ~1.4e-17 representation error of
  frac/1e4 — Hypothesis falsifier 85612902/9281852 -> one ulp high of
  9.2237 (the round-10 red test);
- the string form "<whole>.<frac:04d>" parsed to double is correctly
  rounded by construction in both engines (Java Double.parseDouble,
  DuckDB fast_float) — the single rounding the discipline wants.
DECIMAL(18,4) output was rejected after measurement: DuckDB evaluates
decimal division and decimal->double casts through doubles
(double-rounded), and fetchdf degrades DECIMAL columns to float64, so a
decimal output type would break cross-engine hashing, not fix it.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st


def _rdiv_int(num: int, den: int) -> float:
    """Mirror of rdiv_halfup_expr (functions/microunit.py): exact
    BIGINT half-up 4-digit quantization (fraction carry folded into
    the whole part), one correctly-rounded string->double parse."""
    frac0 = ((num % den) * 20000 + den) // (2 * den)
    whole = num // den + frac0 // 10000
    return float(f"{whole}.{frac0 % 10000:04d}")


@given(
    st.integers(min_value=0, max_value=10**18),
    st.integers(min_value=1, max_value=10**7),
)
@settings(max_examples=500, deadline=None)
def test_integer_round_half_up_matches_decimal(num, den):
    # Exactness contract: any magnitude — string parse is the single
    # correctly-rounded step.
    expect = float(
        (Decimal(num) / Decimal(den)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
    )
    assert _rdiv_int(num, den) == expect


def test_round7_falsifier_now_exact():
    # The round-7 red-test case: single-division form returned
    # 14411518807587.002; the string form is exact.
    assert _rdiv_int(14_411_518_807_587, 1) == 14411518807587.0


def test_round10_falsifier_now_exact():
    # The round-10 red-test case: split form returned
    # 9.223700000000001 (one ulp high); the string form is exact.
    assert _rdiv_int(85_612_902, 9_281_852) == 9.2237


def test_exact_tie_rounds_up():
    # 3031.93875 — the observed cross-engine disagreement case.
    # num/den = 2728744875/900000 hits the .93875 tie exactly.
    assert _rdiv_int(2728744875, 900000) == 3031.9388


def test_fraction_carry_to_next_whole():
    # remainder/den >= 0.99995 rounds the fraction to exactly 10000;
    # whole + 10000/1e4 must land on whole+1 exactly.
    assert _rdiv_int(99995, 100000) == 1.0  # 0.99995 -> carries
    assert _rdiv_int(12345 * 100000 + 99995, 100000) == 12346.0
