"""Shared micro-unit integer arithmetic helpers + the 2^53 fence.

The repo-wide cross-engine float discipline is "exact BIGINT micro-unit
arithmetic, one final rounded conversion to double" (SCALING.md,
"Cross-engine float discipline"). That conversion is only correctly
rounded while the integer being converted stays below 2^53 — beyond it
the BIGINT->double cast itself rounds and a following division rounds
AGAIN (double rounding). Round 7's red property test caught exactly
this in the changepoint operator (scaled quotient 1.44e17:
14411518807587.002 != 14411518807587.0).

Two tools, used by every micro-unit site:

``rdiv_halfup_expr`` / ``rdiv_halfup_duck``
    The STRING-FORM half-up division: compute the half-up 4-digit
    quantization exactly in BIGINT arithmetic (whole + fraction with
    carry), render it as the decimal string ``"<whole>.<frac:04d>"``,
    and CAST the string to DOUBLE. String->double parsing is correctly
    rounded in BOTH engines (Java ``Double.parseDouble`` on the Spark
    side, fast_float in DuckDB), so the result equals
    ``float(Decimal ROUND_HALF_UP quantize)`` at ANY magnitude — no
    2^53 qualifier for this site (property-tested in
    tests/test_microunit.py).

    History: the previous SPLIT form ``double(whole)+double(frac)/1e4``
    claimed the same contract for quotients below 2^53, but the claim
    was FALSE: the final addition is a second rounding, and when the
    exact value sits within ~1.4e-17 of a half-ulp boundary of the sum
    (possible: decimal fractions k/1e4 approach dyadic midpoints as
    closely as ~5e-20) the two-step result lands one ulp off the
    correctly-rounded conversion. Hypothesis found 85612902/9281852 ->
    9.2237: split form 9.223700000000001, correct 9.2237. Cross-engine
    hashing never broke (both engines evaluated the identical IEEE op
    sequence), but the documented Decimal contract did. DECIMAL output
    remains REJECTED for the reasons measured in round 8: DuckDB
    evaluates decimal division and decimal->double casts through
    doubles (double-rounded), and ``fetchdf`` degrades DECIMAL columns
    to float64.

``guard_exact_bigint``
    A loud runtime fence for micro-unit SUMS: wraps a BIGINT column so
    the query FAILS (Spark ``assert_true``) the moment an aggregate
    leaves the exactly-representable double range, instead of silently
    shipping a double-rounded value. Costs one comparison per row of
    the (already tiny) aggregated frame. Applied at every
    ``SUM(micro_units)/10^k`` site: operators/closeness.py,
    similarity/irmetrics.py (static bound — see the module asserts
    there), operators/survival.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Largest double-exact integer: every |n| < 2^53 round-trips exactly.
EXACT_DOUBLE_MAX = 2**53


def rdiv_halfup_expr(num: str, den: str) -> Column:
    """Spark Column for string-form half-up division of SQL expressions
    ``num`` / ``den`` (BIGINT-typed, num >= 0, den > 0): exact 4-digit
    half-up quantization in BIGINT (fraction in [0,10000] with carry
    folded into the whole part), one correctly-rounded string->double
    cast."""
    # frac0 in [0, 10000]; the ==10000 carry folds into the whole part.
    # The whole part is NEVER scaled by 1e4 (that would re-shrink the
    # BIGINT-exact domain to ~9e14 quotients); max intermediate is
    # (num % den) * 20000 < den * 2e4.
    frac0 = f"(((({num}) % ({den})) * 20000 + ({den})) div (2 * ({den})))"
    return F.expr(
        f"cast(concat("
        f"cast(({num}) div ({den}) + {frac0} div 10000 as string), '.',"
        f" lpad(cast({frac0} % 10000 as string), 4, '0')) as double)"
    )


def rdiv_halfup_duck(num: str, den: str) -> str:
    """DuckDB SQL text for the identical string-form division.

    Inputs are CAST to BIGINT first: DuckDB types small integer
    LITERALS as INT32, and ``(num % den) * 20000`` then overflows
    INT32 for remainders above ~107k (Hypothesis-found; column inputs
    were already BIGINT and unaffected)."""
    n, d = f"CAST(({num}) AS BIGINT)", f"CAST(({den}) AS BIGINT)"
    frac0 = f"((({n} % {d}) * 20000 + {d}) // (2 * {d}))"
    return (
        f"CAST(CONCAT("
        f"CAST({n} // {d} + {frac0} // 10000 AS VARCHAR), '.',"
        f" LPAD(CAST({frac0} % 10000 AS VARCHAR), 4, '0')) AS DOUBLE)"
    )


def guard_abs_lt(col: Column, bound, site: str) -> Column:
    """Pass ``col`` through unchanged, but fail the query with a named
    error if |col| >= bound — the fence that keeps 'exact micro-units,
    one rounded division' an enforced invariant, not an assumption."""
    ok = F.abs(col) < F.lit(bound)
    msg = F.lit(
        f"{site}: micro-unit aggregate left the double-exact range "
        f"(|x| >= {bound}); the final double conversion would "
        "double-round. Lower the unit scale or switch this site to "
        "split-form/decimal before trusting output."
    )
    # assert_true returns NULL (VOID) when ok, raises otherwise;
    # coalesce(VOID, col) type-coerces to col's type and keeps the plan
    # a pure projection (no extra shuffle, negligible cost on the
    # already-aggregated frame).
    return F.coalesce(F.assert_true(ok, msg), col)


def guard_exact_bigint(col: Column, site: str) -> Column:
    """``guard_abs_lt`` at the 2^53 bound, for BIGINT micro-unit sums
    that are about to be divided as doubles."""
    return guard_abs_lt(col, EXACT_DOUBLE_MAX, site)
