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
    The SPLIT-FORM half-up division: whole and the 4-digit half-up
    fraction stay SEPARATE BIGINTs and combine as
    ``double(whole) + double(frac)/1e4``. Correctly rounded — equal to
    ``float(Decimal ROUND_HALF_UP quantize)`` — for every quotient
    below 2^53 (~9.0e15), because a non-dyadic decimal fraction k/1e4
    sits >= ~1e-7 from any half-ulp boundary of the sum, nine orders
    above the single 1e-16 rounding error of frac/1e4 (property-tested
    in tests/test_microunit.py across the full domain). DECIMAL output
    was measured and REJECTED: DuckDB evaluates decimal division and
    decimal->double casts through doubles (double-rounded), and
    ``fetchdf`` degrades DECIMAL columns to float64.

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
    """Spark Column for split-form half-up division of SQL expressions
    ``num`` / ``den`` (BIGINT-typed, num >= 0, den > 0)."""
    return F.expr(
        f"cast(({num}) div ({den}) as double)"
        f" + cast(((({num}) % ({den})) * 20000 + ({den}))"
        f"        div (2 * ({den})) as double) / 10000.0"
    )


def rdiv_halfup_duck(num: str, den: str) -> str:
    """DuckDB SQL text for the identical split-form division.

    Inputs are CAST to BIGINT first: DuckDB types small integer
    LITERALS as INT32, and ``(num % den) * 20000`` then overflows
    INT32 for remainders above ~107k (Hypothesis-found; column inputs
    were already BIGINT and unaffected)."""
    n, d = f"CAST(({num}) AS BIGINT)", f"CAST(({den}) AS BIGINT)"
    return (
        f"(CAST({n} // {d} AS DOUBLE)"
        f" + CAST((({n} % {d}) * 20000 + {d})"
        f"        // (2 * {d}) AS DOUBLE) / 10000.0)"
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
