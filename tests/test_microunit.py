"""Shared 2^53 fence tests (functions/microunit.py).

The repo-wide discipline is 'exact BIGINT micro-units, one final
rounded division'. These tests pin BOTH halves of that contract:

1. the string-form half-up division is correctly rounded — equal to
   float(Decimal ROUND_HALF_UP) — at ANY magnitude (string->double
   parse is correctly rounded in both engines), in the Python mirror
   AND in both engines' SQL. The pre-r10 split form
   double(whole)+double(frac)/1e4 claimed this only below 2^53 and was
   still wrong: the final addition is a second rounding, falsified by
   85612902/9281852 -> 9.223700000000001 vs 9.2237 (pinned below);
2. guard_abs_lt / guard_exact_bigint pass values through unchanged
   inside the bound and fail LOUDLY outside it.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parallel_monte_carlo_simulations_spark.functions.microunit import (
    EXACT_DOUBLE_MAX,
    guard_exact_bigint,
    rdiv_halfup_duck,
    rdiv_halfup_expr,
)


def _mirror(num: int, den: int) -> float:
    frac0 = ((num % den) * 20000 + den) // (2 * den)
    whole = num // den + frac0 // 10000
    return float(f"{whole}.{frac0 % 10000:04d}")


@given(
    st.integers(min_value=0, max_value=10**18),
    st.integers(min_value=1, max_value=10**7),
)
@settings(max_examples=500, deadline=None)
def test_string_form_matches_decimal_halfup(num, den):
    expect = float(
        (Decimal(num) / Decimal(den)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
    )
    assert _mirror(num, den) == expect


def test_split_form_falsifier_now_exact():
    # The Hypothesis-found counterexample that killed the r8 split
    # form: exact quotient quantizes to 9.2237, which sits within
    # ~1.4e-17 of a half-ulp boundary of the double sum, so
    # float(9) + float(2237)/1e4 landed one ulp high.
    num, den = 85_612_902, 9_281_852
    assert float(9) + float(2237) / 1e4 != _mirror(num, den)  # the bug
    assert _mirror(num, den) == 9.2237


@given(
    st.integers(min_value=0, max_value=10**18),
    st.integers(min_value=1, max_value=10**6),
)
@settings(max_examples=50, deadline=None)
def test_duckdb_sql_matches_mirror(num, den):
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {rdiv_halfup_duck(str(num), str(den))} AS v"
    ).fetchone()[0]
    con.close()
    assert got == _mirror(num, den)


def test_spark_sql_matches_mirror(spark):
    cases = [
        (14_411_518_807_587, 1),  # the round-7 falsifier
        (2_728_744_875, 900_000),  # exact .93875 tie
        (99_995, 100_000),  # fraction carries to the next whole
        (85_612_902, 9_281_852),  # the r10 split-form falsifier
        (8 * 10**15, 1),
        (7_777_777_777_777_777, 3),
        (10**18, 7),  # beyond 2^53: string parse still exact
        (0, 5),
    ]
    df = spark.createDataFrame(cases, "num long, den long").select(
        "num", "den", rdiv_halfup_expr("num", "den").alias("v")
    )
    for row in df.collect():
        assert row.v == _mirror(row.num, row.den), (row.num, row.den)


def test_guard_passes_in_range(spark):
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        guard_exact_bigint(F.lit(EXACT_DOUBLE_MAX - 1), "test.site").alias(
            "v"
        )
    )
    assert df.collect()[0].v == EXACT_DOUBLE_MAX - 1


def test_guard_fails_loudly_out_of_range(spark):
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        guard_exact_bigint(F.lit(EXACT_DOUBLE_MAX), "test.site").alias("v")
    )
    with pytest.raises(Exception, match="test.site"):
        df.collect()
