"""Brownian-bridge QMC path construction, exactly oracled.

The classic QMC variance-reduction construction: instead of building a
Brownian path increment-by-increment, fill it by BISECTION — the first
quasi-random dimension drives the terminal point W(T) (which carries
most of the payoff variance), later dimensions fill conditional
midpoints with shrinking variance. Low-discrepancy sequences are most
uniform in their leading dimensions, so bridging concentrates their
quality where it matters; this is the standard pairing for QMC option
pricing (Glasserman, "Monte Carlo Methods in Financial Engineering",
ch. 5).

Four monitoring dates t = T/4, T/2, 3T/4, T with the bridge recursion

    W(T)    = sqrt(T)   * z1
    W(T/2)  = W(T)/2    + sqrt(T/4) * z2
    W(T/4)  = W(T/2)/2  + sqrt(T/8) * z3
    W(3T/4) = (W(T/2) + W(T))/2 + sqrt(T/8) * z4

where each z is a stratified normal driven by a Halton uniform (the
LSMC discipline: 8 equiprobable strata, conditional-mean literals).
All coefficients are Python-computed double literals in ONE shared SQL
text, so W values are bit-identical cross-engine; spot prices use
exp(), whose engine libms may differ in the final ulp — outputs are
therefore AGGREGATES ONLY (no per-path threshold decisions), where the
accumulated ulp noise is ~1e-10, far inside the quantization.

Priced: an arithmetic-average Asian call (the payoff bridging exists
for) plus the terminal mean as a martingale sanity (≈ S0·e^{rT}).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from .lsmc import (
    N_STRATA,
    _lit,
    _quant,
    _radical_inverse,
    _stratum_means,
)

N_PATHS = 8192
S0, STRIKE = 100.0, 102.0
RATE, SIGMA = 0.04, 0.25
T = 1.0
_BASES_DIGITS = ((2, 13), (3, 9), (5, 6), (7, 5))  # cover N_PATHS=8192


def _z_case(u_expr: str) -> str:
    """Stratified standard normal from a uniform: stratum = floor(u*K),
    value = the stratum's conditional mean (literal)."""
    whens = " ".join(
        f"WHEN {j} THEN {_lit(q)}" for j, q in enumerate(_stratum_means(N_STRATA))
    )
    return (
        f"(CASE CAST(FLOOR({u_expr} * {N_STRATA}) AS INTEGER) {whens} END)"
    )


def bridge_body() -> str:
    """Shared SQL text over an ``idx(i)`` CTE."""
    zs = {
        t + 1: _z_case(_radical_inverse("i + 1", b, d))
        for t, (b, d) in enumerate(_BASES_DIGITS)
    }
    # bridge levels (times T/4 .. T), built as chained CTE columns
    w_t = f"({_lit(math.sqrt(T))} * z1)"
    w_half = f"(wT / 2.0e0 + {_lit(math.sqrt(T / 4))} * z2)"
    w_q1 = f"(wH / 2.0e0 + {_lit(math.sqrt(T / 8))} * z3)"
    w_q3 = f"((wH + wT) / 2.0e0 + {_lit(math.sqrt(T / 8))} * z4)"

    def spot(w: str, t: float) -> str:
        drift = (RATE - 0.5 * SIGMA * SIGMA) * t
        return f"({_lit(S0)} * EXP({_lit(drift)} + {_lit(SIGMA)} * {w}))"

    s1, s2 = spot("wQ1", T / 4), spot("wH", T / 2)
    s3, s4 = spot("wQ3", 3 * T / 4), spot("wT", T)
    avg_s = f"(({s1} + {s2} + {s3} + {s4}) / 4.0e0)"
    payoff = f"GREATEST({avg_s} - {_lit(STRIKE)}, 0.0e0)"
    disc = _lit(math.exp(-RATE * T))
    return f"""WITH zcols AS (
  SELECT i, {zs[1]} AS z1, {zs[2]} AS z2, {zs[3]} AS z3, {zs[4]} AS z4
  FROM idx
),
w1 AS (SELECT *, {w_t} AS wT FROM zcols),
w2 AS (SELECT *, {w_half} AS wH FROM w1),
w3 AS (SELECT *, {w_q1} AS wQ1, {w_q3} AS wQ3 FROM w2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_paths,
       {_quant(f"AVG({s4})", 10_000)} AS mean_terminal,
       {_quant(f"{disc} * AVG({payoff})", 10_000)} AS asian_call_price
FROM w3"""


def _oracle() -> str:
    body = bridge_body().replace(" DIV ", " // ")
    return (
        f"WITH idx AS (SELECT unnest(range(0, {N_PATHS})) AS i)\n, "
        + body[len("WITH ") :]
    )


@register(
    "q_mc_brownian_bridge",
    oracle=_oracle(),
    description=(
        "Brownian-bridge QMC: bisection path construction (terminal "
        "first, conditional midpoints after) pricing an arithmetic "
        "Asian call — exactly oracled via the shared-SQL discipline"
    ),
    tags=("mc", "qmc", "brownian_bridge", "finance", "deterministic"),
)
def q_mc_brownian_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    body = bridge_body()
    return spark.sql(
        f"WITH idx AS (SELECT id AS i FROM range({N_PATHS}))\n, "
        + body[len("WITH ") :]
    )
