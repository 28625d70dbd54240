"""Exactly-oracled QMC twin of the random-walk drawdown analytics.

``q_mc_walk_drawdown`` (queries.py) composes MC simulation with the
max-drawdown window — rows-only, because its Philox draws cannot be
replayed in SQL. This twin verifies the IDENTICAL analytics machinery
(per-path cumulative sum -> running peak -> max drawdown) on the
discretized-QMC path construction of ``lsmc.py``:

- per (path, step) uniform = Cranley-Patterson rotation: base-2
  radical inverse of the step, shifted mod 1 by the base-3 radical
  inverse of the path (pure integer-and-literal arithmetic);
- the step increment is the stratum conditional mean E[Z | stratum],
  quantized to a DECIMAL(29,9) literal — so every cumulative sum,
  running peak, and drawdown is EXACT DECIMAL arithmetic end to end
  (no float drift to quantize away: windowed decimal sums are
  order-fixed by the frame and exact regardless of the engine's
  internal segment-tree association);
- outputs: per-path max drawdown aggregated to count / mean / max and
  the share of paths with drawdown above 2.0 — one shared SQL text for
  both engines.

Scale: (path x step) rows from one ``range`` source, window partitioned
by path — embarrassingly parallel; only the final handful of aggregates
crosses the wire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from .lsmc import _radical_inverse, _stratum_means

N_PATHS = 1024
N_STEPS = 32
N_STRATA = 8
_Q = _stratum_means(N_STRATA)


def _inc_case() -> str:
    """Stratum-mean increment as an exact DECIMAL(29,9) literal CASE."""
    whens = " ".join(
        f"WHEN {j} THEN CAST({round(v, 9)!r} AS DECIMAL(29,9))"
        for j, v in enumerate(_Q)
    )
    return f"(CASE k {whens} END)"


def _body() -> str:
    # Cranley-Patterson rotation: the base-2 radical inverse of the STEP
    # gives each path the same low-discrepancy step skeleton, and the
    # base-3 radical inverse of the PATH shifts it mod 1 — uniformity is
    # preserved, paths are decorrelated, and everything stays literal
    # integer-and-double arithmetic. (A single flattened-index inverse
    # does NOT work here: either layout aliases path and step into the
    # same digits and produces degenerate — trending or identical —
    # walks; measured before settling on the rotation.)
    u_step = _radical_inverse("step", 2, 5)  # 2^5 = 32 steps
    u_path = _radical_inverse("path", 3, 7)  # 3^7 > 1024 paths
    u = f"(({u_step}) + ({u_path}))"
    frac = f"(({u}) - FLOOR({u}))"
    return f"""
, ks AS (
  SELECT (i DIV {N_STEPS}) AS path, (i % {N_STEPS}) AS step,
         CAST(FLOOR({frac} * {N_STRATA}) AS INTEGER) AS k
  FROM idx
),
walk AS (
  SELECT path, step,
         SUM({_inc_case()}) OVER (PARTITION BY path ORDER BY step
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS level
  FROM ks
),
dd AS (
  SELECT path, step, level,
         MAX(level) OVER (PARTITION BY path ORDER BY step
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM walk
),
per_path AS (
  SELECT path, MAX(peak - level) AS max_dd
  FROM dd GROUP BY path
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_paths,
       FLOOR((CAST(SUM(max_dd) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS mean_drawdown,
       FLOOR((CAST(MAX(max_dd) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS worst_drawdown,
       CAST(COUNT(*) FILTER (WHERE max_dd > CAST(2.0 AS DECIMAL(29,9)))
            AS BIGINT) AS n_above_2
FROM per_path
"""


def _register() -> None:
    n_idx = N_PATHS * N_STEPS
    body = _body()
    oracle = (
        f"WITH idx AS (SELECT unnest(range(0, {n_idx})) AS i)" + body
    ).replace(" DIV ", " // ")
    spark_sql = f"WITH idx AS (SELECT id AS i FROM range({n_idx}))" + body

    @register(
        "q_mc_qmc_drawdown",
        oracle=oracle,
        description=(
            "QMC twin of q_mc_walk_drawdown: stratified random-walk max "
            "drawdown via exact-decimal cumulative sums and running "
            "peaks — the drawdown window machinery, exactly oracled"
        ),
        tags=("mc", "qmc", "drawdown", "window", "deterministic"),
    )
    def q_mc_qmc_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
        return spark.sql(spark_sql)


_register()
