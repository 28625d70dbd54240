"""Isotonic regression via pool-adjacent-violators, oracled by minimax.

The standard monotone-calibration primitive (quality-score -> dup-rate
curves, probability calibration, dose-response): fit the best
non-decreasing step function to a series in least squares. Spark runs
the REAL algorithm — linear-time pool-adjacent-violators (PAVA) inside
``applyInPandas``, one series per group — while the DuckDB oracle
computes the same mathematical object through the textbook minimax
closed form

    fit_i = max_{j<=i} min_{k>=i} avg(y[j..k])

which is a completely independent O(n^2) derivation. Two different
algorithms must agree value-for-value; that is a far stronger check
than replaying one algorithm twice.

Determinism discipline:

- PAVA pools with EXACT integer comparisons — blocks carry (sum, count)
  of integer cents, and the violation test ``avg(a) >= avg(b)`` is the
  cross-multiplied ``sum_a * cnt_b >= sum_b * cnt_a`` in Python big
  ints, so no float ever decides the pooling structure.
- Each fitted value is then ONE double division sum/count of exact
  integers; the oracle's winning minimax cell is the same interval
  average computed as one division of the same integers — identical
  IEEE results.
- Segments (maximal runs of equal fitted value) are grouped on the raw
  double and rounded only for output, identically in both engines.

Scale design: series are the *aggregated* daily revenue per order
priority over one year — the fact scan collapses to |priority| x 365
rows before any sequential step, so each PAVA call folds a
calendar-bounded array regardless of fact-table scale, and the
priorities parallelize. The O(n^2) closed form exists only on the
oracle side; the engine side is O(n log n) (sort + linear PAVA).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Restrict to one calendar year: bounds the oracle's O(n^2) pair table
#: while exercising every pooling path (n ~ 365 days per priority).
YEAR = 1995

_QISO_ORACLE = f"""
WITH daily AS (
  SELECT o_orderpriority AS priority,
         CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS y
  FROM orders
  WHERE EXTRACT(year FROM o_orderdate) = {YEAR}
  GROUP BY priority, day
),
idx AS (
  SELECT priority, y,
         row_number() OVER (PARTITION BY priority ORDER BY day) AS i,
         SUM(y) OVER (PARTITION BY priority ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS s
  FROM daily
),
-- interval averages avg(y[j..k]) from exact prefix sums, one double
-- division per (j,k) pair
pairs AS (
  SELECT a.priority, a.i AS j, b.i AS k,
         CAST(b.s - (a.s - a.y) AS DOUBLE) / CAST(b.i - a.i + 1 AS DOUBLE)
           AS avg_jk
  FROM idx a JOIN idx b
    ON a.priority = b.priority AND a.i <= b.i
),
-- sufmin(j,k) = min over k' >= k of avg(j,k'): running min over k DESC
sufmin AS (
  SELECT priority, j, k,
         MIN(avg_jk) OVER (PARTITION BY priority, j ORDER BY k DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS m
  FROM pairs
),
-- fit_i = max over j <= i of sufmin(j, i): all rows with k = i have
-- j <= i by construction
fit AS (
  SELECT priority, k AS i, MAX(m) AS fitted
  FROM sufmin GROUP BY priority, k
),
-- segments: maximal runs of equal fitted value (gaps and islands on
-- the raw double)
seg AS (
  SELECT priority, i, fitted,
         i - row_number() OVER (PARTITION BY priority, fitted ORDER BY i)
           AS grp
  FROM fit
)
SELECT priority,
       CAST(MIN(i) AS BIGINT) AS seg_start,
       CAST(MAX(i) AS BIGINT) AS seg_end,
       CAST(COUNT(*) AS BIGINT) AS seg_len,
       FLOOR((fitted / 100.0) * 1e4 + 0.5) / 1e4 AS fitted_revenue
FROM seg
GROUP BY priority, fitted, grp
ORDER BY priority, seg_start
"""


def _pava_blocks(ys: list[int]) -> list[tuple[int, int]]:
    """PAVA pooling: returns (sum, count) blocks; exact int comparisons."""
    blocks: list[tuple[int, int]] = []
    for y in ys:
        blocks.append((y, 1))
        # merge while the previous block average exceeds the last's:
        # sum_p / cnt_p > sum_l / cnt_l  <=>  sum_p*cnt_l > sum_l*cnt_p
        while (
            len(blocks) >= 2
            and blocks[-2][0] * blocks[-1][1] > blocks[-1][0] * blocks[-2][1]
        ):
            s2, c2 = blocks.pop()
            s1, c1 = blocks.pop()
            blocks.append((s1 + s2, c1 + c2))
    return blocks


@register(
    "q_ml_isotonic_pava",
    oracle=_QISO_ORACLE,
    description=(
        "isotonic regression of daily revenue per order priority "
        f"({YEAR}): linear-time pool-adjacent-violators with exact "
        "integer pooling decisions in applyInPandas, verified against "
        "the independent O(n^2) minimax closed form "
        "max_j<=i min_k>=i avg(y[j..k]) in the oracle; output is the "
        "fitted step function's segments"
    ),
    tags=("ml", "regression", "isotonic", "calibration", "applyInPandas"),
)
def q_ml_isotonic_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = (
        o.filter(F.year("o_orderdate") == YEAR)
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("y")
        )
    )

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        ys = [int(v) for v in pdf["y"]]
        # Segments mirror the oracle's islands over the DOUBLE fitted
        # value: adjacent PAVA blocks may carry mathematically distinct
        # rational averages that round to the same double (or exactly
        # equal averages, which PAVA never pools) — merge those, since
        # the oracle groups on the double.
        segs: list[list] = []  # [start, end, fitted_double]
        i = 1
        for s, c in _pava_blocks(ys):
            fitted = float(s) / float(c)  # one double division, like oracle
            if segs and segs[-1][2] == fitted:
                segs[-1][1] = i + c - 1
            else:
                segs.append([i, i + c - 1, fitted])
            i += c
        return pd.DataFrame(
            {
                "priority": pdf["priority"].iloc[0],
                "seg_start": a,
                "seg_end": b,
                "seg_len": b - a + 1,
                "fitted_cents": f,
            }
            for a, b, f in segs
        )

    out_schema = (
        "priority string, seg_start long, seg_end long, seg_len long, "
        "fitted_cents double"
    )
    return (
        daily.groupBy("priority")
        .applyInPandas(_fit, schema=out_schema)
        .select(
            "priority",
            "seg_start",
            "seg_end",
            "seg_len",
            # the /100 unscale and ROUND are Spark-side so the rounding
            # rule (half away from zero) mirrors DuckDB's ROUND
            (F.floor((F.col("fitted_cents") / 100.0) * 1e4 + 0.5) / 1e4).alias("fitted_revenue"),
        )
        .orderBy("priority", "seg_start")
    )
