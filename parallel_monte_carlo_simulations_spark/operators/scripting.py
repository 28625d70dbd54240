"""SQL scripting (Spark 4 ``BEGIN ... END`` procedural blocks).

Spark 4 added ANSI SQL/PSM-style scripting: DECLARE'd variables,
control flow (WHILE/IF), and SET from scalar subqueries, executed
entirely in the engine. The registered query uses it for a real
statistics workload — ITERATIVE SIGMA CLIPPING (the robust-mean
estimator astronomy/metrics pipelines use): compute mean/stddev, clip
to mu +/- 2 sigma, recompute, repeat. The loop lives in the script;
each pass is one scan-side aggregate.

Parity discipline: every SET quantizes with the floor-half-up form
(see operators/interp.py) so the clip BOUNDS are bit-identical across
engines — the oracle replays the same two unrolled iterations as
chained 1-row CTEs in DuckDB, and identical bounds make the row sets,
and therefore the final statistics, exactly equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import table

N_CLIP_ITERS = 2


def _q6(expr: str) -> str:
    return f"(FLOOR(({expr}) * 1000000 + 0.5e0) / 1000000)"


_QSCRIPT_ORACLE = f"""
WITH it0 AS (
  SELECT {_q6("AVG(value)")} AS mu, {_q6("STDDEV_SAMP(value)")} AS s
  FROM events
),
it1 AS (
  SELECT
    {_q6("(SELECT AVG(value) FROM events, it0 WHERE value BETWEEN mu - 2 * s AND mu + 2 * s)")} AS mu,
    it0.s AS s_prev
  FROM it0
),
it1b AS (
  SELECT it1.mu,
    {_q6("(SELECT STDDEV_SAMP(value) FROM events, it1 WHERE value BETWEEN it1.mu - 2 * it1.s_prev AND it1.mu + 2 * it1.s_prev)")} AS s
  FROM it1
),
it2 AS (
  SELECT
    {_q6("(SELECT AVG(value) FROM events, it1b WHERE value BETWEEN mu - 2 * s AND mu + 2 * s)")} AS mu,
    it1b.s AS s_prev
  FROM it1b
),
it2b AS (
  SELECT it2.mu,
    {_q6("(SELECT STDDEV_SAMP(value) FROM events, it2 WHERE value BETWEEN it2.mu - 2 * it2.s_prev AND it2.mu + 2 * it2.s_prev)")} AS s
  FROM it2
)
SELECT FLOOR(mu * 10000 + 0.5e0) / 10000 AS clipped_mean,
       FLOOR(s * 10000 + 0.5e0) / 10000  AS clipped_std,
       CAST((SELECT COUNT(*) FROM events, it2b
             WHERE value BETWEEN mu - 2 * s AND mu + 2 * s) AS BIGINT)
         AS n_in_band
FROM it2b
"""


@register(
    "q_script_sigma_clip",
    oracle=_QSCRIPT_ORACLE,
    description=(
        "SQL scripting (BEGIN/DECLARE/WHILE): iterative 2-sigma clipping "
        f"of event values, {N_CLIP_ITERS} refinement passes driven by "
        "engine-side control flow"
    ),
    tags=("scripting", "sql", "iterative", "statistics"),
)
def q_script_sigma_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    saved = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        table(spark, sf_dir, "events").createOrReplaceTempView(
            "events_script_src"
        )
        q6 = "FLOOR(({}) * 1000000 + 0.5E0) / 1000000"
        return spark.sql(f"""
        BEGIN
          DECLARE mu DOUBLE DEFAULT 0;
          DECLARE s DOUBLE DEFAULT 0;
          DECLARE i INT DEFAULT 0;
          SET mu = (SELECT {q6.format("AVG(value)")} FROM events_script_src);
          SET s = (SELECT {q6.format("STDDEV_SAMP(value)")}
                   FROM events_script_src);
          WHILE i < {N_CLIP_ITERS} DO
            SET mu = (SELECT {q6.format("AVG(value)")} FROM events_script_src
                      WHERE value BETWEEN mu - 2 * s AND mu + 2 * s);
            SET s = (SELECT {q6.format("STDDEV_SAMP(value)")}
                     FROM events_script_src
                     WHERE value BETWEEN mu - 2 * s AND mu + 2 * s);
            SET i = i + 1;
          END WHILE;
          SELECT FLOOR(mu * 10000 + 0.5E0) / 10000 AS clipped_mean,
                 FLOOR(s * 10000 + 0.5E0) / 10000  AS clipped_std,
                 CAST((SELECT COUNT(*) FROM events_script_src
                       WHERE value BETWEEN mu - 2 * s AND mu + 2 * s)
                      AS BIGINT) AS n_in_band;
        END
        """)
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", saved)
