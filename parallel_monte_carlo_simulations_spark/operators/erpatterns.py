"""ER agreement-pattern profiling: the Fellegi-Sunter input table.

Record-linkage theory (Fellegi-Sunter 1969) scores candidate pairs by
their field-agreement PATTERN — the bit vector of which fields agree.
Before any m/u weight estimation (EM or labeled), the profiling step
every linkage pipeline runs is the pattern frequency table: observed
count per pattern vs the count expected if fields agreed independently
(product of marginal agreement rates). Patterns with lift >> 1 are the
correlated-agreement signatures worth modeling; lift ~ 1 fields add no
evidence. This is that table, over same-name part pairs.

Scale design: candidate pairs come from sorted-neighborhood pairing
WITHIN p_name blocks (row_number by p_partkey, each record pairs with
its next B neighbors via the fully-discriminating (name, rn) equi-join
— the same linear N*B bound as ``entityres.py``; the name vocabulary
is fixed, so unbounded blocks would grow quadratically with the fact
table). Pattern counting is one hash aggregation over exact integers;
the independence baseline multiplies marginal rates in one mirrored
double expression per pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Sorted-neighborhood window within each name block.
WINDOW_B = 10

_QERPAT_ORACLE = f"""
WITH recs AS (
  SELECT p_partkey, p_name, p_brand, p_type, p_size,
         row_number() OVER (PARTITION BY p_name ORDER BY p_partkey) AS rn
  FROM part
),
pairs AS (
  SELECT CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END AS brand_eq,
         CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0 END AS type_eq,
         CASE WHEN a.p_size = b.p_size THEN 1 ELSE 0 END AS size_eq
  FROM (SELECT p_name, rn + d.d AS rn_b, p_brand, p_type, p_size
        FROM recs, (SELECT unnest(range(1, {WINDOW_B} + 1)) AS d) d) a
  JOIN recs b ON a.p_name = b.p_name AND a.rn_b = b.rn
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(brand_eq) AS BIGINT) AS n_brand,
         CAST(SUM(type_eq) AS BIGINT) AS n_type,
         CAST(SUM(size_eq) AS BIGINT) AS n_size
  FROM pairs
),
patterns AS (
  SELECT brand_eq, type_eq, size_eq,
         CAST(COUNT(*) AS BIGINT) AS observed
  FROM pairs GROUP BY brand_eq, type_eq, size_eq
)
SELECT p.brand_eq, p.type_eq, p.size_eq, p.observed,
       t.n_pairs,
       FLOOR((CAST(t.n_pairs AS DOUBLE)
         * (CASE WHEN p.brand_eq = 1
                 THEN CAST(t.n_brand AS DOUBLE) / CAST(t.n_pairs AS DOUBLE)
                 ELSE 1.0 - CAST(t.n_brand AS DOUBLE)
                            / CAST(t.n_pairs AS DOUBLE) END)
         * (CASE WHEN p.type_eq = 1
                 THEN CAST(t.n_type AS DOUBLE) / CAST(t.n_pairs AS DOUBLE)
                 ELSE 1.0 - CAST(t.n_type AS DOUBLE)
                            / CAST(t.n_pairs AS DOUBLE) END)
         * (CASE WHEN p.size_eq = 1
                 THEN CAST(t.n_size AS DOUBLE) / CAST(t.n_pairs AS DOUBLE)
                 ELSE 1.0 - CAST(t.n_size AS DOUBLE)
                            / CAST(t.n_pairs AS DOUBLE) END)) * 1e4 + 0.5) / 1e4
         AS expected_indep,
       FLOOR((CAST(p.observed AS DOUBLE)
         / (CAST(t.n_pairs AS DOUBLE)
            * (CASE WHEN p.brand_eq = 1
                    THEN CAST(t.n_brand AS DOUBLE) / CAST(t.n_pairs AS DOUBLE)
                    ELSE 1.0 - CAST(t.n_brand AS DOUBLE)
                               / CAST(t.n_pairs AS DOUBLE) END)
            * (CASE WHEN p.type_eq = 1
                    THEN CAST(t.n_type AS DOUBLE) / CAST(t.n_pairs AS DOUBLE)
                    ELSE 1.0 - CAST(t.n_type AS DOUBLE)
                               / CAST(t.n_pairs AS DOUBLE) END)
            * (CASE WHEN p.size_eq = 1
                    THEN CAST(t.n_size AS DOUBLE) / CAST(t.n_pairs AS DOUBLE)
                    ELSE 1.0 - CAST(t.n_size AS DOUBLE)
                               / CAST(t.n_pairs AS DOUBLE) END))) * 1e4 + 0.5) / 1e4
         AS lift
FROM patterns p CROSS JOIN tot t
ORDER BY p.brand_eq, p.type_eq, p.size_eq
"""


@register(
    "q_er_agreement_patterns",
    oracle=_QERPAT_ORACLE,
    description=(
        "Fellegi-Sunter agreement-pattern table over sorted-"
        "neighborhood same-name part pairs: observed count per "
        "(brand, type, size) agreement bit vector vs the count "
        "expected under field independence, with lift — exact integer "
        "counts, mirrored double baseline"
    ),
    tags=("dedup", "entity-resolution", "statistics", "profiling"),
)
def q_er_agreement_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_name").orderBy("p_partkey")
    recs = p.select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size"
    ).withColumn("rn", F.row_number().over(w))

    probe = recs.select(
        "p_name",
        F.col("p_brand").alias("brand_a"),
        F.col("p_type").alias("type_a"),
        F.col("p_size").alias("size_a"),
        F.explode(
            F.sequence(F.col("rn") + 1, F.col("rn") + F.lit(WINDOW_B))
        ).alias("rn_b"),
    )
    pairs = probe.join(
        recs.select(
            "p_name",
            F.col("rn").alias("rn_b"),
            F.col("p_brand").alias("brand_b"),
            F.col("p_type").alias("type_b"),
            F.col("p_size").alias("size_b"),
        ),
        ["p_name", "rn_b"],
    ).select(
        F.when(F.col("brand_a") == F.col("brand_b"), 1).otherwise(0)
        .alias("brand_eq"),
        F.when(F.col("type_a") == F.col("type_b"), 1).otherwise(0)
        .alias("type_eq"),
        F.when(F.col("size_a") == F.col("size_b"), 1).otherwise(0)
        .alias("size_eq"),
    )

    tot = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("brand_eq").cast("long").alias("n_brand"),
        F.sum("type_eq").cast("long").alias("n_type"),
        F.sum("size_eq").cast("long").alias("n_size"),
    )
    patterns = pairs.groupBy("brand_eq", "type_eq", "size_eq").agg(
        F.count("*").cast("long").alias("observed")
    )

    def _rate(bit: str, n_col: str):
        r = F.col(n_col).cast("double") / F.col("n_pairs").cast("double")
        return F.when(F.col(bit) == 1, r).otherwise(1.0 - r)

    expected = (
        F.col("n_pairs").cast("double")
        * _rate("brand_eq", "n_brand")
        * _rate("type_eq", "n_type")
        * _rate("size_eq", "n_size")
    )
    return (
        patterns.crossJoin(F.broadcast(tot))
        .select(
            "brand_eq",
            "type_eq",
            "size_eq",
            "observed",
            "n_pairs",
            (F.floor((expected) * 1e4 + 0.5) / 1e4).alias("expected_indep"),
            (F.floor((F.col("observed").cast("double") / expected) * 1e4 + 0.5) / 1e4)
            .alias("lift"),
        )
        .orderBy("brand_eq", "type_eq", "size_eq")
    )
