"""Privacy / governance operators: k-anonymity audit and a
differentially-private release, both exactly oracled.

- **k-anonymity + l-diversity audit** (Sweeney 2002; Machanavajjhala
  2007): group the table by its quasi-identifiers (segment, nation,
  price decile) and measure equivalence-class sizes. Classes smaller
  than k are re-identification risks; classes whose sensitive
  attribute (order priority) shows too few distinct values fail
  l-diversity even when large. Pure exact counts — the audit a
  governance pipeline runs before any data share.

- **DP noisy counts** (Dwork 2006, Laplace mechanism): per-segment
  order counts released with Laplace(1/epsilon) noise. The noise is
  DETERMINISTIC-REPLAY by construction: u is the portable md5 hash of
  the segment mapped to (0,1), and the Laplace inverse-CDF
  ``-b * sign(u-1/2) * ln(1 - 2|u-1/2|)`` uses the repo's quantized-ln
  discipline so both engines add literally the same noise. (A
  production release would use a secret seed; the mechanism, scale,
  and post-processing are the real thing — only the seed is pinned so
  the result is verifiable.)

Scale: both are single groupBys on low-cardinality keys; the audit's
class table is bounded by the quasi-identifier domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60, sql_hash60
from ..registry import register
from ..tables import table

K_ANON = 5
L_DIV = 3

_QKANON_ORACLE = f"""
WITH quasi AS (
  SELECT c.c_mktsegment AS segment,
         c.c_nationkey AS nation,
         NTILE(10) OVER (ORDER BY o.o_totalprice, o.o_orderkey) AS price_decile,
         o.o_orderpriority AS sensitive
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
classes AS (
  SELECT segment, nation, price_decile,
         CAST(COUNT(*) AS BIGINT) AS class_size,
         CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l_distinct
  FROM quasi
  GROUP BY segment, nation, price_decile
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(class_size) AS BIGINT) AS k_anonymity,
       CAST(COUNT(*) FILTER (class_size < {K_ANON}) AS BIGINT)
         AS classes_below_k,
       CAST(SUM(class_size) FILTER (class_size < {K_ANON}) AS BIGINT)
         AS rows_at_risk,
       CAST(COUNT(*) FILTER (l_distinct < {L_DIV}) AS BIGINT)
         AS classes_below_l,
       CAST(MIN(l_distinct) AS BIGINT) AS l_diversity
FROM classes
"""


@register(
    "q_privacy_k_anonymity",
    oracle=_QKANON_ORACLE,
    description=(
        f"k-anonymity / l-diversity audit over (segment, nation, price "
        f"decile) quasi-identifiers: class sizes, k (min class), rows at "
        f"risk below k={K_ANON}, l-diversity of order priority"
    ),
    tags=("privacy", "governance", "k-anonymity", "aggregate", "audit"),
)
def q_privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    # price deciles via the range-bucketed rank kernel + closed-form
    # NTILE (round 11) — identical cuts, no global-sort window.
    from .rankstats import bucketed_running, sql_ntile

    nt = o.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    ranked = bucketed_running(
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
            "o_totalprice",
            "o_orderkey",
            "c_mktsegment",
            "c_nationkey",
            "o_orderpriority",
        ),
        axis="o_totalprice",
        order=[F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        cums={"rank": F.lit(1)},
    )
    quasi = ranked.crossJoin(F.broadcast(nt)).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation"),
        sql_ntile(F.col("rank"), F.col("n_all"), 10).alias("price_decile"),
        F.col("o_orderpriority").alias("sensitive"),
    )
    classes = quasi.groupBy("segment", "nation", "price_decile").agg(
        F.count("*").alias("class_size"),
        F.countDistinct("sensitive").alias("l_distinct"),
    )
    return classes.agg(
        F.count("*").alias("n_classes"),
        F.min("class_size").alias("k_anonymity"),
        F.count(F.when(F.col("class_size") < K_ANON, 1)).alias(
            "classes_below_k"
        ),
        F.sum(
            F.when(F.col("class_size") < K_ANON, F.col("class_size"))
        ).alias("rows_at_risk"),
        F.count(F.when(F.col("l_distinct") < L_DIV, 1)).alias(
            "classes_below_l"
        ),
        F.min("l_distinct").alias("l_diversity"),
    )


#: Privacy budget for the Laplace release.
EPS_NUM, EPS_DEN = 1, 2  # epsilon = 0.5 -> scale b = 2

_DP_HASH = sql_hash60("'dp:' || segment")
_U_SQL = (
    f"(CAST({_DP_HASH} AS DOUBLE) + 0.5e0) / 1152921504606846976e0"
)

_QDP_ORACLE = f"""
WITH seg AS (
  SELECT c.c_mktsegment AS segment,
         CAST(COUNT(*) AS BIGINT) AS true_count
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment
),
noise AS (
  SELECT segment, true_count,
         {_U_SQL} AS u
  FROM seg
),
lap AS (
  SELECT segment, true_count, u,
         CAST(FLOOR((-({EPS_DEN}e0 / {EPS_NUM}e0)
             * (CASE WHEN u >= 0.5e0 THEN 1e0 ELSE -1e0 END)
             * ln(1e0 - 2e0 * abs(u - 0.5e0))) * 1e6 + 0.5) / 1e6
           AS DECIMAL(18,6)) AS noise
  FROM noise
)
SELECT segment, true_count,
       FLOOR((CAST(true_count AS DOUBLE) + CAST(noise AS DOUBLE)) * 1e2 + 0.5) / 1e2
         AS released_count,
       CAST(noise AS DOUBLE) AS noise
FROM lap
ORDER BY segment
"""


@register(
    "q_privacy_dp_counts",
    oracle=_QDP_ORACLE,
    description=(
        "differentially-private per-segment counts: Laplace(2) noise "
        "(epsilon=0.5) via inverse CDF on a deterministic-replay "
        "uniform, quantized-ln discipline"
    ),
    tags=("privacy", "differential-privacy", "laplace", "aggregate"),
)
def q_privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    seg = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("true_count"))
    )
    u = (
        hash60(F.concat(F.lit("dp:"), F.col("segment"))).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    b = float(EPS_DEN) / float(EPS_NUM)
    noise = (F.floor((-F.lit(b)
        * F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))) * 1e6 + 0.5) / 1e6).cast("decimal(18,6)")
    return (
        seg.select("segment", "true_count", noise.alias("noise_d"))
        .select(
            "segment",
            "true_count",
            (F.floor((F.col("true_count").cast("double")
                + F.col("noise_d").cast("double")) * 1e2 + 0.5) / 1e2).alias("released_count"),
            F.col("noise_d").cast("double").alias("noise"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# Pseudonymization: stable surrogate keys with a verified bijection.
# --------------------------------------------------------------------------

_QPSEUDO_ORACLE = f"""
WITH mapped AS (
  SELECT c_custkey,
         c_mktsegment AS segment,
         DENSE_RANK() OVER (
           ORDER BY {sql_hash60("'pseud:' || CAST(c_custkey AS VARCHAR)")},
                    c_custkey
         ) AS pseudonym
  FROM customer
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COUNT(DISTINCT pseudonym) AS BIGINT) AS n_pseudonyms,
       CAST(MIN(pseudonym) AS BIGINT) AS min_pseudonym,
       CAST(MAX(pseudonym) AS BIGINT) AS max_pseudonym
FROM mapped
GROUP BY segment
ORDER BY segment
"""


@register(
    "q_privacy_pseudonymize",
    oracle=_QPSEUDO_ORACLE,
    description=(
        "pseudonymization: dense surrogate keys in hash order (stable, "
        "unlinkable without the salt), per-segment bijection audit "
        "(n_users == n_pseudonyms)"
    ),
    tags=("privacy", "pseudonymization", "governance", "window"),
)
def q_privacy_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key issuance for data sharing: ranking customers by a
    salted portable hash yields dense ids whose order carries no
    business meaning; the per-segment distinct-count equality IS the
    bijection proof. The id assignment is the standard two-pass
    surrogate-key pattern (per-bucket counts + broadcast offsets +
    local walk — operators/rankstats.py), identical to the oracle's
    dense_rank because the (hash, custkey) order key is unique."""
    c = table(spark, sf_dir, "customer")
    # the docstring's promised two-pass assignment, delivered (round
    # 11): the (hash, custkey) order key is unique, so dense_rank ==
    # row_number == the range-bucketed kernel's rank — no global sort.
    from .rankstats import bucketed_running

    h = hash60(F.concat(F.lit("pseud:"), F.col("c_custkey").cast("string")))
    mapped = bucketed_running(
        c.select("c_mktsegment", "c_custkey", h.alias("hk")),
        axis="hk",
        order=[F.col("hk").asc(), F.col("c_custkey").asc()],
        cums={"pseudonym": F.lit(1)},
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("pseudonym"),
    )
    return (
        mapped.groupBy("segment")
        .agg(
            F.count("*").alias("n_users"),
            F.countDistinct("pseudonym").alias("n_pseudonyms"),
            F.min("pseudonym").cast("long").alias("min_pseudonym"),
            F.max("pseudonym").cast("long").alias("max_pseudonym"),
        )
        .orderBy("segment")
    )
