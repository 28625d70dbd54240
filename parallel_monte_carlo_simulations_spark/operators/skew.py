"""Skew-handling: salted two-stage aggregation.

The generic cure for hot grouping keys: append a random-ish salt to the
key, partially aggregate (salted shuffle spreads the hot key over N
reducers), then aggregate again without the salt. The salt here is
deterministic (``key_col % N`` of a row id) so the oracle can verify the
result equals a plain GROUP BY — which is the whole point: salting must
never change the answer, only the shuffle layout.

(For joins, prefer AQE's skew-join splitting — enabled in session
defaults; salting is for aggregations and for engines/paths AQE can't
reach.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.microunit import (
    rdiv_halfup_duck,
    rdiv_halfup_expr,
    units_col,
    units_sql,
)
from ..registry import register
from ..tables import table

N_SALTS = 8

_QSALT_ORACLE = f"""
SELECT event_type,
       COUNT(*)             AS n_events,
       {rdiv_halfup_duck(f"SUM({units_sql('value', 2)})", "100", 2)}
                            AS total_value,
       FLOOR((MAX(value)) * 1e2 + 0.5) / 1e2 AS max_value
FROM events
GROUP BY event_type
"""


def salted_agg(df: DataFrame, key: str, salt_src: str) -> DataFrame:
    """Two-stage salted aggregate over a (possibly) hot key column."""
    salted = df.withColumn("_salt", (F.col(salt_src) % N_SALTS).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(units_col(F.col("value"), 2)).alias("_sum_u2"),
        F.max("value").alias("_max"),
    )
    return (
        partial.groupBy(key)
        .agg(
            F.sum("_n").alias("n_events"),
            F.sum("_sum_u2").alias("_u2"),
            (F.floor((F.max("_max")) * 1e2 + 0.5) / 1e2).alias("max_value"),
        )
        .select(
            key,
            "n_events",
            rdiv_halfup_expr("_u2", "100", 2).alias("total_value"),
            "max_value",
        )
    )


@register(
    "q_skew_salted_agg",
    oracle=_QSALT_ORACLE,
    description="salted two-stage aggregation == plain GROUP BY (skew cure)",
    tags=("skew", "salting", "aggregate"),
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # event_type has 5 values over the whole table — exactly the hot-key
    # shape that melts a single reducer at 100 TB.
    e = table(spark, sf_dir, "events")
    return salted_agg(e, "event_type", "event_id")


_QSALTJOIN_ORACLE = f"""
SELECT e.event_type,
       n.n_name,
       COUNT(*)              AS n_events,
       {rdiv_halfup_duck(f"SUM({units_sql('e.value', 2)})", "100", 2)}
                             AS total_value
FROM events e
JOIN nation n ON e.user_id % 25 = n.n_nationkey
GROUP BY e.event_type, n.n_name
"""


@register(
    "q_skew_salted_join",
    oracle=_QSALTJOIN_ORACLE,
    description="salt-replicated join == plain join (hot-key join cure)",
    tags=("skew", "salting", "join"),
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual skew-join salting: the fact side gets a deterministic salt
    (pure function of a row key — retry-safe, unlike rand()), the dim
    side is replicated N_SALTS times via explode, and the join key
    becomes (key, salt). Each hot key's rows now spread over N_SALTS
    reducers. AQE skew-join does this automatically for detected skew;
    the manual form covers the cases AQE can't see (e.g. a skewed key
    that only becomes hot after upstream filters). The oracle is the
    UNsalted join — proof the rewrite is semantics-preserving.
    """
    e = table(spark, sf_dir, "events")
    n = table(spark, sf_dir, "nation")
    fact = e.select(
        (F.col("user_id") % 25).alias("nk"),
        "event_type",
        "value",
        (F.col("event_id") % N_SALTS).cast("int").alias("_salt"),
    )
    dim = n.select(
        F.col("n_nationkey").alias("nk"),
        "n_name",
        F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)])).alias("_salt"),
    )
    return (
        fact.join(dim, ["nk", "_salt"])
        .groupBy("event_type", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(units_col(F.col("value"), 2)).alias("_u2"),
        )
        .select(
            "event_type",
            "n_name",
            "n_events",
            rdiv_halfup_expr("_u2", "100", 2).alias("total_value"),
        )
    )
