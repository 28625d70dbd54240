"""Approximate functional-dependency discovery (data profiling).

The TANE/Metanome family's core measurement, re-expressed relationally:
for a candidate FD X -> Y, the g3 error (Kivinen-Mannila) is the
minimum fraction of rows that must be removed for the FD to hold
exactly:

    g3 = (N - sum over X-groups of max_y |rows with that (X,Y)|) / N

A profiling pass computes this for a battery of candidate FDs across
tables and reports which hold exactly, which nearly hold (dirty-data
candidates), and which are noise. This is the schema-inference /
data-quality primitive a 100 TB ingestion pipeline runs before trusting
a column as a join key or partition key.

Scale design: each candidate is two stacked hash aggregations —
groupBy(X, Y).count then groupBy(X).agg(sum, max) — both with map-side
partial aggregation; nothing is ever collected, and the per-candidate
output is ONE row. Candidates over different tables scan independently
(Spark unions the branches into one plan; each branch's scan prunes to
exactly its two columns — column pruning is the whole game at 100 TB).
All counts are exact BIGINTs; the single g3 division is mirrored and
rounded.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

#: Candidate FDs: (table, determinant X, dependent Y). Chosen to cover
#: all three outcomes: holds exactly (a key determinant like
#: o_orderkey), nearly holds, and noise.
_CANDIDATES: tuple[tuple[str, str, str], ...] = (
    ("part", "p_name", "p_brand"),
    ("part", "p_name", "p_type"),
    ("part", "p_brand", "p_type"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderkey", "o_orderstatus"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("lineitem", "l_returnflag", "l_linestatus"),
)


def _fd_sql(tbl: str, x: str, y: str) -> str:
    return f"""
SELECT '{tbl}: {x} -> {y}' AS fd,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(cnt) - SUM(keep) AS BIGINT) AS violations,
       FLOOR((CAST(SUM(cnt) - SUM(keep) AS DOUBLE)
             / CAST(SUM(cnt) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS g3,
       CAST(SUM(cnt) - SUM(keep) AS BIGINT) = 0 AS holds
FROM (
  SELECT {x} AS xv,
         CAST(SUM(c) AS BIGINT) AS cnt,
         CAST(MAX(c) AS BIGINT) AS keep
  FROM (
    SELECT {x}, {y}, CAST(COUNT(*) AS BIGINT) AS c
    FROM {tbl} GROUP BY {x}, {y}
  )
  GROUP BY {x}
)
"""


_QFD_ORACLE = (
    "SELECT * FROM (\n"
    + "\nUNION ALL\n".join(_fd_sql(t, x, y) for t, x, y in _CANDIDATES)
    + "\n) ORDER BY fd"
)


def _fd_branch(spark: SparkSession, sf_dir: str, tbl: str, x: str, y: str) -> DataFrame:
    t = table(spark, sf_dir, tbl)
    per_xy = t.groupBy(x, y).agg(F.count("*").cast("long").alias("c"))
    per_x = per_xy.groupBy(x).agg(
        F.sum("c").cast("long").alias("cnt"),
        F.max("c").cast("long").alias("keep"),
    )
    agg = per_x.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_groups"),
        (F.sum("cnt") - F.sum("keep")).cast("long").alias("violations"),
    )
    return agg.select(
        F.lit(f"{tbl}: {x} -> {y}").alias("fd"),
        "n_rows",
        "n_groups",
        "violations",
        (F.floor((F.col("violations").cast("double") / F.col("n_rows").cast("double")) * 1e6 + 0.5) / 1e6).alias("g3"),
        (F.col("violations") == 0).alias("holds"),
    )


@register(
    "q_dq_functional_deps",
    oracle=_QFD_ORACLE,
    description=(
        "approximate functional-dependency profiling: g3 error (minimum "
        "row-removal fraction) for a battery of candidate FDs across "
        "part/orders/lineitem — two stacked hash aggregations per "
        "candidate, one output row each, exact integer counts"
    ),
    tags=("data-quality", "profiling", "fd", "aggregation"),
)
def q_dq_functional_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    branches = [
        _fd_branch(spark, sf_dir, t, x, y) for t, x, y in _CANDIDATES
    ]
    return reduce(DataFrame.union, branches).orderBy("fd")


#: Candidate keys: (table, columns). The lattice includes every single
#: column of each tested pair, so minimality is well-defined relative
#: to the tested set (a pair is minimal only if unique and neither of
#: its singles is).
_KEY_COMBOS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("orders", ("o_orderkey",)),
    ("orders", ("o_custkey",)),
    ("orders", ("o_orderdate",)),
    ("orders", ("o_custkey", "o_orderdate")),
    ("orders", ("o_orderkey", "o_custkey")),
    ("lineitem", ("l_orderkey",)),
    ("lineitem", ("l_linenumber",)),
    ("lineitem", ("l_orderkey", "l_linenumber")),
    ("part", ("p_partkey",)),
    ("part", ("p_name",)),
)

#: (combo id, tested proper-subset id) pairs, derived statically.
_SUBSETS: tuple[tuple[str, str], ...] = tuple(
    (f"{t}:{','.join(cols)}", f"{t}:{sub}")
    for t, cols in _KEY_COMBOS
    if len(cols) > 1
    for sub in cols
    if (t, (sub,)) in _KEY_COMBOS
)


def _key_sql(tbl: str, cols: tuple[str, ...]) -> str:
    col_list = ", ".join(cols)
    return f"""
SELECT '{tbl}' AS tbl, '{",".join(cols)}' AS key_cols,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {tbl}) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_distinct
FROM (SELECT DISTINCT {col_list} FROM {tbl})
"""


_QKEYS_ORACLE = (
    "WITH results AS (\n"
    + "\nUNION ALL\n".join(_key_sql(t, c) for t, c in _KEY_COMBOS)
    + "\n), subsets(combo, sub) AS (VALUES "
    + ", ".join(f"('{c}', '{s}')" for c, s in _SUBSETS)
    + """)
SELECT r.tbl, r.key_cols, r.n_rows, r.n_distinct,
       r.n_distinct = r.n_rows AS is_unique,
       r.n_distinct = r.n_rows AND NOT EXISTS (
         SELECT 1 FROM subsets s
         JOIN results r2 ON r2.tbl || ':' || r2.key_cols = s.sub
         WHERE s.combo = r.tbl || ':' || r.key_cols
           AND r2.n_distinct = r2.n_rows
       ) AS is_minimal
FROM results r
ORDER BY tbl, key_cols
"""
)


@register(
    "q_dq_candidate_keys",
    oracle=_QKEYS_ORACLE,
    description=(
        "candidate-key discovery: exact distinct-tuple counts for a "
        "lattice of column combinations across orders/lineitem/part, "
        "with uniqueness and minimality (no tested proper subset is "
        "unique) derived relationally — the profiling pass that decides "
        "what is safe to use as a join or partition key"
    ),
    tags=("data-quality", "profiling", "keys", "distinct", "aggregation"),
)
def q_dq_candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    branches = []
    for tbl, cols in _KEY_COMBOS:
        t = table(spark, sf_dir, tbl)
        n_rows = t.agg(F.count("*").cast("long").alias("n_rows"))
        nd = (
            t.select(*cols)
            .distinct()
            .agg(F.count("*").cast("long").alias("n_distinct"))
        )
        branches.append(
            nd.crossJoin(F.broadcast(n_rows)).select(
                F.lit(tbl).alias("tbl"),
                F.lit(",".join(cols)).alias("key_cols"),
                "n_rows",
                "n_distinct",
            )
        )
    results = reduce(DataFrame.union, branches)

    subsets = spark.createDataFrame(
        list(_SUBSETS) or [("", "")], "combo string, sub string"
    ).filter(F.col("combo") != "")
    with_id = results.withColumn(
        "id", F.concat_ws(":", "tbl", "key_cols")
    ).withColumn("is_unique", F.col("n_distinct") == F.col("n_rows"))
    unique_subs = (
        subsets.join(
            with_id.filter("is_unique").select(F.col("id").alias("sub")),
            "sub",
        )
        .select("combo")
        .distinct()
    )
    return (
        with_id.join(
            F.broadcast(unique_subs.withColumn("has_unique_sub", F.lit(True))),
            with_id["id"] == unique_subs["combo"],
            "left",
        )
        .select(
            "tbl",
            "key_cols",
            "n_rows",
            "n_distinct",
            "is_unique",
            (
                F.col("is_unique")
                & ~F.coalesce(F.col("has_unique_sub"), F.lit(False))
            ).alias("is_minimal"),
        )
        .orderBy("tbl", "key_cols")
    )
