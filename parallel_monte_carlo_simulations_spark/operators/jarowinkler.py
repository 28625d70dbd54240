"""Jaro-Winkler similarity, implemented from scratch, as an ER verifier.

Levenshtein (``entityres.py``) charges every edit the same; Jaro-Winkler
is the record-linkage field's typo metric — transposition-tolerant and
prefix-weighted (Winkler's boost rewards shared prefixes up to 4 chars
when the base Jaro exceeds 0.7). Spark has no built-in Jaro-Winkler, so
this is the documented "UDF slow path, used deliberately": a vectorized
Arrow-batched pandas UDF implementing the textbook algorithm
(match window ``max(|a|,|b|)//2 - 1``, half-transposition count, boost
``jw = j + l*0.1*(1-j)``), verified two independent ways:

- the driver oracle runs DuckDB's own C++ ``jaro_winkler_similarity``
  on the identical candidate pairs — two from-scratch implementations
  (this module's Python and DuckDB's C++) must agree to 6 decimals on
  every emitted pair;
- ``tests/test_jarowinkler.py`` property-tests the scalar kernel
  against DuckDB on adversarial random strings (empty, equal,
  reversed, shared-prefix).

Scale design: the expensive scorer only ever sees the sorted-
neighborhood candidate pairs from ``entityres._neighbor_pairs`` —
bounded at N*B per blocking pass over DISTINCT names (vocabulary-
sized, not fact-table-sized), never an all-pairs product. The UDF is
O(|a|*window) per pair on Arrow batches; at 100 TB the candidate count
grows linearly with the distinct-name count and partitions freely.
Inclusion is decided on the ROUNDED score in both engines, so a 1-ulp
double divergence at the threshold cannot flip membership.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import register
from .entityres import WINDOW_B, _distinct_names, _neighbor_pairs

#: Emit pairs whose ROUNDED Jaro-Winkler score is at least this.
MIN_JW = 0.88

#: Winkler prefix boost: scale per shared-prefix char, max prefix, and
#: the Jaro threshold above which the boost applies (standard values,
#: identical to DuckDB's implementation).
_PREFIX_SCALE = 0.1
_MAX_PREFIX = 4
_BOOST_THRESHOLD = 0.7


def jaro_winkler(s1: str, s2: str) -> float:
    """Textbook Jaro-Winkler on two strings (pure Python scalar kernel)."""
    n1, n2 = len(s1), len(s2)
    # DuckDB convention: any empty side scores 0, including both empty.
    if n1 == 0 or n2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(n1, n2) // 2 - 1
    if window < 0:
        window = 0
    used2 = [False] * n2
    match1 = [False] * n1
    m = 0
    for i, ch in enumerate(s1):
        lo = i - window if i > window else 0
        hi = i + window + 1
        if hi > n2:
            hi = n2
        for j in range(lo, hi):
            if not used2[j] and s2[j] == ch:
                used2[j] = True
                match1[i] = True
                m += 1
                break
    if m == 0:
        return 0.0
    # Half-transpositions: aligned matched chars that differ.
    t = 0
    k = 0
    for i in range(n1):
        if match1[i]:
            while not used2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / n1 + m / n2 + (m - t) / m) / 3.0
    if j > _BOOST_THRESHOLD:
        prefix = 0
        for a, b in zip(s1[:_MAX_PREFIX], s2[:_MAX_PREFIX]):
            if a != b:
                break
            prefix += 1
        j = j + prefix * _PREFIX_SCALE * (1.0 - j)
    return j


def _make_jw_udf():
    # Built inside the query call: pandas_udf parses its DDL return type
    # against the active session, so it cannot live at import time.
    @pandas_udf("double")
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [jaro_winkler(x, y) for x, y in zip(a, b)], dtype="float64"
        )

    return _jw


_QJW_ORACLE = f"""
WITH names AS (
  SELECT p_name FROM part GROUP BY p_name
),
blk1 AS (
  SELECT p_name, split_part(p_name, ' ', 1) AS key,
         row_number() OVER (PARTITION BY split_part(p_name, ' ', 1)
                            ORDER BY p_name) AS rn
  FROM names WHERE split_part(p_name, ' ', 1) <> ''
),
blk2 AS (
  SELECT p_name, split_part(p_name, ' ', 2) AS key,
         row_number() OVER (PARTITION BY split_part(p_name, ' ', 2)
                            ORDER BY p_name) AS rn
  FROM names WHERE split_part(p_name, ' ', 2) <> ''
),
cand AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b
  FROM (SELECT p_name, key, rn + d.d AS rn_b
        FROM blk1, (SELECT unnest(range(1, {WINDOW_B} + 1)) AS d) d) a
  JOIN blk1 b ON a.key = b.key AND a.rn_b = b.rn
  UNION
  SELECT a.p_name, b.p_name
  FROM (SELECT p_name, key, rn + d.d AS rn_b
        FROM blk2, (SELECT unnest(range(1, {WINDOW_B} + 1)) AS d) d) a
  JOIN blk2 b ON a.key = b.key AND a.rn_b = b.rn
),
scored AS (
  SELECT name_a, name_b,
         FLOOR((jaro_winkler_similarity(name_a, name_b)) * 1e6 + 0.5) / 1e6 AS jw
  FROM cand
)
SELECT name_a, name_b, jw
FROM scored
WHERE jw >= {MIN_JW}
ORDER BY jw DESC, name_a, name_b
"""


@register(
    "q_er_jaro_winkler",
    oracle=_QJW_ORACLE,
    description=(
        "Jaro-Winkler match scoring implemented from scratch (Arrow "
        "pandas UDF) over sorted-neighborhood candidate pairs, "
        f"threshold on the rounded score >= {MIN_JW}; the oracle runs "
        "DuckDB's independent C++ jaro_winkler_similarity on the same "
        "pairs — two implementations must agree to 6 decimals"
    ),
    tags=("dedup", "entity-resolution", "text", "pandas-udf", "similarity"),
)
def q_er_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = _distinct_names(spark, sf_dir).select("p_name")
    cand = _neighbor_pairs(names, 1).union(_neighbor_pairs(names, 2)).distinct()
    jw_udf = _make_jw_udf()
    scored = cand.select(
        "name_a",
        "name_b",
        (F.floor((jw_udf(F.col("name_a"), F.col("name_b"))) * 1e6 + 0.5) / 1e6).alias("jw"),
    )
    return (
        scored.filter(F.col("jw") >= MIN_JW)
        .orderBy(F.desc("jw"), "name_a", "name_b")
    )
