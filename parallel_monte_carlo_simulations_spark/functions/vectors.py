"""Vector math on ``array<float>`` embedding columns — pure built-in
higher-order functions (JVM-side, no Python UDF in the hot path).

Cross-engine determinism: both sides cast float32 -> double element-wise
and LEFT-FOLD the sum in index order (Spark ``aggregate``, DuckDB
``list_reduce``), so dot products are bit-identical and rounded outputs
hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dist2(a: Column, b: Column) -> Column:
    """Squared euclidean distance, same left-fold shape as ``dot``."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dist2_unrolled(a: Column, b: Column, dims: int) -> Column:
    """``dist2`` for a statically-known dimensionality, unrolled to plain
    column arithmetic. Bit-identical to the fold (left-associated sum of
    squares; the fold's leading ``0.0 + d0`` is exact since d0 >= 0.0),
    but whole-stage-codegen-able where ``F.aggregate``/``zip_with``
    lambdas are interpreted per row — measured 40% faster on the PQ
    assign join (512k rows x 4 dims, same JVM). WIDTH-SENSITIVE: at
    dims=64 the generated expression chain ran ~2x SLOWER than the fold
    on the IVF assignment (same-JVM paired A/B, r5) — use only for
    small compile-time widths (<= ~16); keep the fold for full-width
    embedding math."""
    d = (a[0] - b[0]) * (a[0] - b[0])
    for i in range(1, dims):
        d = d + (a[i] - b[i]) * (a[i] - b[i])
    return d


# --- DuckDB oracle fragments (same fold order) -----------------------------

def sql_as_double(expr: str) -> str:
    return f"list_transform({expr}, x -> CAST(x AS DOUBLE))"


def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_concat([0.0], "
        f"list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])), "
        f"(acc, v) -> acc + v)"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"


def sql_dist2(a: str, b: str) -> str:
    """DuckDB mirror of :func:`dist2` — identical element order and fold."""
    return (
        f"list_reduce(list_concat([0.0], "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
        f"(acc, v) -> acc + v)"
    )
