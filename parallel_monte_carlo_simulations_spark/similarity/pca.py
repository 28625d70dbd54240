"""PCA by power iteration over exact-decimal covariance — fully oracled.

Distributed PCA at 100 TB is two cheap passes, not a linear-algebra
library call: (1) one map-side-combined aggregation builds the d×d
covariance from sufficient statistics (Σb_j, Σb_j·b_k — d(d+3)/2
numbers total crossing the wire, independent of row count), then (2)
power iteration runs on that TINY matrix driver-side/broadcast — here
expressed as a 12-step unrolled select chain on the one-row stats frame,
so the whole thing stays one lazy Spark plan.

Cross-engine exactness uses the same two techniques as the IVF Lloyd
quantizer (``similarity/ivf.py``) and the OLS fit
(``operators/mlstats.py``):

- the 64-dim float embeddings are first block-summed to 4 coarse
  coordinates with the portable left-fold (``functions.vectors``), then
  ROUNDed and quantized to DECIMAL(12,6) — after which every covariance
  sum is exact and ORDER-INDEPENDENT in both engines (Spark DECIMAL,
  DuckDB DECIMAL(38,12)), immune to partial-aggregation order;
- every double-precision expression after the exact stats (covariance
  entries, the 12 matrix-vector products, norms, Rayleigh eigenvalue,
  per-label projections) is written with IDENTICAL association in the
  Spark plan and the oracle SQL, so each IEEE op matches bit-for-bit.

Iteration count is a constant: the oracle replays the same 12 steps, so
the match is exact whether or not the iteration has converged.

Output: one row per label — size, the label mean's projection onto the
principal axis (centered), plus the eigenvector and eigenvalue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import table

D = 4  # coarse dims after block-summing
BLK = 16  # 64-dim embeddings -> 4 blocks of 16
ITERS = 12
_IDX = range(D)


def _sql_block(j: int) -> str:
    a, b = j * BLK + 1, j * BLK + BLK
    return (
        f"CAST(FLOOR((list_reduce(list_concat([0.0], "
        f"list_transform(embedding[{a}:{b}], x -> CAST(x AS DOUBLE))), "
        f"(acc, v) -> acc + v)) * 1e6 + 0.5) / 1e6 AS DECIMAL(12,6))"
    )


def _oracle() -> str:
    blocks = ",\n         ".join(f"{_sql_block(j)} AS b{j}" for j in _IDX)
    sums = ",\n         ".join(
        [f"CAST(COUNT(*) AS DOUBLE) AS n"]
        + [f"CAST(SUM(b{j}) AS DOUBLE) AS s{j}" for j in _IDX]
        + [
            f"CAST(SUM(b{j} * b{k}) AS DOUBLE) AS s{j}{k}"
            for j in _IDX
            for k in _IDX
            if k >= j
        ]
    )
    covs = ",\n         ".join(
        f"(s{min(j,k)}{max(j,k)} - ((s{j} * s{k}) / n)) / n AS c{j}{k}"
        for j in _IDX
        for k in _IDX
    )
    its = []
    prev = "it0"
    for t in range(1, ITERS + 1):
        ys = ", ".join(
            "("
            + " + ".join(f"c{j}{k} * x{k}" for k in _IDX)
            + f") AS y{j}"
            for j in _IDX
        )
        nrm = " + ".join(f"y{j} * y{j}" for j in _IDX)
        its.append(f"it{t}y AS (SELECT *, {ys} FROM {prev})")
        its.append(
            f"it{t} AS (SELECT * EXCLUDE (x0, x1, x2, x3, lam, "
            + ", ".join(f"y{j}" for j in _IDX)
            + "), "
            + ", ".join(f"y{j} / sqrt({nrm}) AS x{j}" for j in _IDX)
            + f", sqrt({nrm}) AS lam FROM it{t}y)"
        )
        prev = f"it{t}"
    lsums = ",\n         ".join(
        [f"CAST(COUNT(*) AS BIGINT) AS n_vecs", "CAST(COUNT(*) AS DOUBLE) AS nl"]
        + [f"CAST(SUM(b{j}) AS DOUBLE) AS l{j}" for j in _IDX]
    )
    proj = " + ".join(f"x{j} * ((l{j} / nl) - (s{j} / n))" for j in _IDX)
    return f"""
WITH proj AS (
  SELECT label,
         {blocks}
  FROM embeddings
),
stats AS (
  SELECT {sums}
  FROM proj
),
cov AS (
  SELECT n, {', '.join(f's{j}' for j in _IDX)},
         {covs}
  FROM stats
),
it0 AS (SELECT *, {', '.join(f'1.0e0 AS x{j}' for j in _IDX)}, 0.0e0 AS lam FROM cov),
{',' .join(its)},
bylabel AS (
  SELECT label, {lsums}
  FROM proj GROUP BY label
)
SELECT b.label, b.n_vecs,
       FLOOR(({proj}) * 1e6 + 0.5) / 1e6 AS proj_center,
       {', '.join(f'FLOOR((x{j}) * 1e6 + 0.5) / 1e6 AS ev{j}' for j in _IDX)},
       FLOOR((lam) * 1e6 + 0.5) / 1e6 AS eigenvalue
FROM bylabel b CROSS JOIN {prev}
ORDER BY b.label
"""


@register(
    "q_pca_power_iteration",
    oracle=_oracle(),
    description=(
        "top principal component of block-summed embeddings via exact-"
        "decimal covariance + 12-step power iteration; per-label centered "
        "projection onto the axis"
    ),
    tags=("ml", "pca", "embeddings", "power-iteration", "scale"),
)
def q_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    emb_d = F.col("embedding").cast("array<double>")

    def block(j: int):
        return (F.floor((F.aggregate(
                F.slice(emb_d, j * BLK + 1, BLK),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )) * 1e6 + 0.5) / 1e6).cast("decimal(12,6)")

    proj = emb.select(
        "label", *[block(j).alias(f"b{j}") for j in _IDX]
    )

    stats = proj.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        *[F.sum(f"b{j}").cast("double").alias(f"s{j}") for j in _IDX],
        *[
            F.sum(F.col(f"b{j}") * F.col(f"b{k}")).cast("double").alias(f"s{j}{k}")
            for j in _IDX
            for k in _IDX
            if k >= j
        ],
    )

    cov = stats.select(
        "n",
        *[F.col(f"s{j}") for j in _IDX],
        *[
            (
                (
                    F.col(f"s{min(j,k)}{max(j,k)}")
                    - ((F.col(f"s{j}") * F.col(f"s{k}")) / F.col("n"))
                )
                / F.col("n")
            ).alias(f"c{j}{k}")
            for j in _IDX
            for k in _IDX
        ],
    )

    it = cov.select(
        "*", *[F.lit(1.0).alias(f"x{j}") for j in _IDX], F.lit(0.0).alias("lam")
    )
    keep = ["n"] + [f"s{j}" for j in _IDX] + [f"c{j}{k}" for j in _IDX for k in _IDX]
    for _t in range(ITERS):
        ys = []
        for j in _IDX:
            y = F.col(f"c{j}0") * F.col("x0")
            for k in list(_IDX)[1:]:
                y = y + F.col(f"c{j}{k}") * F.col(f"x{k}")
            ys.append(y.alias(f"y{j}"))
        it = it.select("*", *ys)
        nrm = F.col("y0") * F.col("y0")
        for j in list(_IDX)[1:]:
            nrm = nrm + F.col(f"y{j}") * F.col(f"y{j}")
        it = it.select(
            *keep,
            *[(F.col(f"y{j}") / F.sqrt(nrm)).alias(f"x{j}") for j in _IDX],
            F.sqrt(nrm).alias("lam"),
        )

    bylabel = proj.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.count(F.lit(1)).cast("double").alias("nl"),
        *[F.sum(f"b{j}").cast("double").alias(f"l{j}") for j in _IDX],
    )

    pc = F.col("x0") * ((F.col("l0") / F.col("nl")) - (F.col("s0") / F.col("n")))
    for j in list(_IDX)[1:]:
        pc = pc + F.col(f"x{j}") * (
            (F.col(f"l{j}") / F.col("nl")) - (F.col(f"s{j}") / F.col("n"))
        )
    return (
        bylabel.crossJoin(F.broadcast(it))
        .select(
            "label",
            "n_vecs",
            (F.floor((pc) * 1e6 + 0.5) / 1e6).alias("proj_center"),
            *[(F.floor((F.col(f"x{j}")) * 1e6 + 0.5) / 1e6).alias(f"ev{j}") for j in _IDX],
            (F.floor((F.col("lam")) * 1e6 + 0.5) / 1e6).alias("eigenvalue"),
        )
        .orderBy("label")
    )
