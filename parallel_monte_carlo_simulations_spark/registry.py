"""Query registry: the single source of truth for the driver contract.

Every implemented operator registers a named query here; the driver
(``__spark_entry__.py``) exposes ``queries()`` / ``oracle_sql()`` straight
from this registry. A query is a callable ``(spark, sf_dir) -> DataFrame``
plus (when SQL-expressible) an ANSI-SQL oracle string DuckDB can run on
the same parquet tables.

Column-name discipline: the driver's comparator sorts columns by name
before hashing, so every computed column is aliased identically on both
sides. Float discipline: aggregates are rounded *inside* both the Spark
query and the oracle so both engines return literally identical values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # None => non-SQL-expressible, rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


#: name -> spec. Populated by @register at import time of the operator
#: modules (see parallel_monte_carlo_simulations_spark.operators.__init__).
REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as query ``name`` with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, description=description, tags=tags
        )
        return fn

    return deco


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (triggering registration) and return
    the full registry."""
    # Imports are inside the function so `import parallel_monte_carlo_simulations_spark`
    # stays light; the driver calls queries() which lands here once.
    from . import (  # noqa: F401
        dedup,
        functions,
        multimodal,
        operators,
        similarity,
        sources,
        streaming,
    )
    from .functions import pipeline  # noqa: F401  (after dedup: composes it)
    from .mc import queries as mc_queries  # noqa: F401

    return REGISTRY
