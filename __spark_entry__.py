"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the engine's full registered operator inventory
(see parallel_monte_carlo_simulations_spark.registry and SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parallel_monte_carlo_simulations_spark.registry import load_all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (5-way star join, revenue by nation) on sf0.001."""
    specs = load_all_queries()
    return specs["q05_revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the
    non-SQL-expressible ops — driver records a rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in load_all_queries().items()
        if spec.oracle is not None
    }
