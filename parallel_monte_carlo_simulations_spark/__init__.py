"""PySpark-native analytics engine with the capabilities of
``vladimirrotariu/parallel-monte-carlo-simulations``.

The reference (see SURVEY.md) is a Beam-based embarrassingly-parallel
Monte Carlo battery (``parallel_simulations/parallel_simulations.py:18-33``).
This package re-expresses that surface Spark-first:

- :mod:`.mc` — the Monte Carlo battery (``MCBattery``) on ``mapInPandas``
  with deterministic per-(model, sim) seeding.
- :mod:`.operators` — the relational query surface (scan/filter/join/
  agg/window/setops/...) as registered, oracle-checked queries.
- :mod:`.dedup`, :mod:`.similarity`, :mod:`.functions` — LLM-data-pipeline
  operators (exact/MinHash/SimHash dedup, ANN search, text analysis).
- :mod:`.streaming` — Structured Streaming wrappers with batch-equivalent
  window queries.

Everything is DataFrame-declarative so Catalyst/AQE pick physical plans;
Python only runs inside Arrow-batched Pandas UDFs where built-ins cannot
express the semantics (the user model callables of the MC battery).
"""

from .mc.battery import MCBattery
from .operators.rankstats import (
    bucketed_next_value,
    bucketed_running,
    sql_ntile,
    with_range_bucket,
)
from .registry import REGISTRY, register

__all__ = [
    "MCBattery",
    "REGISTRY",
    "register",
    # the scale-safe ranked-computation kernel (round 11): global
    # running sums / ranks / NTILE / LEAD without a global-sort window
    "bucketed_running",
    "bucketed_next_value",
    "with_range_bucket",
    "sql_ntile",
]
__version__ = "0.1.0"
