"""Reusable column-level function families + registered text-analysis
queries. Importing registers the queries."""

from . import text  # noqa: F401
from .hashing import hash60, hash60_seeded, shingles
from .vectors import cosine, dot, norm

__all__ = ["hash60", "hash60_seeded", "shingles", "cosine", "dot", "norm"]
