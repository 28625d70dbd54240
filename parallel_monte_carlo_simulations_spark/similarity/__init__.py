"""Similarity search: exact brute-force cosine top-k baseline + LSH
approximate path. Importing registers the queries."""

from . import brute, lsh  # noqa: F401
