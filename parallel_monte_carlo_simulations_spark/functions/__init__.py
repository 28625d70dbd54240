"""Reusable column-level function families + registered text-analysis
queries. Importing registers the queries."""

from . import bm25f, boilerplate, bpe, calibration, curation2, datasetops, gopher, keywords, lm, lm2, nbayes, prf, readability, redaction, sampling2, selection, sharding, text, textrank  # noqa: F401

# NOTE: .pipeline is imported by registry.load_all_queries AFTER the dedup
# package (it composes dedup.minhash; importing it here would be circular:
# dedup.minhash -> functions.hashing -> functions.__init__ -> pipeline ->
# dedup.minhash).
from .hashing import hash60, hash60_seeded, shingles
from .vectors import cosine, dot, norm

__all__ = ["hash60", "hash60_seeded", "shingles", "cosine", "dot", "norm"]
