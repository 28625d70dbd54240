"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine. Importing registers the queries."""

from . import cdc, clusters, containment, embedding, exact, minhash, minhash_eval, ml_lsh, ngram, prefixjoin, segments, semantic, simhash, templates, urlnorm, winnow  # noqa: F401
