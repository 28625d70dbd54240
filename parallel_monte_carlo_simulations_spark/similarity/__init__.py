"""Similarity search: exact brute-force cosine top-k baseline + two
approximate scale paths (random-hyperplane LSH, KMeans IVF).
Importing registers the queries."""

from . import brute, centroid, hybrid, irmetrics, ivf, knneval, lsh, metrics, mining, mmr, pca, pq, quality, prep, randproj, recall  # noqa: F401
