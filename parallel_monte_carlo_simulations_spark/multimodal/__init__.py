"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Importing registers the queries."""

from . import adpcm, boxfilter, media, media2, spectralband  # noqa: F401
