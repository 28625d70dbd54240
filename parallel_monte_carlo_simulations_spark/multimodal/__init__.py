"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Importing registers the queries."""

from . import boxfilter, media, media2  # noqa: F401
