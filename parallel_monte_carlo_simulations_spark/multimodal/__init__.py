"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Importing registers the queries."""

from . import media  # noqa: F401
