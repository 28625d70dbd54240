"""Source/sink coverage (CSV, JSON, partitioned parquet roundtrips).
Importing registers the queries."""

from . import bucketed, evolution, filemeta, pysource, pystreamsource, roundtrip, xmlsource  # noqa: F401
