"""Source/sink coverage (CSV, JSON, partitioned parquet roundtrips).
Importing registers the queries."""

from . import roundtrip  # noqa: F401
