"""Structured Streaming surface: event-time windows (tumbling/sliding/
session) with batch-equivalent oracles, plus a genuine readStream
micro-batch job held to the same oracle."""

from . import extras, extras2, joins, runtime, sketchstream, stateful, statesource, windows  # noqa: F401
