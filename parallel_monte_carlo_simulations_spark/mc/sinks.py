"""Trace sinks.

CSV parity sink: the reference writes ONE local CSV per model — one
comma-joined row per trace, no header, overwrite mode
(``utils.py:15-23``; default filenames ``./{i}.txt`` per
``parallel_simulations.py:176-179``). Per-model files are a driver-side
convenience (per SURVEY.md §7 hard parts, per-model output is modest);
the scalable sink is plain ``df.write.parquet``.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def default_output_paths(n_models: int) -> list[str]:
    """Reference default naming (``parallel_simulations.py:176-179``)."""
    return [f"{i}.txt" for i in range(n_models)]


def export_traces_csv(traces: DataFrame, paths_by_model: dict[int, str]) -> None:
    """Write one CSV file per model, reference format (``utils.py:19-23``).

    Streams rows through ``toLocalIterator`` (never materializes the full
    trace table on the driver) ordered by sim_id for determinism.
    """
    for model_id, path in paths_by_model.items():
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)  # reference models.py:71-73
        rows = (
            traces.filter(F.col("model_id") == model_id)
            .orderBy("sim_id")
            .select("trace")
            .toLocalIterator()
        )
        with open(path, "w", newline="") as fh:  # "w" = overwrite, utils.py:19
            writer = csv.writer(fh)
            for row in rows:
                writer.writerow(row.trace)


def write_traces_parquet(traces: DataFrame, path: str, partition_by_model: bool = True) -> None:
    """Scalable sink: partitioned parquet (the queryable store)."""
    w = traces.write.mode("overwrite")
    if partition_by_model:
        w = w.partitionBy("model_id")
    w.parquet(path)
