#!/usr/bin/env python
"""Measured data-skipping study: Z-order vs linear sort layout.

Writes the same point set (the spatial family's derived customer
points) as partitioned parquet twice — once range-sorted by a single
axis (linear), once by the interleaved Z-order key — then evaluates a
2-D box predicate against each file's parquet footer min/max stats
(exactly what Spark's parquet reader and Delta/Iceberg data skipping
do) and reports how many files each layout can prune.

The point: a linear sort gives perfect pruning on the sort axis and
none on the other; Z-order gives partial pruning on BOTH axes, which
wins for 2-D selective scans. This is the measurable justification for
the q_geo_zorder_cells layout key.

    python tools/zorder_skipping_study.py
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 64

# the 2-D query boxes: f x f windows of the point domain
BOX_FRACS = (0.05, 0.10, 0.25)


def main() -> None:
    import pyarrow.parquet as pq

    from parallel_monte_carlo_simulations_spark.operators.spatial import (
        SPAN_MICRO,
        Z_BITS,
        _points,
        _zorder_col,
    )
    from parallel_monte_carlo_simulations_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="zorder-study", master="local[8]",
                      shuffle_partitions=N_FILES)
    spark.sparkContext.setLogLevel("ERROR")

    pts = _points(spark, SF_DIR)
    bx = F.expr(f"(lon * {1 << Z_BITS}) DIV {SPAN_MICRO + 1}")
    by = F.expr(f"(lat * {1 << Z_BITS}) DIV {SPAN_MICRO + 1}")
    enriched = pts.select(
        "pid", "lat", "lon", bx.alias("bx"), by.alias("by")
    ).select(
        "*", _zorder_col(F.col("bx"), F.col("by")).alias("z")
    )

    def stats_prune(path: str, lo: int, hi: int) -> tuple[int, int, int]:
        """(files_total, files_needed, rows_in_needed) for the box
        predicate lat in [lo, hi] AND lon in [lo, hi], judged from
        footer min/max only."""
        total = needed = rows = 0
        for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
            md = pq.read_metadata(f)
            fmin = {"lat": None, "lon": None}
            fmax = {"lat": None, "lon": None}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name in fmin and col.statistics is not None:
                        s = col.statistics
                        fmin[name] = (
                            s.min if fmin[name] is None else min(fmin[name], s.min)
                        )
                        fmax[name] = (
                            s.max if fmax[name] is None else max(fmax[name], s.max)
                        )
            total += 1
            overlaps = all(
                fmin[a] is not None and not (fmax[a] < lo or fmin[a] > hi)
                for a in ("lat", "lon")
            )
            if overlaps:
                needed += 1
                rows += md.num_rows
        return total, needed, rows

    with tempfile.TemporaryDirectory() as td:
        linear_path = os.path.join(td, "linear")
        zorder_path = os.path.join(td, "zorder")
        # linear: range-partition + sort by one axis only
        (
            enriched.repartitionByRange(N_FILES, "lat")
            .sortWithinPartitions("lat")
            .write.mode("overwrite")
            .parquet(linear_path)
        )
        # zorder: range-partition + sort by the interleaved key
        (
            enriched.repartitionByRange(N_FILES, "z")
            .sortWithinPartitions("z")
            .write.mode("overwrite")
            .parquet(zorder_path)
        )
        for frac in BOX_FRACS:
            lo = int(SPAN_MICRO * 0.45)
            hi = int(SPAN_MICRO * (0.45 + frac))
            lt, ln, lr = stats_prune(linear_path, lo, hi)
            zt, zn, zr = stats_prune(zorder_path, lo, hi)
            true_rows = enriched.where(
                (F.col("lat") >= lo) & (F.col("lat") <= hi)
                & (F.col("lon") >= lo) & (F.col("lon") <= hi)
            ).count()
            ratio = f"{lr / zr:.1f}x" if zr else "inf"
            print(
                f"box {frac:.0%}: true rows {true_rows} | "
                f"linear scans {ln}/{lt} files ({lr} rows) | "
                f"zorder scans {zn}/{zt} files ({zr} rows) | "
                f"zorder row advantage {ratio}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
