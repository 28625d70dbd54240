#!/usr/bin/env python
"""Time every registered query the way the driver's correctness gate does:
plain SparkSession (local[8], ANSI, driver-like defaults), sf0.01, Spark
collect + DuckDB oracle per query. Prints per-query seconds sorted slowest
first plus the total — the feedback loop for getting all registered
queries through the driver's per-round budget.

    python tools/sweep_timing.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from pyspark.sql import SparkSession

    # Driver-like plain session: no engine defaults, ANSI on (Spark 4
    # default), stock shuffle partitions.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("sweep-timing")
        .getOrCreate()
    )

    from parallel_monte_carlo_simulations_spark.registry import load_all_queries
    from tests._compare import duckdb_connection

    specs = load_all_queries()
    times: dict[str, dict[str, float]] = {}
    t_all = time.time()
    for name, spec in specs.items():
        t0 = time.time()
        try:
            df = spec.fn(spark, SF_DIR)
            rows = df.collect()
            t_spark = time.time() - t0
            t1 = time.time()
            if spec.oracle:
                con = duckdb_connection(SF_DIR)
                try:
                    con.execute(spec.oracle).fetchall()
                finally:
                    con.close()
            t_duck = time.time() - t1
            times[name] = {
                "spark": round(t_spark, 2),
                "duck": round(t_duck, 2),
                "total": round(t_spark + t_duck, 2),
                "rows": len(rows),
            }
        except Exception as e:  # noqa: BLE001
            times[name] = {"error": str(e)[:200], "total": round(time.time() - t0, 2)}
        print(f"{name}: {times[name]}", flush=True)

    total = time.time() - t_all
    print("\n=== slowest 25 ===")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1]["total"])[:25]:
        print(f"{t['total']:7.2f}s  {name}  {t}")
    print(f"\nTOTAL {total:.1f}s for {len(times)} queries "
          f"({total / len(times):.2f}s avg)")
    with open("/tmp/sweep_timing.json", "w") as fh:
        json.dump({"total_sec": total, "queries": times}, fh, indent=1)


if __name__ == "__main__":
    main()
