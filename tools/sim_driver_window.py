#!/usr/bin/env python
"""Simulate the round driver's correctness window locally.

Mirrors the driver contract end-to-end: imports ``__spark_entry__`` with a
PLAIN SparkSession (default shuffle partitions, ANSI on in Spark 4 — not
the package's tuned session), runs the first N entries of ``queries()``
at sf0.01, and for each either

- compares against its ``oracle_sql()`` entry via DuckDB
  (tests/_compare.compare — row count + schema + value hash), or
- runs the driver's rows-only canonicalization (toPandas + sort_values
  over all columns) for oracle-less queries, which is exactly the step
  that crashed q_mc_simulate_traces in round 3.

Usage: python tools/sim_driver_window.py [N] [--names q_a,q_b,...]
"""

from __future__ import annotations

import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def main() -> int:
    n = 50
    only: list[str] | None = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--names":
            only = args.pop(0).split(",")
        else:
            n = int(a)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as ent
    from tests._compare import compare

    sf_dir = "/root/testdata/sf0.01"
    qs, osql = ent.queries(), ent.oracle_sql()
    names = only if only else list(qs)[:n]
    failures = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            if name in osql:
                rep = compare(df, osql[name], sf_dir)
                ok = rep["ok"]
                detail = "" if ok else str({k: v for k, v in rep.items() if k != "ok"})[:300]
                rows = rep.get("spark_rows")
            else:
                pdf = df.toPandas()
                pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
                rows = len(pdf)
                ok = rows > 0
                detail = "" if ok else "0 rows (vacuous)"
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            ok, rows, detail = False, None, f"{type(e).__name__}: {e}"[:300]
        dt = time.time() - t0
        status = "ok " if ok else "FAIL"
        print(f"[{i+1:3d}/{len(names)}] {status} {name:40s} rows={rows} {dt:5.1f}s {detail}",
              flush=True)
        if not ok:
            failures.append((name, detail))

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    for name, detail in failures:
        print(f"FAIL {name}: {detail}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
