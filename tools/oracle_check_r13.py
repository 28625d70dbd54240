#!/usr/bin/env python
"""Targeted oracle check at an arbitrary SF dir (r13 optimization round).

Same comparison as tools/sim_driver_window.py (driver-conditions plain
session + tests/_compare), but the data directory is an argument so a
restructured query can be proven equivalent at sf0.001/0.01/0.1 before
the change is committed.

Usage: python tools/oracle_check_r13.py SF_DIR name[,name...]
"""

from __future__ import annotations

import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir, names = sys.argv[1], sys.argv[2].split(",")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as ent
    from tests._compare import compare

    qs, osql = ent.queries(), ent.oracle_sql()
    failures = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            if name in osql:
                rep = compare(df, osql[name], sf_dir)
                ok = rep["ok"]
                detail = (
                    ""
                    if ok
                    else str({k: v for k, v in rep.items() if k != "ok"})[:300]
                )
                rows = rep.get("spark_rows")
            else:
                pdf = df.toPandas()
                rows = len(pdf)
                ok = rows > 0
                detail = "" if ok else "0 rows (vacuous)"
        except Exception as e:  # noqa: BLE001
            ok, rows, detail = False, None, f"{type(e).__name__}: {e}"[:300]
        status = "ok " if ok else "FAIL"
        print(
            f"[{i + 1:3d}/{len(names)}] {status} {name:40s} rows={rows} "
            f"{time.time() - t0:5.1f}s {detail}",
            flush=True,
        )
        if not ok:
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed @ {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
