#!/usr/bin/env python
"""Natural-x10 scale cells, round 13 (judge directive #4).

Re-measures the q_curation_dup_flow_matrix x10 cell whose r12 record
was taken at load1 6.84 (protocol violation: cells must start quiet),
plus q_bpe_encode whose defining module changed in the r13 rounding
conversion. Protocol matches SCALE_NATURAL6 (min of 2 reps, noop write,
local[32]) with one upgrade the judge directed: the tool now REFUSES to
measure a loaded cell — it blocks until 1-min load < LOAD_GATE (same
2.0 gate bench.py applies), and aborts the cell after WAIT_MAX_S so a
busy box yields a loud error instead of a silently-inflated ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
NAT = os.path.join(REPO, ".scale", "sf1.0-natural")

NAMES = [
    "q_curation_dup_flow_matrix",
    "q_bpe_encode",
]

LOAD_GATE = 2.0
WAIT_MAX_S = 1800


def _load1() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def _wait_quiet() -> float:
    """Block until the box is quiet; raise if it never gets there."""
    t0 = time.time()
    while True:
        load = _load1()
        if load < LOAD_GATE:
            return load
        if time.time() - t0 > WAIT_MAX_S:
            raise RuntimeError(
                f"box never went quiet (load1 {load:.2f} >= {LOAD_GATE} "
                f"after {WAIT_MAX_S}s) — refusing to record a loaded cell"
            )
        print(f"load1 {load:.2f} >= {LOAD_GATE}, waiting...", flush=True)
        time.sleep(30)


def main() -> None:
    from parallel_monte_carlo_simulations_spark.registry import load_all_queries
    from parallel_monte_carlo_simulations_spark.session import get_spark

    spark = get_spark(
        app_name="scale-natural-r13",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all_queries()

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            specs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        return round(best, 2)

    specs["q_filter_project"].fn(spark, SF01).count()  # warm

    out: dict[str, dict] = {}
    for name in NAMES:
        cell: dict[str, float] = {"load1_before": _wait_quiet()}
        try:
            cell["0.1"] = run(name, SF01)
            cell["1.0-natural"] = run(name, NAT)
            cell["ratio_10x"] = round(cell["1.0-natural"] / cell["0.1"], 2)
        except Exception as e:  # noqa: BLE001
            cell["error"] = f"{type(e).__name__}: {e}"[:200]
        out[name] = cell
        print(name, json.dumps(cell), flush=True)

    path = os.path.join(REPO, "SCALE_NATURAL7_r13.json")
    record = {
        "_protocol": (
            "round-13 natural x10 cells: min of 2 reps, noop write, "
            "local[32]; re-measures the r12 dup-flow cell that violated "
            "the quiet-box protocol (load1 6.84) and q_bpe_encode after "
            "the rounding conversion; the tool now blocks until "
            f"load1 < {LOAD_GATE} and refuses (errors) rather than "
            "records a loaded cell"
        ),
    }
    record.update(out)
    with open(path, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("->", path)


if __name__ == "__main__":
    main()


