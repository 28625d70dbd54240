#!/usr/bin/env python
"""Round-12 natural-growth scale cells.

Same protocol as tools/scale_natural_r11.py (per-cell MINIMUM over 2
reps at sf0.1 and at the 10x natural-growth dataset, noop-write
materialization, per-cell load1 recorded): one batch covering the
round-12 registrations and semantics changes —

- q_bpe_encode: new tokenizer-application query (train 3 merges, apply,
  histogram tokens/doc);
- q_curation_dup_flow_matrix: dup key changed from full-text md5 to the
  first-8-token prefix fingerprint (r11 verdict #1 non-vacuity fix), so
  its old evidence doesn't describe the new join volume.

    python tools/scale_natural_r12.py
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
    "q_bpe_encode",
    "q_curation_dup_flow_matrix",
]


def _load1() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def main() -> None:
    from parallel_monte_carlo_simulations_spark.registry import load_all_queries
    from parallel_monte_carlo_simulations_spark.session import get_spark

    spark = get_spark(
        app_name="scale-natural-r12",
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
        cell: dict[str, float] = {"load1_before": _load1()}
        try:
            cell["0.1"] = run(name, SF01)
            cell["1.0-natural"] = run(name, NAT)
            cell["ratio_10x"] = round(cell["1.0-natural"] / cell["0.1"], 2)
        except Exception as e:  # noqa: BLE001
            cell["error"] = f"{type(e).__name__}: {e}"[:200]
        out[name] = cell
        print(name, json.dumps(cell), flush=True)

    path = os.path.join(REPO, "SCALE_NATURAL6_r12.json")
    record = {
        "_protocol": (
            "round-12 natural x10 cells: min of 2 reps, noop write, "
            "local[32]; covers the r12 registrations/changes "
            "(q_bpe_encode new; dup_flow_matrix re-keyed to the prefix "
            "fingerprint); per-cell 1-min load recorded before "
            "measurement"
        ),
    }
    record.update(out)
    with open(path, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("->", path)


if __name__ == "__main__":
    main()
