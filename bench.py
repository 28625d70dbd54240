#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Includes ``mc_demo_workload1``: the reference's own demo battery
(100,000 sims x 16 pts fair coin + 60,000 x 32 biased —
demos/demo_coin_sequences.ipynb cell 16) with the same pure-Python
per-point model, so the number is directly comparable to the reference's
sequential-per-model Beam DirectRunner execution.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: Representative slice of the registry: scan/agg, star join, shuffle join,
#: window, dedup scale path, ANN, streaming window, JSON + text scans.
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_revenue_by_nation",
    "q10_returned_items",
    "q_join_broadcast_inner",
    "q_join_asof",
    "q_window_topk_per_group",
    "q_stream_tumbling_hourly",
    "q_json_extract",
    "q_dedup_minhash_lsh",
    "q_sim_brute_topk",
    "q_text_quality_score",
    "q_pipeline_llm_curation",
    "q09_product_profit",
    "q_gapfill_forward_fill",
]


def _noop_write(df) -> None:
    """Force full computation without a driver collect."""
    df.write.format("noop").mode("overwrite").save()


def bench_mc(spark, vectorized: bool = False) -> float:
    from parallel_monte_carlo_simulations_spark.mc.battery import MCBattery
    from parallel_monte_carlo_simulations_spark.mc.queries import (
        _coin_sequence,
        _coin_sequence_vectorized,
    )

    model = _coin_sequence_vectorized if vectorized else _coin_sequence
    battery = MCBattery({"rng": "Philox", "master_seed": 42})
    t0 = time.time()
    traces = battery.simulate(
        [model, model],
        [
            {"number_simulations": 100_000, "number_points": 16,
             "parameters": [0.5], "batch_size": 10_000},
            {"number_simulations": 60_000, "number_points": 32,
             "parameters": [0.7], "batch_size": 10_000},
        ],
        spark=spark,
    )
    _noop_write(traces)
    return time.time() - t0


def main() -> None:
    from parallel_monte_carlo_simulations_spark.registry import load_all_queries
    from parallel_monte_carlo_simulations_spark.session import get_spark

    spark = get_spark(
        app_name="pmcs-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all_queries()

    # Warm the JVM/codegen and the Python-worker daemon once so per-query
    # numbers reflect steady state (first mapInPandas otherwise pays the
    # numpy/pandas import in every forked worker).
    specs["q_filter_project"].fn(spark, SF_DIR).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        _noop_write(specs[name].fn(spark, SF_DIR))
        times[name] = round(time.time() - t0, 3)
        # isolate measurements: drop persisted frames the query created
        spark.catalog.clearCache()

    times["mc_demo_workload1"] = round(bench_mc(spark), 3)
    times["mc_demo_workload1_vectorized"] = round(bench_mc(spark, vectorized=True), 3)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None
    out = {
        "metric": f"headline-suite seconds ({len(HEADLINE)} relational/LLM queries + reference demo MC workload)",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
