#!/usr/bin/env python
"""Round-11 natural-growth scale cells.

Three batches, one protocol (per-cell MINIMUM over 2 reps at sf0.1 and
at the 10x natural-growth dataset; noop-write materialization):

1. KERNEL — every query converted from a global ranked window to the
   range-bucketed kernel (operators/rankstats.py). Done-criterion from
   the round-10 verdict: the x10 ratio held or improved after the
   conversion.
2. EVAL — q_stat_mcnemar / q_pr_auc / q_ml_lift_deciles, which shipped
   in round 10 with tiled cells only (verdict item 6).
3. READJUDICATION — the five round-10 cells whose 3.7-5.6x tiled
   ratios were adjudicated as box saturation via DuckDB-counted work;
   re-run on a quiet box to confirm the sf0.1 baseline was
   compute-bound (verdict item 4). Run these only when ambient load is
   low; the script records load before every cell.

Datasets: events-/documents-backed queries use .scale/sf1.0-natural
(fitted marginals, fresh content); orders/customer/lineitem/supplier-
backed ones use the natural-rel growth written into the same dir by
``python tools/gen_sf1.py --natural-rel`` (fresh keys, donor-sampled
attributes, hash-sampled FKs over the grown domain).

    python tools/gen_sf1.py --natural --natural-events --natural-rel
    python tools/scale_natural_r11.py [batch1,batch2,...]
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

KERNEL = [
    "q_ks_two_sample",
    "q_mann_whitney_u",
    "q_wasserstein_two_sample",
    "q_psi_drift",
    "q_bootstrap_ci_mean",
    "q_mad_outliers",
    "q_funnel_time_to_convert",
    "q_interval_concurrency",
    "q_ml_lift_deciles",
    "q_customer_rfm",
    "q_window_cume_dist",
    "q_abc_pareto",
    "q_window_ntile",
    "q_window_percent_rank",
    "q_window_range_frame",
    "q_gini_concentration",
    "q_gaps_islands_key_ranges",
    "q_ml_conformal_interval",
    "q_privacy_k_anonymity",
    "q_privacy_pseudonymize",
    "q_feat_quantile_binning",
    "q_weighted_percentiles",
    "q_winsorized_means",
    "q_roc_auc",
    "q_spearman_corr",
    "q_text_quality_calibration",
    "q_dataset_interleave",
    "q_sample_balanced_classes",
    "q_sequence_packing",
    "q_curation_token_budget",
]
EVAL = ["q_stat_mcnemar", "q_pr_auc", "q_ml_lift_deciles"]
READJ = [
    "q_graph_adamic_adar",
    "q_graph_modularity",
    "q_graph_cosuppliers",
    "q_dedup_containment_df_report",
    "q_text_ngram_novelty",
]
BATCHES = {"kernel": KERNEL, "eval": EVAL, "readj": READJ}


def _load1() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def main() -> None:
    batches = (sys.argv[1].split(",") if len(sys.argv) > 1
               else ["kernel", "eval", "readj"])
    names: list[str] = []
    for b in batches:
        for n in BATCHES[b]:
            if n not in names:
                names.append(n)

    from parallel_monte_carlo_simulations_spark.registry import load_all_queries
    from parallel_monte_carlo_simulations_spark.session import get_spark

    spark = get_spark(
        app_name="scale-natural-r11",
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

    # warm
    specs["q_filter_project"].fn(spark, SF01).count()

    out: dict[str, dict] = {}
    for name in names:
        cell: dict[str, float] = {"load1_before": _load1()}
        try:
            cell["0.1"] = run(name, SF01)
            cell["1.0-natural"] = run(name, NAT)
            cell["ratio_10x"] = round(cell["1.0-natural"] / cell["0.1"], 2)
        except Exception as e:  # noqa: BLE001
            cell["error"] = f"{type(e).__name__}: {e}"[:200]
        out[name] = cell
        print(name, json.dumps(cell), flush=True)

    path = os.path.join(REPO, "SCALE_NATURAL5_r11.json")
    record = {
        "_protocol": (
            "round-11 natural x10 cells: min of 2 reps, noop write, "
            "local[32]; kernel batch = global-window->rankstats "
            "conversions (verdict item 1 done-criterion), eval batch = "
            "mcnemar/pr_auc/lift (item 6), readj batch = quiet-box "
            "re-run of the five box-saturation adjudications (item 4); "
            "per-cell 1-min load recorded before measurement"
        ),
    }
    record.update(out)
    with open(path, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("->", path)


if __name__ == "__main__":
    main()
