#!/usr/bin/env python
"""Drift-immune before/after for every query changed in round 13.

This box's multi-core throughput drifts 2-3x within hours (documented
since r4), so two bench runs taken an hour apart measure the BOX, not
the code. This harness alternates fresh bench-identical processes
between the pre-optimization tree (a git worktree at the round's start
commit) and HEAD, rep by rep, so each old/new pair shares the same
minutes of machine weather; per-query medians over the interleaved reps
are the round's authoritative before/after numbers.

Usage:
    python tools/exp_oldnew_r13.py OLD_TREE [reps] [out.json]
    python tools/exp_oldnew_r13.py --child TREE OUT_JSON   (internal)

The child runs the same protocol as one bench.py attempt: fresh process,
local[$SPARK_GRAFT_CPUS], shuffle partitions = core count, 1g heap,
bench warmup, fn() inside the timed region, noop sink, clearCache
between queries.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

QUERIES = [
    "q_graph_pagerank",
    "q_dedup_minhash_lsh",
    "q_pipeline_llm_curation",
    "q_bpe_phrase_merges",
    "q_bpe_encode",
    "q_mc_american_lsmc",
    "q_sink_bucketed_join",
    "q_recsys_als_rank1",
    "q_bloom_join_prune",
    "q_search_phrase",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def child(tree: str, out_path: str) -> None:
    sys.path.insert(0, tree)
    from parallel_monte_carlo_simulations_spark.registry import (  # noqa: E402
        load_all_queries,
    )
    from parallel_monte_carlo_simulations_spark.session import (  # noqa: E402
        get_spark,
    )

    spark = get_spark(
        app_name="pmcs-exp-oldnew-r13",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.driver.memory": "1g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all_queries()
    # bench.py warmup: JVM/codegen + Python worker daemon
    specs["q_filter_project"].fn(spark, SF_DIR).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    times: dict[str, float] = {}
    for name in QUERIES:
        spark.sparkContext.setJobDescription(f"oldnew:{name}")
        t0 = time.time()
        specs[name].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        times[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
    with open(out_path, "w") as fh:
        json.dump(times, fh)


def main() -> None:
    if sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
        return
    old_tree = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    out_file = sys.argv[3] if len(sys.argv) > 3 else "plans/r13/oldnew_interleave.json"
    new_tree = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    runs: dict[str, list[dict[str, float]]] = {"old": [], "new": []}
    for rep in range(reps):
        for label, tree in (("old", old_tree), ("new", new_tree)):
            out = f"/tmp/oldnew_{label}_{rep}.json"
            with open("/proc/loadavg") as fh:
                load1 = float(fh.read().split()[0])
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", tree, out],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
                cwd=tree,
            )
            if r.returncode != 0:
                print(f"rep{rep} {label}: child failed rc={r.returncode}")
                continue
            with open(out) as fh:
                t = json.load(fh)
            t["_pre_load1"] = load1
            runs[label].append(t)
            print(
                f"rep{rep} {label:3s} load1={load1:5.2f} "
                + " ".join(f"{q.split('q_')[-1][:12]}={t[q]:.2f}" for q in QUERIES),
                flush=True,
            )

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return round(s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2, 3)

    summary = {
        q: {
            "old_median": med([r[q] for r in runs["old"]]),
            "new_median": med([r[q] for r in runs["new"]]),
            "old_min": min(r[q] for r in runs["old"]),
            "new_min": min(r[q] for r in runs["new"]),
        }
        for q in QUERIES
    }
    for q, s in summary.items():
        s["speedup_median"] = round(s["old_median"] / s["new_median"], 3) if s["new_median"] else None
        print(
            f"{q:28s} old med={s['old_median']:7.2f} new med={s['new_median']:7.2f} "
            f"x{s['speedup_median']}"
        )
    payload = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "reps": reps,
        "old_tree_commit": "710f728 (round-13 start, pre-optimization)",
        "protocol": (
            "alternating fresh bench-identical processes old/new per rep; "
            "per-query medians over interleaved reps (drift-immune)"
        ),
        "queries": summary,
        "runs": runs,
    }
    with open(out_file, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main()
