#!/usr/bin/env python
"""Round-13 optimization probe: per-query timing + formatted plans.

Usage:
    python tools/opt_probe_r13.py TAG [--reps N] [query ...]

For each named query (default: the bench HEADLINE list) this

- captures ``explain("formatted")`` to ``plans/r13/<query>_<TAG>.txt``
  (the judge-facing before/after plan evidence), and
- times ``REPS`` noop-sink materializations (guide §1.4: the noop sink
  computes every column of every row without paying a real sink),
  reporting min/median per query to stdout and
  ``plans/r13/timings_<TAG>.json``.

Runs under the SAME conditions as one bench attempt: fresh process,
``local[$SPARK_GRAFT_CPUS]`` master, shuffle partitions = core count,
1g pinned driver heap, cache cleared between queries. Jobs are labelled
(guide §1.5) so the UI/event log attributes stages to queries.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    mid = len(s) // 2
    return round(s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2.0, 3)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if not args:
        raise SystemExit("usage: opt_probe_r13.py TAG [--reps N] [query ...]")
    tag = args.pop(0)
    reps = 3
    if args and args[0] == "--reps":
        args.pop(0)
        reps = int(args.pop(0))

    from bench import HEADLINE
    from parallel_monte_carlo_simulations_spark.registry import load_all_queries
    from parallel_monte_carlo_simulations_spark.session import get_spark

    names = args or list(HEADLINE)
    spark = get_spark(
        app_name=f"pmcs-opt-probe-{tag}",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.driver.memory": "1g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all_queries()

    # same warmup as bench.py: JVM/codegen + the Python worker daemon
    specs["q_filter_project"].fn(spark, SF_DIR).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    os.makedirs("plans/r13", exist_ok=True)
    out: dict[str, dict] = {}
    for name in names:
        df = specs[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"plans/r13/{name}_{tag}.txt", "w") as fh:
            fh.write(plan)
        tree = plan.split("\n\n")[0]
        shape = {
            "exchanges": len(re.findall(r"\bExchange\b", tree)),
            "sorts": len(re.findall(r"\bSort\b", tree)),
            "smj": len(re.findall(r"SortMergeJoin", tree)),
            "bhj": len(re.findall(r"BroadcastHashJoin", tree)),
            "shj": len(re.findall(r"ShuffledHashJoin", tree)),
            "python": len(
                re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow", tree)
            ),
        }
        spark.catalog.clearCache()
        samples = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{tag}:{name}#{r}")
            # fn() INSIDE the timed region, matching bench.py exactly
            # (some queries do eager work in fn, e.g. bucketed writes).
            t0 = time.time()
            df = specs[name].fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "samples": samples,
            "median": _median(samples),
            "min": min(samples),
            **shape,
        }
        print(
            f"{name:36s} med={out[name]['median']:7.3f} min={min(samples):7.3f} "
            f"ex={shape['exchanges']:2d} sort={shape['sorts']:2d} "
            f"smj={shape['smj']} bhj={shape['bhj']} shj={shape['shj']} "
            f"py={shape['python']}",
            flush=True,
        )
    with open(f"plans/r13/timings_{tag}.json", "w") as fh:
        json.dump(
            {"sf_dir": SF_DIR, "cpus": CPUS, "reps": reps, "queries": out},
            fh, indent=1, sort_keys=True,
        )
        fh.write("\n")


if __name__ == "__main__":
    main()
