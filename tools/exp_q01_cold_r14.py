#!/usr/bin/env python
"""Cold-JVM attribution A/B for q01_pricing_summary (r14, VERDICT #2).

The r13 same-JVM probe (tools/exp_q01_r13.py) showed the floor-form
units conversion at ~parity with the r12 raw-double form, yet the
driver's bench — which times q01 FIRST, in a fresh JVM, with only the
q_filter_project warmup — recorded ~2x. Hypothesis: the residual is a
per-JVM FIXED cost (analysis/codegen of the much larger converted
expression tree), invisible to any warmed probe.

Protocol: each (variant, rep) runs in a FRESH process under
bench-identical conditions (1g heap, local[CPUS], shuffle=CPUS, same
warmup as bench.py), interleaved variant-by-variant so machine weather
is shared. Each process times the SAME query three times: run1 = the
bench's number (cold: analysis + codegen + execute), run2/3 = steady
state. cold - warm = the fixed cost.

Variants:
  head       — the registered q01 (exact units + rdiv projection)
  r12raw     — the r12 raw-double form (measurement baseline ONLY)
  aggonly    — HEAD's aggregate, final projection returns raw u-sums
               (isolates the rdiv_halfup_expr projection's fixed cost)
"""
import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _child(variant: str) -> None:
    from pyspark.sql import functions as F

    from parallel_monte_carlo_simulations_spark.functions.microunit import (
        rdiv_halfup_expr,
        units_col,
    )
    from parallel_monte_carlo_simulations_spark.registry import (
        load_all_queries,
    )
    from parallel_monte_carlo_simulations_spark.session import get_spark
    from parallel_monte_carlo_simulations_spark.tables import table

    spark = get_spark(
        app_name="exp-q01-cold",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.driver.memory": "1g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all_queries()
    # bench.py's exact warmup
    specs["q_filter_project"].fn(spark, SF_DIR).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def head():
        return specs["q01_pricing_summary"].fn(spark, SF_DIR)

    def r12raw():
        l = table(spark, SF_DIR, "lineitem")
        disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return (
            l.filter(
                F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
            )
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
                F.round(
                    F.sum(disc_price * (1 + F.col("l_tax"))), 2
                ).alias("sum_charge"),
                F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
                F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                F.count("*").alias("count_order"),
            )
        )

    def aggonly():
        l = table(spark, SF_DIR, "lineitem")
        qty_u0 = units_col(F.col("l_quantity"), 0)
        price_u2 = units_col(F.col("l_extendedprice"), 2)
        inv_disc_u2 = units_col(1 - F.col("l_discount"), 2)
        tax1_u2 = units_col(1 + F.col("l_tax"), 2)
        return (
            l.filter(
                F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
            )
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(qty_u0).alias("qty_u0"),
                F.sum(price_u2).alias("price_u2"),
                F.sum(price_u2 * inv_disc_u2).alias("disc_price_u4"),
                F.sum(price_u2 * inv_disc_u2 * tax1_u2).alias("charge_u6"),
                F.sum(units_col(F.col("l_discount"), 2)).alias("disc_u2"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    def layered():
        g = aggonly()
        outs = [
            ("sum_qty", "qty_u0", "1", 2),
            ("sum_base_price", "price_u2", "100", 2),
            ("sum_disc_price", "disc_price_u4", "10000", 2),
            ("sum_charge", "charge_u6", "1000000", 2),
            ("avg_qty", "qty_u0", "n", 4),
            ("avg_price", "price_u2", "n * 100", 4),
            ("avg_disc", "disc_u2", "n * 100", 4),
        ]
        l1 = {}
        for name, num, den, dg in outs:
            l1[f"_a_{name}"] = F.expr(
                f"CASE WHEN ({num}) IS NULL THEN NULL ELSE abs({num}) END"
            )
            l1[f"_d_{name}"] = F.expr(
                f"CASE WHEN ({den}) IS NULL OR ({den}) = 0 "
                f"THEN NULL ELSE ({den}) END"
            )
            l1[f"_neg_{name}"] = F.expr(f"({num}) < 0")
        df = g.withColumns(l1)
        l2 = {}
        for name, _num, _den, dg in outs:
            s = 10**dg
            l2[f"_f0_{name}"] = F.expr(
                f"((_a_{name} % _d_{name}) * {2 * s} + _d_{name}) "
                f"div (2 * _d_{name})"
            )
            l2[f"_q0_{name}"] = F.expr(f"_a_{name} div _d_{name}")
        df = df.withColumns(l2)
        l3 = {}
        for name, _num, _den, dg in outs:
            s = 10**dg
            l3[f"_w_{name}"] = F.expr(f"_q0_{name} + _f0_{name} div {s}")
            l3[f"_fr_{name}"] = F.expr(f"_f0_{name} % {s}")
        df = df.withColumns(l3)
        final = ["l_returnflag", "l_linestatus"]
        for name, _num, _den, dg in outs:
            final.append(
                F.expr(
                    f"cast(concat("
                    f"case when _neg_{name} and (_w_{name} > 0 or "
                    f"_fr_{name} > 0) then '-' else '' end, "
                    f"cast(_w_{name} as string), '.', "
                    f"lpad(cast(_fr_{name} as string), {dg}, '0')"
                    f") as double)"
                ).alias(name)
            )
        final.append(F.col("n").alias("count_order"))
        return df.select(*final)

    def _mini(num, den, dg):
        # minimal rdiv: valid when num >= 0 and den > 0 non-null (q01:
        # sums of non-negative units; dens are literals or COUNT >= 1)
        s = 10**dg
        f0 = f"(((({num}) % ({den})) * {2 * s} + ({den})) div (2 * ({den})))"
        return (
            f"cast(concat(cast(({num}) div ({den}) + {f0} div {s} "
            f"as string), '.', lpad(cast({f0} % {s} as string), {dg}, '0')"
            f") as double)"
        )

    def mini():
        g = aggonly()
        return g.select(
            "l_returnflag",
            "l_linestatus",
            F.expr(_mini("qty_u0", "1", 2)).alias("sum_qty"),
            F.expr(_mini("price_u2", "100", 2)).alias("sum_base_price"),
            F.expr(_mini("disc_price_u4", "10000", 2)).alias(
                "sum_disc_price"
            ),
            F.expr(_mini("charge_u6", "1000000", 2)).alias("sum_charge"),
            F.expr(_mini("qty_u0", "n", 4)).alias("avg_qty"),
            F.expr(_mini("price_u2", "n * 100", 4)).alias("avg_price"),
            F.expr(_mini("disc_u2", "n * 100", 4)).alias("avg_disc"),
            F.col("n").alias("count_order"),
        )

    def _newgen(num, den, dg, den_lit=None):
        # candidate general form: same output for ALL inputs, smaller tree
        s = 10**dg
        a = f"abs({num})"
        f0 = f"(((({a}) % ({den})) * {2 * s} + ({den})) div (2 * ({den})))"
        whole = f"(({a}) div ({den}) + {f0} div {s})"
        sign = (
            f"case when ({num}) < 0 and (({a}) >= ({den}) or "
            f"(({a}) % ({den})) * {2 * s} >= ({den})) then '-' else '' end"
        )
        body = (
            f"cast(concat({sign}, cast({whole} as string), '.', "
            f"lpad(cast({f0} % {s} as string), {dg}, '0')) as double)"
        )
        if den_lit is not None and den_lit > 0:
            if den_lit == 1:
                return f"cast(({num}) as double)"
            if den_lit == s:
                return (
                    f"cast(concat(case when ({num}) < 0 then '-' else '' "
                    f"end, cast(({a}) div {s} as string), '.', "
                    f"lpad(cast(({a}) % {s} as string), {dg}, '0')) "
                    f"as double)"
                )
            return body
        return (
            f"case when ({den}) = 0 then cast(null as double) "
            f"else {body} end"
        )

    def newgen():
        g = aggonly()
        return g.select(
            "l_returnflag",
            "l_linestatus",
            F.expr(_newgen("qty_u0", "1", 2, 1)).alias("sum_qty"),
            F.expr(_newgen("price_u2", "100", 2, 100)).alias(
                "sum_base_price"
            ),
            F.expr(_newgen("disc_price_u4", "10000", 2, 10000)).alias(
                "sum_disc_price"
            ),
            F.expr(_newgen("charge_u6", "1000000", 2, 1000000)).alias(
                "sum_charge"
            ),
            F.expr(_newgen("qty_u0", "n", 4)).alias("avg_qty"),
            F.expr(_newgen("price_u2", "n * 100", 4)).alias("avg_price"),
            F.expr(_newgen("disc_u2", "n * 100", 4)).alias("avg_disc"),
            F.col("n").alias("count_order"),
        )

    fns = {
        "head": head,
        "r12raw": r12raw,
        "aggonly": aggonly,
        "layered": layered,
        "mini": mini,
        "newgen": newgen,
    }
    if variant == "check":
        a = head().orderBy("l_returnflag", "l_linestatus").collect()
        b = layered().orderBy("l_returnflag", "l_linestatus").collect()
        c = mini().orderBy("l_returnflag", "l_linestatus").collect()
        d = newgen().orderBy("l_returnflag", "l_linestatus").collect()
        ad = [r.asDict() for r in a]
        print(
            json.dumps(
                {
                    "variant": "check",
                    "layered_identical": ad == [r.asDict() for r in b],
                    "mini_identical": ad == [r.asDict() for r in c],
                    "newgen_identical": ad == [r.asDict() for r in d],
                }
            )
        )
        spark.stop()
        return
    fn = fns[variant]
    runs = []
    for _ in range(3):
        t0 = time.time()
        noop(fn())
        runs.append(round(time.time() - t0, 3))
    print(json.dumps({"variant": variant, "runs": runs}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1:
        _child(sys.argv[1])
        return
    variants = os.environ.get("VARIANTS", "head,r12raw,aggonly").split(",")
    reps = int(os.environ.get("REPS", "3"))
    cold: dict[str, list[float]] = {v: [] for v in variants}
    warm: dict[str, list[float]] = {v: [] for v in variants}
    for rep in range(reps):
        for v in variants:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), v],
                capture_output=True,
                text=True,
            )
            line = [
                ln for ln in r.stdout.splitlines() if ln.startswith("{")
            ][-1]
            d = json.loads(line)
            cold[v].append(d["runs"][0])
            warm[v].append(min(d["runs"][1:]))
            print(f"rep{rep} {v:8s} runs={d['runs']}", flush=True)
    out = {}
    for v in variants:
        out[v] = {
            "cold_median": statistics.median(cold[v]),
            "warm_median": statistics.median(warm[v]),
            "cold": cold[v],
            "warm": warm[v],
        }
        print(
            f"{v:8s} cold_med={out[v]['cold_median']:.3f} "
            f"warm_med={out[v]['warm_median']:.3f} "
            f"fixed={out[v]['cold_median'] - out[v]['warm_median']:.3f}"
        )
    with open(os.path.join(REPO, "plans/r14/q01_cold_ab.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
