#!/usr/bin/env python
"""Same-JVM A/B probe for q01_pricing_summary: is the exact-units
conversion (r13 inherited, verdict-mandated) a real per-row cost vs the
r12 raw-double form, and does a cheaper unit-extraction expression help?

Variants (identical session, interleaved reps, noop sink):
  units_round  — the shipped form: F.round(col * 10^k, 0).cast(long)
                 (Spark Round on double = BigDecimal per row)
  units_floor  — floor(col * 10^k + 0.5) cast long (pure double math;
                 EQUIVALENT for non-negative money columns — floor(x+.5)
                 == HALF_UP for x >= 0; l_quantity/extendedprice/discount/
                 tax are all >= 0 by TPC-H data contract)
  raw_double   — the r12 pre-conversion form (measurement baseline ONLY)

Prints per-variant medians. Does not touch the registry.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_monte_carlo_simulations_spark.session import get_spark  # noqa: E402
from parallel_monte_carlo_simulations_spark.tables import table  # noqa: E402
from parallel_monte_carlo_simulations_spark.functions.microunit import (  # noqa: E402
    rdiv_halfup_expr,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def q01_units(spark, unit):
    l = table(spark, SF_DIR, "lineitem")
    qty_u0 = unit(F.col("l_quantity"), 0)
    price_u2 = unit(F.col("l_extendedprice"), 2)
    inv_disc_u2 = unit(1 - F.col("l_discount"), 2)
    tax1_u2 = unit(1 + F.col("l_tax"), 2)
    disc_u2 = unit(F.col("l_discount"), 2)
    g = (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_u0).alias("qty_u0"),
            F.sum(price_u2).alias("price_u2"),
            F.sum(price_u2 * inv_disc_u2).alias("disc_price_u4"),
            F.sum(price_u2 * inv_disc_u2 * tax1_u2).alias("charge_u6"),
            F.sum(disc_u2).alias("disc_u2"),
            F.count("*").alias("n"),
        )
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        rdiv_halfup_expr("qty_u0", "1", 2).alias("sum_qty"),
        rdiv_halfup_expr("price_u2", "100", 2).alias("sum_base_price"),
        rdiv_halfup_expr("disc_price_u4", "10000", 2).alias("sum_disc_price"),
        rdiv_halfup_expr("charge_u6", "1000000", 2).alias("sum_charge"),
        rdiv_halfup_expr("qty_u0", "n", 4).alias("avg_qty"),
        rdiv_halfup_expr("price_u2", "n * 100", 4).alias("avg_price"),
        rdiv_halfup_expr("disc_u2", "n * 100", 4).alias("avg_disc"),
        F.col("n").alias("count_order"),
    )


def unit_round(col, k):
    return F.round(col * (10**k), 0).cast("long")


def unit_floor(col, k):
    return F.floor(col * (10**k) + F.lit(0.5)).cast("long")


def q01_raw(spark):
    l = table(spark, SF_DIR, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def main():
    spark = get_spark(
        app_name="exp-q01",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.driver.memory": "1g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    variants = {
        "units_round": lambda: q01_units(spark, unit_round),
        "units_floor": lambda: q01_units(spark, unit_floor),
        "raw_double": lambda: q01_raw(spark),
    }
    # warm everything once
    for fn in variants.values():
        noop(fn())
    samples = {k: [] for k in variants}
    for rep in range(5):
        for k, fn in variants.items():
            t0 = time.time()
            noop(fn())
            samples[k].append(round(time.time() - t0, 3))
    for k, v in samples.items():
        print(f"{k:14s} median={statistics.median(v):.3f} all={v}")
    # sanity: the two unit forms must agree exactly
    a = q01_units(spark, unit_round).orderBy("l_returnflag", "l_linestatus").collect()
    b = q01_units(spark, unit_floor).orderBy("l_returnflag", "l_linestatus").collect()
    print("floor==round:", a == b)
    spark.stop()


if __name__ == "__main__":
    main()
