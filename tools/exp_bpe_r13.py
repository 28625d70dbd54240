#!/usr/bin/env python
"""A/B experiment: BPE merge-round cache materialization (r13 round 2).

The per-round iteration state ``toks`` is persisted but LAZY in the
registered query; plans built against an unmaterialized cache see
UnknownPartitioning and re-exchange the corpus by doc_id every round
(the same effect the r13 session measured on the graph family).
Additionally the per-round lead-window frame ``tn`` is consumed by BOTH
the pair-count path and the merge path — the shared Exchange is reused
(ReuseExchange) but the Sort+Window above it runs twice per round.

Variants:
  A_current    registered _merge_rounds (lazy toks persist, shared tn)
  B_eager_toks toks.persist()+count() per round — no new caches, the
               next round's windows see the cached hash(doc_id) layout
  C_eager_tn   B + tn persisted+materialized per round: pair-count and
               merge paths both read the cache (one window pass instead
               of two), at the cost of 3 extra corpus-sized caches

Both q_bpe_phrase_merges-shaped outputs are asserted cell-identical to
variant A before timing. Usage: python tools/exp_bpe_r13.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

ROUNDS = 3


def _word_tokens(spark, sf_dir):
    from parallel_monte_carlo_simulations_spark.functions.bpe import _word_tokens

    return _word_tokens(spark, sf_dir)


def _merge_rounds_variant(toks: DataFrame, rounds: int, eager_toks: bool,
                          eager_tn: bool):
    w = Window.partitionBy("doc_id").orderBy("pos")
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    summaries = []
    for r in range(1, rounds + 1):
        tn = toks.withColumn("nxt", F.lead("tok").over(w))
        if eager_tn:
            tn = tn.persist()
            tn.count()
        top = (
            tn.where(F.col("nxt").isNotNull())
            .groupBy(F.col("tok").alias("a"), F.col("nxt").alias("b"))
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
        )
        m = tn.crossJoin(F.broadcast(top))
        mtch = (
            F.col("nxt").isNotNull()
            & (F.col("tok") == F.col("a"))
            & (F.col("nxt") == F.col("b"))
        )
        mm = m.select(
            "*",
            mtch.alias("mtch"),
            F.coalesce(F.lag(mtch).over(w), F.lit(False)).alias("prev_mtch"),
        )
        island_start = F.max(
            F.when(F.col("mtch") & ~F.col("prev_mtch"), F.col("pos"))
        ).over(wrows)
        keep = mm.withColumn(
            "kept",
            F.col("mtch") & ((F.col("pos") - island_start) % 2 == 0),
        )
        nk = keep.withColumn(
            "dropped", F.coalesce(F.lag("kept").over(w), F.lit(False))
        )
        toks = (
            nk.where(~F.col("dropped"))
            .select(
                "doc_id",
                (F.row_number().over(w) - 1).cast("long").alias("pos"),
                F.when(
                    F.col("kept"),
                    F.concat(F.col("a"), F.lit("_"), F.col("b")),
                )
                .otherwise(F.col("tok"))
                .alias("tok"),
            )
            .persist()
        )
        if eager_toks:
            toks.count()
        n_after = toks.agg(
            F.count(F.lit(1)).cast("long").alias("tokens_after")
        )
        summaries.append(
            top.select(
                F.lit(r).cast("int").alias("merge_round"),
                F.col("a").alias("pair_a"),
                F.col("b").alias("pair_b"),
                F.col("cnt").alias("pair_count"),
            ).crossJoin(F.broadcast(n_after))
        )
    return toks, summaries


def variant_merges(spark, sf_dir, eager_toks, eager_tn) -> DataFrame:
    toks = _word_tokens(spark, sf_dir)
    _, summaries = _merge_rounds_variant(toks, ROUNDS, eager_toks, eager_tn)
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionAll(s)
    return out.orderBy("merge_round")


def variant_encode(spark, sf_dir, eager_toks, eager_tn) -> DataFrame:
    from parallel_monte_carlo_simulations_spark.functions.bpe import (
        _ENCODE_BUCKET,
    )
    from parallel_monte_carlo_simulations_spark.functions.microunit import (
        rdiv_halfup_expr,
    )

    toks0 = _word_tokens(spark, sf_dir)
    encoded, _ = _merge_rounds_variant(toks0, ROUNDS, eager_toks, eager_tn)
    before = toks0.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n0")
    )
    after = encoded.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n3"),
        F.count(F.when(F.col("tok").contains("_"), 1))
        .cast("long")
        .alias("nm"),
    )
    return (
        before.hint("merge").join(after, "doc_id")
        .groupBy(
            (F.col("n3") / _ENCODE_BUCKET).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n3").cast("long").alias("tokens_after"),
            F.sum("n0").cast("long").alias("tokens_before"),
            F.sum("nm").cast("long").alias("merged_tokens"),
        )
        .withColumn(
            "compression",
            rdiv_halfup_expr("tokens_after", "tokens_before", 6),
        )
    )


VARIANTS = {
    "A_current": dict(eager_toks=False, eager_tn=False),
    "B_eager_toks": dict(eager_toks=True, eager_tn=False),
    "C_eager_tn": dict(eager_toks=True, eager_tn=True),
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from parallel_monte_carlo_simulations_spark.session import get_spark

    spark = get_spark(
        app_name="pmcs-exp-bpe-r13",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.driver.memory": "1g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    for build, label in ((variant_merges, "merges"), (variant_encode, "encode")):
        base = [
            tuple(r)
            for r in sorted(
                build(spark, SF_DIR, **VARIANTS["A_current"]).collect()
            )
        ]
        spark.catalog.clearCache()
        for name, kw in VARIANTS.items():
            if name == "A_current":
                continue
            got = [
                tuple(r) for r in sorted(build(spark, SF_DIR, **kw).collect())
            ]
            assert got == base, f"{label}/{name} diverges from A_current"
            spark.catalog.clearCache()
            print(f"equivalence ok: {label}/{name}", flush=True)

    times: dict[str, list[float]] = {
        f"{label}:{name}": []
        for label in ("merges", "encode")
        for name in VARIANTS
    }
    for rep in range(reps):
        for build, label in ((variant_merges, "merges"), (variant_encode, "encode")):
            for name, kw in VARIANTS.items():
                key = f"{label}:{name}"
                spark.sparkContext.setJobDescription(f"bpe:{key}:rep{rep}")
                t0 = time.time()
                build(spark, SF_DIR, **kw).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                times[key].append(round(dt, 3))
                spark.catalog.clearCache()
                print(f"rep{rep} {key:24s} {dt:6.3f}s", flush=True)

    print("\nmedians:")
    for name, xs in times.items():
        s = sorted(xs)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        print(f"  {name:24s} min={min(xs):6.3f} med={med:6.3f} {xs}")


if __name__ == "__main__":
    main()
