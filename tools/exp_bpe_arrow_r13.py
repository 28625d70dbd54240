#!/usr/bin/env python
"""A/B experiment: BPE merge pass as one vectorized Arrow pass per round
(r13 round 2, "Not yet optimized" item 3).

The JVM merge path runs 4 same-window functions over the lead frame per
round (lag, running-max island start, lag(kept), row_number renumber).
Variant B replaces that chain with a single ``mapInPandas`` pass over
doc-partitioned, (doc_id, pos)-sorted tokens: the greedy left-to-right
island arithmetic is pure integer/boolean numpy over the whole batch
(doc boundaries handled by masks; docs split across Arrow batches are
carried over inside the task iterator), and the renumber is a cumcount.
The winning pair rides in as two literal columns from the existing
one-row broadcast. Pair counting (lead window + agg) stays in the JVM.

Outputs asserted cell-identical to the registered queries before
timing. Usage: python tools/exp_bpe_arrow_r13.py [reps]
"""

from __future__ import annotations

import os
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

ROUNDS = 3
_MERGE_SCHEMA = "doc_id long, pos long, tok string"


def _merge_batch(doc: np.ndarray, tok: np.ndarray, a: str, b: str):
    """Greedy left-to-right merge of pair (a, b) over one contiguous,
    (doc, pos)-sorted token array. Returns (doc', tok') arrays.

    Same island arithmetic as the JVM window form: within each maximal
    run of consecutive matches keep every even offset from the run
    start; a kept position merges with its right neighbour (dropped).
    """
    n = len(tok)
    if n == 0:
        return doc, tok
    same_doc_next = np.empty(n, dtype=bool)
    same_doc_next[:-1] = doc[1:] == doc[:-1]
    same_doc_next[-1] = False
    nxt = np.empty(n, dtype=object)
    nxt[:-1] = tok[1:]
    nxt[-1] = None
    mtch = same_doc_next & (tok == a) & (nxt == b)
    prev_mtch = np.empty(n, dtype=bool)
    prev_mtch[0] = False
    prev_mtch[1:] = mtch[:-1]
    # island start index per position: latest i where a match turned on
    idx = np.arange(n, dtype=np.int64)
    start_at = np.where(mtch & ~prev_mtch, idx, -1)
    island_start = np.maximum.accumulate(start_at)
    kept = mtch & ((idx - island_start) % 2 == 0)
    dropped = np.empty(n, dtype=bool)
    dropped[0] = False
    dropped[1:] = kept[:-1]
    keep_mask = ~dropped
    out_tok = tok.copy()
    merged = a + "_" + b
    out_tok[kept] = merged
    return doc[keep_mask], out_tok[keep_mask]


def _merge_round_arrow(tn_sorted: DataFrame) -> DataFrame:
    """tn_sorted: (doc_id, pos, tok, a, b) doc-partitioned and sorted by
    (doc_id, pos) within partitions; a/b constant columns (the round's
    winning pair). Returns the merged, renumbered token frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        pair = None

        def flush(block: pd.DataFrame) -> pd.DataFrame:
            doc = block["doc_id"].to_numpy()
            tok = block["tok"].to_numpy(dtype=object)
            d2, t2 = _merge_batch(doc, tok, pair[0], pair[1])
            out = pd.DataFrame({"doc_id": d2, "tok": t2})
            out["pos"] = out.groupby("doc_id").cumcount().astype("int64")
            return out[["doc_id", "pos", "tok"]]

        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pair is None:
                pair = (pdf["a"].iloc[0], pdf["b"].iloc[0])
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            # hold back the final (possibly incomplete) doc of the batch
            last_doc = pdf["doc_id"].iloc[-1]
            tail = pdf["doc_id"] == last_doc
            carry = pdf[tail]
            head = pdf[~tail]
            if len(head):
                yield flush(head)
        if carry is not None and len(carry):
            yield flush(carry)

    return tn_sorted.mapInPandas(run, schema=_MERGE_SCHEMA)


def _merge_rounds_arrow(spark, toks: DataFrame, rounds: int):
    from parallel_monte_carlo_simulations_spark.tables import (
        adaptive_partitions,
    )

    p = adaptive_partitions(spark, SF_DIR, ("documents",))
    w = Window.partitionBy("doc_id").orderBy("pos")
    summaries = []
    for r in range(1, rounds + 1):
        tn = toks.withColumn("nxt", F.lead("tok").over(w))
        top = (
            tn.where(F.col("nxt").isNotNull())
            .groupBy(F.col("tok").alias("a"), F.col("nxt").alias("b"))
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
        )
        staged = (
            toks.crossJoin(F.broadcast(top.select("a", "b")))
            .repartition(p, "doc_id")
            .sortWithinPartitions("doc_id", "pos")
            .select("doc_id", "pos", "tok", "a", "b")
        )
        toks = _merge_round_arrow(staged).persist()
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


def variant_a_merges(spark, sf_dir) -> DataFrame:
    from parallel_monte_carlo_simulations_spark.functions.bpe import (
        q_bpe_phrase_merges,
    )

    return q_bpe_phrase_merges(spark, sf_dir)


def variant_b_merges(spark, sf_dir) -> DataFrame:
    from parallel_monte_carlo_simulations_spark.functions.bpe import (
        _word_tokens,
    )

    toks = _word_tokens(spark, sf_dir)
    _, summaries = _merge_rounds_arrow(spark, toks, ROUNDS)
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionAll(s)
    return out.orderBy("merge_round")


def variant_a_encode(spark, sf_dir) -> DataFrame:
    from parallel_monte_carlo_simulations_spark.functions.bpe import (
        q_bpe_encode,
    )

    return q_bpe_encode(spark, sf_dir)


def variant_b_encode(spark, sf_dir) -> DataFrame:
    from parallel_monte_carlo_simulations_spark.functions.bpe import (
        _ENCODE_BUCKET,
        _word_tokens,
    )
    from parallel_monte_carlo_simulations_spark.functions.microunit import (
        rdiv_halfup_expr,
    )

    toks0 = _word_tokens(spark, sf_dir)
    encoded, _ = _merge_rounds_arrow(spark, toks0, ROUNDS)
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
        .groupBy((F.col("n3") / _ENCODE_BUCKET).cast("long").alias("bucket"))
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


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from parallel_monte_carlo_simulations_spark.session import get_spark

    spark = get_spark(
        app_name="pmcs-exp-bpe-arrow-r13",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.driver.memory": "1g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    pairs = {
        "merges": (variant_a_merges, variant_b_merges),
        "encode": (variant_a_encode, variant_b_encode),
    }
    for label, (va, vb) in pairs.items():
        base = [tuple(r) for r in sorted(va(spark, SF_DIR).collect())]
        spark.catalog.clearCache()
        got = [tuple(r) for r in sorted(vb(spark, SF_DIR).collect())]
        assert got == base, f"{label}: arrow variant diverges"
        spark.catalog.clearCache()
        print(f"equivalence ok: {label}", flush=True)

    times: dict[str, list[float]] = {}
    for rep in range(reps):
        for label, (va, vb) in pairs.items():
            for name, fn in (("A_jvm", va), ("B_arrow", vb)):
                key = f"{label}:{name}"
                spark.sparkContext.setJobDescription(f"bpe-arrow:{key}:rep{rep}")
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                times.setdefault(key, []).append(round(dt, 3))
                spark.catalog.clearCache()
                print(f"rep{rep} {key:18s} {dt:6.3f}s", flush=True)

    print("\nmedians:")
    for name, xs in times.items():
        s = sorted(xs)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        print(f"  {name:18s} min={min(xs):6.3f} med={med:6.3f} {xs}")


if __name__ == "__main__":
    main()
