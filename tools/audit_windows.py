#!/usr/bin/env python
"""Registry-wide global-ranked-window plan audit (round-11 discipline).

The round-10 broadcast audit closed the corpus-broadcast hole; this
closes its twin: a ``Window`` whose partition spec is EMPTY (Spark
plans an ``Exchange SinglePartition`` under it — the entire input
serializes through one task) or whose partition columns all come from a
KNOWN LOW-CARDINALITY domain (o_orderpriority has 5 values: at 100 TB
that window is 5 stragglers). Correct at sf0.1, a guaranteed bottleneck
at scale — exactly the 8-query family the round-10 verdict flagged
(KS / Mann-Whitney / Wasserstein / PSI / bootstrap / lift-decile / RFM
/ cume_dist), all since converted to operators/rankstats.py's
range-bucketed two-pass kernel.

A flagged window is EXEMPT when its input subtree is bounded by
construction, recognized structurally:

- a keyless (global) aggregate — scalar frames;
- ``GlobalLimit`` / ``TakeOrderedAndProject`` / ``CollectLimit`` /
  ``WindowGroupLimit`` — explicit row cuts;
- an Aggregate keyed on a BOUNDED-DOMAIN column: ``__rsbucket`` (the
  rankstats kernel contract, <= n_buckets rows per window partition
  by construction) — the same structural contract the broadcast audit
  has with keyless aggregates.

Everything else must be whitelisted in ``BOUNDED_OK`` with a reviewed
reason, and stale entries FAIL the audit (a plan that shifted out from
under its exemption must not silently re-acquire it). Continuous gate:
tests/test_plans.py::test_registry_wide_window_audit_clean.

Run: python tools/audit_windows.py  (~4 min on local[4])
"""

from __future__ import annotations

import json
import re
import sys

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

#: Columns whose domain is a handful of values on ANY corpus size:
#: partitioning a corpus-sized window by only these caps parallelism at
#: the domain size — same straggler as an empty spec, just K-way.
LOW_CARD_COLS = {
    "o_orderpriority",
    "o_orderstatus",
    "l_returnflag",
    "l_linestatus",
    "l_shipmode",
    "c_mktsegment",
    "event_type",
    "r_name",
    "source",
    "lang",
    "segment",
}

#: Aggregate grouping keys that bound their rollup by construction.
#: ``__rsbucket`` is the rankstats kernel's range bucket (<= n_buckets
#: values, enforced by least(n_buckets-1, ...) in with_range_bucket).
BOUNDED_KEY_NAMES = {"__rsbucket"}

#: Reviewed windows whose input is bounded for reasons the structural
#: detector cannot see (query -> why the window input cannot scale with
#: the corpus). Two recurring classes: TIME-AXIS rollups (day/hour
#: grids — cardinality grows with the calendar span, not with data
#: volume; 10 years of days is 3,650 rows at any corpus size) and
#: QUANTIZED/GUARDED domains (3-dp scores, raise_error-capped vocabs).
#: Stale entries fail the audit.
BOUNDED_OK: dict[str, str] = {
    # --- time-axis rollups: rows = calendar span, not corpus size ---
    "q_window_moving_avg": "per-day revenue rollup (day-span rows)",
    "q_cumulative_distinct_users": "day spine of first-seen counts",
    "q_changepoint_cusum": "per-(event_type, day) rollup",
    "q_stat_runs_test": "zero-filled per-(event_type, day) grid",
    "q_ts_forecast_eval": "per-day rollup + one-step-back lag",
    "q_ts_seasonal_decompose": "per-day grid, +-3-day centered frame",
    "q_ts_hurst_rs": "hourly rollup (reused subtree prints 4x)",
    "q_ts_ljung_box": "hourly rollup spine",
    "q_gapfill_forward_fill": "types x hour grid (time axis)",
    "q_survival_kaplan_meier": (
        "risk table keyed by integer day duration (duration-span rows)"
    ),
    "q_survival_logrank": "same duration-day risk table as KM",
    # --- quantized / guarded / output-bounded domains ---
    "q_ts_sax_words": "PAA rollup: 8 segments x event types",
    "q_tree_split_gini": "p_size rollup: 50 distinct integer sizes",
    "q_text_vocab_growth": "decile rollup: least(10, ...) caps at 10 rows",
    "q_curation_token_budget": (
        "quality-score buckets quantized to 3dp: <= 1001 rows "
        "(cum + threshold/boundary branches reuse the subtree)"
    ),
    "q_dedup_prefix_filter_join": (
        "vocabulary rank: raise_error-guarded <= 62 tokens (same bound "
        "the broadcast audit whitelists; subtree reuse prints it 24x)"
    ),
    "q_dedup_prefix_budget_report": "same guarded <= 62-token vocabulary",
    "q_source_file_metadata": (
        "per-file rollup: <= N_FILES rows by repartitionByRange"
    ),
    "q_skyline_pareto_front": (
        "global pass sees only per-year skyline survivors (local "
        "dominance pruning); front size is output-bounded, and a fully "
        "partitioned global skyline is the documented scale path"
    ),
}

BOUNDING = re.compile(
    r"GlobalLimit|TakeOrderedAndProject|CollectLimit|WindowGroupLimit"
)
NODE_HEADER = re.compile(r"^\((\d+)\) (\w+)", re.M)
TREE_NODE = re.compile(r"(\w+(?:GroupLimit|InPandas)?) \((\d+)\)")


def _split_top_level_brackets(s: str) -> list[str]:
    """Top-level ``[...]`` groups of a detail Arguments line."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                out.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return out


def _detail_blocks(detail: str) -> dict[str, str]:
    """node id -> its detail block text."""
    blocks: dict[str, str] = {}
    cur_id = None
    for line in detail.splitlines():
        m = re.match(r"^\((\d+)\) (\w+)", line)
        if m:
            cur_id = m.group(1)
            blocks[cur_id] = line + "\n"
        elif cur_id is not None:
            blocks[cur_id] += line + "\n"
    return blocks


def _window_partition_cols(block: str) -> list[str] | None:
    """Partition columns of a Window node's detail block; [] = global.

    The Arguments line is ``[exprs], [partition], [order]`` — or just
    ``[exprs], [order]`` when the partition spec is empty (order items
    carry ASC/DESC markers, partition items don't)."""
    m = re.search(r"^Arguments: (.*)$", block, re.M)
    if not m:
        return None
    lists = _split_top_level_brackets(m.group(1))
    if len(lists) >= 3:
        part = lists[1]
    elif len(lists) == 2:
        part = "" if (" ASC" in lists[1] or " DESC" in lists[1]) else lists[1]
    else:
        return None
    cols = [
        re.sub(r"#\d+\w*", "", c.strip())
        for c in part.split(",")
        if c.strip()
    ]
    return cols


def _subtree_lines(tree_lines: list[str], i: int) -> list[str]:
    indent = len(tree_lines[i]) - len(tree_lines[i].lstrip(" :+-"))
    sub = []
    for below in tree_lines[i + 1 :]:
        bind = len(below) - len(below.lstrip(" :+-"))
        if bind <= indent:
            break
        sub.append(below)
    return sub


def _subtree_bounded(
    sub_lines: list[str], blocks: dict[str, str]
) -> bool:
    """True when a row-bounding node caps the window's input. A
    ``Generate`` (explode) encountered on the walk DOWN from the window
    re-expands whatever a deeper bound capped, so any bounding marker
    found after a Generate no longer counts (the tree prints
    output-to-input: lines above consume lines below)."""
    generated = False
    for line in sub_lines:
        if "Generate" in line:
            generated = True
            continue
        if generated:
            continue
        if BOUNDING.search(line):
            return True
        for node, nid in TREE_NODE.findall(line):
            if "Aggregate" not in node:
                continue
            block = blocks.get(nid, "")
            km = re.search(r"^Keys(?: \[\d+\])?: \[(.*)\]$", block, re.M)
            if km is None:
                continue
            keys = [k.strip() for k in km.group(1).split(",") if k.strip()]
            if not keys:
                return True  # keyless/global aggregate: scalar frame
            names = {re.sub(r"#\d+\w*", "", k) for k in keys}
            if names & BOUNDED_KEY_NAMES:
                return True  # rankstats bucket rollup: <= n_buckets rows
            if names <= LOW_CARD_COLS:
                return True  # rollup keyed ONLY on low-card domains
    return False


def unbounded_global_windows(plan: str) -> int:
    """Count Window/WindowInPandas nodes whose partition spec is empty
    or entirely low-cardinality and whose input subtree carries no
    structural row bound."""
    parts = plan.split("\n\n", 1)
    tree, detail = parts[0], parts[1] if len(parts) > 1 else ""
    blocks = _detail_blocks(detail)
    lines = tree.splitlines()
    n = 0
    for i, line in enumerate(lines):
        m = re.search(r"\b(Window(?:InPandas)?) \((\d+)\)", line)
        if not m:
            continue
        cols = _window_partition_cols(blocks.get(m.group(2), ""))
        if cols is None:
            continue
        serial = (not cols) or all(c in LOW_CARD_COLS for c in cols)
        if not serial:
            continue
        if not _subtree_bounded(_subtree_lines(lines, i), blocks):
            n += 1
    return n


def audit(spark, sf: str = "/root/testdata/sf0.01") -> dict:
    """Compile every registered plan and classify its global windows.

    Shared by the CLI below and tests/test_plans.py's continuous gate
    (same whitelist-with-staleness-check design as audit_broadcast)."""
    from parallel_monte_carlo_simulations_spark.registry import load_all_queries

    specs = load_all_queries()
    flagged, errors = {}, {}
    for name in sorted(specs):
        try:
            df = specs[name].fn(spark, sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            n = unbounded_global_windows(plan)
            if n:
                flagged[name] = n
        except Exception as e:  # noqa: BLE001 - audit must sweep on
            errors[name] = f"{type(e).__name__}: {e}"[:160]
    bad = sorted(set(flagged) - set(BOUNDED_OK))
    stale = sorted(set(BOUNDED_OK) - set(flagged))
    return {
        "flagged": flagged,
        "not_whitelisted": bad,
        "whitelist_unused": stale,
        "errors": errors,
        "n_queries": len(specs),
    }


def main() -> int:
    from parallel_monte_carlo_simulations_spark.session import get_spark

    spark = get_spark(
        app_name="audit-windows",
        master="local[4]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    out = audit(spark)
    bad, stale = out["not_whitelisted"], out["whitelist_unused"]
    with open(f"{REPO}/AUDIT_WINDOWS.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(
        f"{out['n_queries']} plans audited, {len(out['flagged'])} flagged, "
        f"{len(bad)} NOT whitelisted, {len(stale)} whitelist entries unused"
    )
    for name in bad:
        print(f"  SCALE BUG: {name} ({out['flagged'][name]} global windows)")
    if out["errors"]:
        print(
            f"  ({len(out['errors'])} queries failed to plan: "
            f"{sorted(out['errors'])[:5]})"
        )
    return 1 if (bad or stale) else 0


if __name__ == "__main__":
    raise SystemExit(main())
