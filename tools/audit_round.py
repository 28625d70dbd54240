#!/usr/bin/env python
"""Static audit of cross-engine rounding sites (round 13).

Round 12 proved the raw-double ROUND class has measure > 0 at scale:
two genuine divergences in one round (q_stream_sliding_30m at sf0.1,
q05_revenue_by_nation at sf1.0), both of the form "both engines ROUND
a double and disagree" — either because the doubles differ (summation
order) or because the ROUND implementations differ on the identical
boundary-adjacent double (Spark rounds the exact BigDecimal of the
double; DuckDB multiply-shifts).

This audit enumerates EVERY rounding call site in the package and
requires each to be one of:

  converted   — the blessed exact forms (not flagged at all):
                * string-form half-up division of BIGINT rationals
                  (functions/microunit.rdiv_halfup_*)
                * shared floor-form quantization of identical doubles
                  (functions/microunit.qround_*)
                * element-wise BIGINT/DECIMAL unit quantization BEFORE
                  any cross-row sum (units_sql / ROUND(x * 10^k, 0))
  whitelisted — a raw ROUND kept deliberately, with a recorded reason
                proving cross-engine safety (e.g. ROUND(col, 2) on a
                column that IS 2-decimal by data contract — an identity;
                ROUND over an exact-integer-valued double sum).

The gate test (tests/test_plans.py) re-runs this scan and fails on any
NEW unclassified site, so the class cannot silently reappear.

Usage: python tools/audit_round.py   -> rewrites AUDIT_ROUND.json
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "parallel_monte_carlo_simulations_spark")
OUT = os.path.join(ROOT, "AUDIT_ROUND.json")

#: Blessed-by-construction patterns a line may match and NOT be flagged.
_SAFE_PATTERNS = [
    # element-wise unit quantization to an integer: ROUND(x * S, 0),
    # ROUND(x * 100), F.round(x * 100, 0) — recovers an exact integer
    # from a bounded-decimal value; identical multiply+tie in both
    # engines.
    re.compile(r"(?i)round\s*\([^()]*(\([^()]*\)[^()]*)*,\s*0\s*\)"),
    re.compile(r"(?i)round\s*\([^,()]*(\([^()]*\))?[^,()]*\*\s*\d+(e\d+)?\s*\)"),
    # exact DECIMAL-quantized sums: the element cast quantizes BEFORE
    # the cross-row sum; ROUND on the exact decimal total is exact
    # half-up in both engines (established r11/r12 pattern).
    re.compile(r"(?i)round\s*\(\s*(cast\s*\()?\s*(F\.)?sum\s*\(\s*(cast\s*\()?[^,]*decimal\s*\("),
    re.compile(r"(?i)round\s*\(\s*F\.sum\s*\(F\.col\([^)]*\)\.cast\(\s*[\"']decimal"),
]

#: SQL-style ROUND( (uppercase, inside query text) or the Spark
#: F.round( API. Deliberately NOT bare lowercase python round( — the
#: driver-side python constant folds are engine-independent.
_ROUND_RE = re.compile(r"(F\.round\(|\bROUND\s*\()")


def scan() -> list[dict]:
    """Every rounding CALL site in package source, with the stripped
    first line of the call as the whitelist key (content-addressed so
    pure line drift never invalidates an entry).

    Call-based (balanced-paren) classification, so multi-line and
    black-formatted trailing-comma calls classify correctly:
      safe — single-arg ROUND(x) / F.round(x): integer half-away-
             from-zero on the identical double, no 10^k scaling step,
             bit-equal across engines;
           — literal k == 0 (the blessed integer unit quantization);
           — line-level decimal-sum forms in _SAFE_PATTERNS (ROUND on
             an EXACT decimal is exact half-up in both engines).
      flagged — everything else (raw double ROUND with k >= 1 or a
             non-literal k)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from convert_round import _find_matching, _split_last_arg

    sites = []
    for dirpath, _dirs, files in os.walk(PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, ROOT)
            if rel.endswith("functions/microunit.py"):
                continue  # the implementation of the blessed forms
            src = open(path).read()
            line_starts = [0]
            for i, c in enumerate(src):
                if c == "\n":
                    line_starts.append(i + 1)
            for m in _ROUND_RE.finditer(src):
                lineno = (
                    sum(1 for s in line_starts if s <= m.start())
                )
                ls = line_starts[lineno - 1]
                le = src.find("\n", ls)
                line = src[ls : le if le >= 0 else len(src)]
                stripped = line.strip()
                if stripped.startswith("#") or stripped.startswith("-- "):
                    continue
                if any(p.search(stripped) for p in _SAFE_PATTERNS):
                    continue
                open_idx = m.end() - 1
                close_idx = _find_matching(src, open_idx)
                if close_idx >= 0:
                    body = src[open_idx + 1 : close_idx]
                    split = _split_last_arg(body)
                    if split is None:
                        continue  # single-arg: integer rounding, safe
                    karg = split[1].strip()
                    if karg == "0":
                        continue  # blessed integer quantization
                sites.append({"file": rel, "line": lineno, "text": stripped})
    return sites


def main() -> None:
    sites = scan()
    whitelist = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)
        whitelist = {
            (w["file"], w["text"]): w for w in prev.get("whitelist", [])
        }
    unclassified = []
    kept = []
    seen = set()
    for s in sites:
        key = (s["file"], s["text"])
        if key in whitelist:
            w = dict(whitelist[key])
            w["line"] = s["line"]
            if key not in seen:
                kept.append(w)
                seen.add(key)
        else:
            unclassified.append(s)
    doc = {
        "_protocol": (
            "r13 rounding-site audit: every ROUND/F.round call in package "
            "source must be a blessed exact form (units quantization "
            "ROUND(x*10^k, 0) — auto-excluded) or carry a whitelist entry "
            "with a cross-engine safety reason. Unclassified sites fail "
            "the gate test. Regenerate with tools/audit_round.py after "
            "classifying new sites."
        ),
        "n_sites_flagged": len(sites),
        "n_whitelisted": len(kept),
        "n_unclassified": len(unclassified),
        "unclassified": unclassified,
        "whitelist": kept,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(
        f"{len(sites)} flagged sites: {len(kept)} whitelisted, "
        f"{len(unclassified)} unclassified -> {OUT}"
    )
    if unclassified:
        for s in unclassified[:200]:
            print(f"  {s['file']}:{s['line']}  {s['text'][:100]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
