#!/usr/bin/env python
"""Mechanical ROUND -> shared floor-form (qround) converter (round 13).

Rewrites, in BOTH engine dialects simultaneously:

    ROUND(<expr>, k)     ->  FLOOR((<expr>) * 1ek + 0.5) / 1ek     (SQL)
    F.round(<expr>, k)   ->  (F.floor((<expr>) * 1ek + 0.5) / 1ek) (Spark)

for integer literal k >= 1. Skips k == 0 (already the blessed integer
quantization) and non-literal k (left for manual review). The floor
form evaluates the IDENTICAL IEEE op sequence in both engines, so the
cross-engine result is bit-equal by construction at any scale — unlike
raw ROUND, whose two implementations (Spark: exact BigDecimal of the
double; DuckDB: multiply-shift) disagree on boundary-adjacent doubles
(the r12 q_stream_sliding_30m catch). See functions/microunit.qround_*.

Usage: python tools/convert_round.py FILE [FILE...]
Prints each conversion; edits files in place.
"""

from __future__ import annotations

import re
import sys

_OPEN = re.compile(r"(F\.round\(|\bROUND\s*\()")


def _find_matching(s: str, start: int) -> int:
    """Index of the ')' closing the '(' at s[start]; -1 if unbalanced.
    Skips parens inside single/double-quoted strings."""
    depth = 0
    i = start
    quote = None
    while i < len(s):
        c = s[i]
        if quote:
            if c == quote:
                quote = None
        elif c in "'\"":
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def _split_last_arg(body: str) -> tuple[str, str] | None:
    """Split 'expr, k' at the TOP-LEVEL last comma -> (expr, k).
    Tolerates a black-style trailing comma after k."""
    stripped = body.rstrip()
    if stripped.endswith(","):
        body = stripped[:-1]
    depth = 0
    quote = None
    last = -1
    for i, c in enumerate(body):
        if quote:
            if c == quote:
                quote = None
        elif c in "'\"":
            quote = c
        elif c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif c == "," and depth == 0:
            last = i
    if last < 0:
        return None
    return body[:last], body[last + 1 :]


def convert(src: str, path: str) -> tuple[str, int]:
    out = []
    pos = 0
    n = 0
    while True:
        m = _OPEN.search(src, pos)
        if not m:
            out.append(src[pos:])
            break
        is_spark = m.group(1).startswith("F.")
        open_idx = m.end() - 1
        close_idx = _find_matching(src, open_idx)
        if close_idx < 0:
            out.append(src[pos : m.end()])
            pos = m.end()
            continue
        body = src[open_idx + 1 : close_idx]
        split = _split_last_arg(body)
        keep = False
        if split is None:
            keep = True  # single-arg round -> integer quantization, safe
        else:
            expr, karg = split
            karg = karg.strip()
            if not re.fullmatch(r"[1-9]\d*", karg):
                keep = True  # k == 0 or non-literal: skip
        if keep:
            # still convert any nested ROUNDs inside the kept call
            inner, n_inner = convert(body, path)
            if n_inner:
                out.append(src[pos : open_idx + 1] + inner + ")")
                pos = close_idx + 1
                n += n_inner
                continue
            out.append(src[pos : close_idx + 1])
            pos = close_idx + 1
            continue
        expr = expr.strip()
        expr, n_inner = convert(expr, path)
        n += n_inner
        k = int(karg)
        if is_spark:
            if re.fullmatch(r"(['\"])[A-Za-z_][A-Za-z0-9_]*\1", expr):
                expr = f"F.col({expr})"
            new = f"(F.floor(({expr}) * 1e{k} + 0.5) / 1e{k})"
        else:
            new = f"FLOOR(({expr}) * 1e{k} + 0.5) / 1e{k}"
        out.append(src[pos : m.start()])
        out.append(new)
        pos = close_idx + 1
        n += 1
    return "".join(out), n


def main() -> None:
    for path in sys.argv[1:]:
        src = open(path).read()
        new, n = convert(src, path)
        if n:
            open(path, "w").write(new)
        print(f"{path}: {n} sites converted")


if __name__ == "__main__":
    main()
