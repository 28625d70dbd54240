#!/usr/bin/env python
"""Generate a 10x-tiled sf1.0 MEASUREMENT dataset from the driver's
sf0.1 tables (round-8 judge item: extend the scale ladder to sf1.0 for
the most expensive queries; the driver only generates up to sf0.1).

This dataset is for SCALE STUDIES ONLY — never for oracle correctness
(correctness always runs on the driver's own parquet). Construction:
ten key-offset copies of every sf0.1 fact/dim table so joins stay
referentially intact and key cardinalities grow 10x like a real SF
bump:

- every synthetic key (orderkey, custkey, partkey, suppkey, doc_id,
  vec_id, user_id, event_id) is offset by copy * (max_key + 1);
- nation/region stay fixed (TPC-H dims are SF-invariant);
- document TEXTS get a per-copy suffix token and embeddings a tiny
  per-copy first-component perturbation — identical 10x copies would
  hand dedup/ANN artificial mega-duplicate clusters and make their
  candidate growth look quadratic when it is not.

Output: .scale/sf1.0/*.parquet inside the repo (gitignored).

    python tools/gen_sf1.py
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1.0")
COPIES = 10

#: table -> (key columns to offset, ...) ; offsets use each key's own
#: source max so FK pairs (orders.o_custkey <-> customer.c_custkey)
#: shift by the same amount.
PLAIN_KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: key -> the table that owns it (max is computed there so referencing
#: tables shift identically).
KEY_OWNER = {
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "c_custkey": ("customer", "c_custkey"),
    "p_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    maxes = {}
    for key, (owner, owner_col) in KEY_OWNER.items():
        maxes[key] = con.execute(
            f"SELECT MAX({owner_col}) + 1 FROM "
            f"read_parquet('{SRC}/{owner}.parquet')"
        ).fetchone()[0]

    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied unchanged")

    for t, keys in PLAIN_KEYS.items():
        cols = [
            d[0]
            for d in con.execute(
                f"SELECT * FROM read_parquet('{SRC}/{t}.parquet') LIMIT 0"
            ).description
        ]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + c.copy * {maxes[c]} AS {c}")
            elif t == "documents" and c == "text":
                # per-copy suffix token: breaks exact duplication while
                # leaving shingle structure ~intact
                sel.append("text || ' c' || c.copy AS text")
            elif t == "embeddings" and c == "embedding":
                sel.append(
                    "[embedding[1] + c.copy * 0.001] || embedding[2:] "
                    "AS embedding"
                )
            else:
                sel.append(c)
        q = (
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{SRC}/{t}.parquet'), "
            f"(SELECT unnest(range({COPIES})) AS copy) c) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        con.execute(q)
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
