"""Rebuild the synthetic sf1 rehearsal corpus at /tmp/pbs_sf1.

/tmp is wiped between sessions, so every round reconstructs this before
``tools/rehearse.py`` runs (the recipe lived only in NOTES prose until
r13 — this script IS the recipe now):

- each SCALED table = 10 replicas of /root/testdata/sf0.1 with ALIGNED
  key shifts: every id/key column gains ``replica · 10_000_000`` — the
  same constant for every table, so cross-table joins
  (lineitem↔orders↔customer, lineitem↔part/supplier, …) hit at exactly
  the base-corpus rate inside each replica and NEVER across replicas;
- ``documents.text`` gets a per-replica prefix (``r{k} `` ) so dedup /
  fingerprint gates don't see 10 exact copies of the base corpus;
- nation/region are SF-independent dims: copied unshifted (their keys
  are referenced by UNSHIFTED c_nationkey/s_nationkey).

Deterministic, DuckDB-only, ~10s. Verifies the lineitem↔orders
replica-join hit rate is 100% before declaring success.

Usage:
    python tools/build_sf1.py [--src /root/testdata/sf0.1]
                              [--out /tmp/pbs_sf1] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SHIFT = 10_000_000

#: key columns that take the aligned per-replica shift
SHIFTED: dict[str, list[str]] = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPIED = ["nation", "region"]


def build(src: str, out: str, replicas: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, keys in SHIFTED.items():
        path = f"{src}/{table}.parquet"
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{path}'").fetchall()]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + r.k * {SHIFT} AS {c}")
            elif table == "documents" and c == "text":
                sel.append("'r' || r.k || ' ' || text AS text")
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{path}', "
            f"(SELECT unnest(range({replicas})) AS k) r) "
            f"TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    for table in COPIED:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{table}.parquet') "
            f"TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    hits, li = con.execute(
        f"SELECT (SELECT COUNT(*) FROM '{out}/lineitem.parquet' l "
        f"JOIN '{out}/orders.parquet' o ON l.l_orderkey = o.o_orderkey),"
        f" (SELECT COUNT(*) FROM '{out}/lineitem.parquet')").fetchone()
    if hits != li:
        raise AssertionError(
            f"replica-join misaligned: {hits} of {li} lineitem rows "
            f"join orders")
    print(f"built {out}: {replicas}x {src}, lineitem↔orders hit rate "
          f"{hits}/{li} (100%)")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/pbs_sf1")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    build(args.src, args.out, args.replicas)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
