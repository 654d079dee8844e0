"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, column names, and an order-insensitive canonicalized value
multiset. Use while iterating so CORRECTNESS_r{N}.json holds no surprises.

Usage:
    python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import datetime
import decimal
import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ROUND_DP = 6


def _cell(v) -> str:
    if v is None:
        return ""
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return ""
        r = round(float(v), ROUND_DP)
        if r == 0.0:
            r = 0.0  # normalize -0.0
        return f"{r:.{ROUND_DP}f}"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.{ROUND_DP}f}"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), _cell(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}:{x}" for k, x in items) + "}"
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        if isinstance(v, pd.Timestamp) and pd.isna(v):
            return ""
        return pd.Timestamp(v).isoformat()
    if v is pd.NaT:
        return ""
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return sorted(
        tuple(_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="subset of query names to check")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from puffbird_spark.session import get_spark

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(queries)

    spark = get_spark(app_name="check-oracle", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        if name not in queries:
            print(f"{name}: NOT DECLARED")
            n_fail += 1
            continue
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf_dir).toPandas()
        except Exception as e:
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only ({len(sdf)} rows, {spark_s:.1f}s) — no oracle declared")
            n_rowsonly += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name}: DUCKDB ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue

        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} duckdb={len(odf)}")
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            problems.append(f"columns spark={s_cols} duckdb={o_cols}")
        if not problems:
            srows, orows = canonical_rows(sdf), canonical_rows(odf)
            if srows != orows:
                sset, oset = set(srows), set(orows)
                diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
                only_s = [r for r in srows if r not in oset][:2]
                only_o = [r for r in orows if r not in sset][:2]
                problems.append(
                    f"values differ; first diffs={diff!r} "
                    f"spark-only={only_s!r} duckdb-only={only_o!r}"
                )
        if problems:
            print(f"{name}: FAIL  {' | '.join(problems)}")
            n_fail += 1
        else:
            empty = "  [WARN: 0 rows — matching but testing nothing]" if len(sdf) == 0 else ""
            print(f"{name}: ok ({len(sdf)} rows, spark {spark_s:.1f}s){empty}")
            n_pass += 1

    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} fail "
          f"of {len(names)} at {args.sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
