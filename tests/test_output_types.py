"""Registry output-type convention (round 9, VERDICT r8 #1/#2).

Every released value column is DOUBLE (exact decimal arithmetic stays
INTERNAL to order-free sums and is cast at the boundary); counts/ids are
BIGINT, check bits BOOLEAN. A DECIMAL final ships a red driver hash even
when values agree — Spark's ``toPandas()`` delivers ``Decimal`` objects
while DuckDB's ``.df()`` delivers float64, and the driver's
canonicalization distinguishes them (the ``agg_hhi`` r8 red row, then
the geo lat/lon near-miss the r9 sweep caught pre-driver).

This test runs the same DuckDB ``LIMIT 0`` probe as
``tools/check_oracle.py --lint-types`` over EVERY declared oracle: no
Spark session, no data scan — it types the oracle side of all 372 gates
in seconds and fails on any DECIMAL output column (or any oracle DuckDB
cannot even plan).
"""

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, REPO)

from check_oracle import TABLES, lint_oracle_types  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TINY", "/root/testdata/sf0.001")


def test_no_decimal_oracle_output_columns():
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    bad = lint_oracle_types(con, oracles)
    assert not bad, (
        "DECIMAL output column(s) or unplannable oracle(s) — cast the "
        f"final to DOUBLE on BOTH engines: {bad}"
    )
