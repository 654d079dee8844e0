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


def test_lint_flags_decimal_output():
    """The lint must actually catch the class it exists for: a DECIMAL
    output column (the pre-fix agg_hhi shape) and an unplannable oracle
    both produce findings."""
    con = duckdb.connect()
    bad = lint_oracle_types(con, {
        "decimal_case": "SELECT CAST(1.5 AS DECIMAL(38,6)) AS v",
        "broken_case": "SELECT FROM nowhere x !!",
        "good_case": "SELECT CAST(1.5 AS DOUBLE) AS v, 1 AS n",
    })
    assert any("decimal_case" in b and "DECIMAL" in b for b in bad)
    assert any("broken_case" in b for b in bad)
    assert not any("good_case" in b for b in bad)
