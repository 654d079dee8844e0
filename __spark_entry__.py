"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship FrameEngine round-trip query at
sf0.001; ``queries()``/``oracle_sql()`` expose the full declared surface
from ``puffbird_spark.queries`` (SURVEY.md §2) for the sf0.01 DuckDB
differential check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from puffbird_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["engine_to_long_roundtrip"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; hash-free ops
    (MinHash/SimHash/LSH/approx) are declared rows-only."""
    return dict(ORACLES)
