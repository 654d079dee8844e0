"""Variant-column explosion: the tutorial's adversarial ragged columns
(FIXTURES.md A2 ``c``/``g``) JSON-encoded, exploded with per-row dispatch."""

import json

import pytest

from puffbird_spark import FrameEngine
from puffbird_spark.variant import explode_variant


@pytest.fixture(scope="module")
def ragged(spark):
    """Tutorial column ``c`` shape: heterogeneous dict values per cell —
    array, scalar long, string, nested dict (tutorial cell 4)."""
    rows = [
        (0, json.dumps({"q": [28, 2], "w": 42, "r": "string",
                        "t": {"x": 1, "y": 2}})),
        (1, json.dumps({"q": [3], "w": 7})),
        (2, json.dumps([10, 20])),          # list cell
        (3, json.dumps("bare")),            # scalar string cell
        (4, json.dumps(5)),                 # scalar number cell
        (5, None),                          # missing cell
    ]
    return spark.createDataFrame(rows, ["k", "c"])


def test_variant_explodes_mixed_cells(spark, ragged):
    out, levels = explode_variant(ragged, ["k"], "c", max_depth=2)
    assert levels == ["c_level0", "c_level1"]
    got = {(r["k"], r["c_level0"], r["c_level1"], r["c"])
           for r in out.collect()}
    expected = {
        # dict -> key level; array value -> position level
        (0, "q", "0", "28"), (0, "q", "1", "2"),
        # scalar dict value stops early: NULL second level (tutorial cell 33)
        (0, "w", None, "42"),
        (0, "r", None, "string"),
        # nested dict -> two key levels
        (0, "t", "x", "1"), (0, "t", "y", "2"),
        (1, "q", "0", "3"), (1, "w", None, "7"),
        # list cell -> position level
        (2, "0", None, "10"), (2, "1", None, "20"),
        # scalar cells -> all-NULL levels, value kept
        (3, None, None, "bare"),
        (4, None, None, "5"),
        # k=5 dropped (dropna)
    }
    assert got == expected


def test_variant_dropna_false_keeps_missing(spark, ragged):
    out, _ = explode_variant(ragged, ["k"], "c", max_depth=1, dropna=False)
    ks = {r["k"] for r in out.collect()}
    assert 5 in ks


def test_variant_through_to_long(spark, ragged):
    """Engine integration: variant col + outer-join assembly with a normal
    column."""
    from pyspark.sql import functions as F
    df = ragged.withColumn("tag", F.concat(F.lit("t"), F.col("k")))
    eng = FrameEngine(df, indexcols=["k"])
    out = eng.to_long("c", "tag", variant_cols=["c"], max_depth={"c": 2})
    assert "c_level0" in out.columns and "tag" in out.columns
    # every surviving key carries its tag through the outer join
    rows = [r for r in out.collect() if r["k"] == 0]
    assert all(r["tag"] == "t0" for r in rows) and len(rows) == 6


def test_variant_max_depth_truncates(spark):
    deep = spark.createDataFrame(
        [(0, json.dumps({"a": {"b": {"c": {"d": 1}}}}))], ["k", "v"]
    )
    out, levels = explode_variant(deep, ["k"], "v", max_depth=2)
    row = out.collect()[0]
    assert row["v_level0"] == "a" and row["v_level1"] == "b"
    assert json.loads(row["v"]) == {"c": {"d": 1}}  # remainder stays JSON
