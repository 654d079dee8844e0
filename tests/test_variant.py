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


def test_infer_variant_depth(spark):
    from puffbird_spark.variant import infer_variant_depth

    df = spark.createDataFrame(
        [(0, json.dumps({"a": 1})),
         (1, json.dumps({"a": {"b": [1, 2]}})),   # depth 3
         (2, "not json"),
         (3, None),
         (4, json.dumps(7))],                     # scalar: depth 0
        ["k", "v"],
    )
    assert infer_variant_depth(df, "v") == 3
    # scalar/garbage-only column floors at 1
    flat = spark.createDataFrame([(0, "5"), (1, "oops")], ["k", "v"])
    assert infer_variant_depth(flat, "v") == 1


def test_explode_variant_auto_depth_matches_explicit(spark):
    df = spark.createDataFrame(
        [(0, json.dumps({"a": {"b": 1, "c": [2, 3]}, "d": 4})),
         (1, json.dumps([{"e": 5}]))],
        ["k", "v"],
    )
    auto, auto_levels = explode_variant(df, ["k"], "v", max_depth=None)
    explicit, levels = explode_variant(df, ["k"], "v", max_depth=3)
    assert auto_levels == levels
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect()))


def test_infer_variant_depth_on_events(spark, sf_dir):
    """Real events.props JSON: inference is stable and explosion with the
    inferred depth decodes every leaf (no raw-JSON remainders)."""
    from pyspark.sql import functions as F

    from puffbird_spark.sources import load_table
    from puffbird_spark.variant import infer_variant_depth

    ev = load_table(spark, sf_dir, "events").select("event_id", "props")
    d = infer_variant_depth(ev, "props")
    assert d >= 1
    out, _ = explode_variant(ev, ["event_id"], "props", max_depth=d)
    # no leaf should still look like an unexploded container
    n_raw = out.filter(F.col("props").rlike(r"^[\[{]")).count()
    assert n_raw == 0


def test_infer_depth_memoized(spark, ragged):
    """Second inference on the same plan must hit the cache (no job)."""
    from puffbird_spark.variant import _DEPTH_CACHE, _plan_key, infer_variant_depth

    _DEPTH_CACHE.clear()
    d1 = infer_variant_depth(ragged, "c")
    key = _plan_key(ragged, "c", 1000)
    assert key is not None and _DEPTH_CACHE.get(key) == d1
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    assert infer_variant_depth(ragged, "c") == d1
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "memoized inference still launched a job"
