"""to_puffy / multid_pivot golden + round-trip property tests
(R11/R12; SURVEY §5.3 properties, FIXTURES.md A3/A4)."""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from puffbird_spark import FrameEngine


@pytest.fixture(scope="module")
def pivot_flat(spark):
    """FIXTURES.md A3: exact rows of reference tests/test_frameengine.py:32-37."""
    rows = [
        ("foo", "one", 1, 10), ("bar", "one", 2, 20), ("foo", "two", 3, 30),
        ("bar", "three", 4, 40), ("foo", "two", 5, 50), ("bar", "two", 6, 60),
        ("foo", "one", 7, 70), ("foo", "three", 8, 80),
    ]
    return spark.createDataFrame(rows, ["A", "B", "C", "D"])


def test_multid_pivot_2d(pivot_flat):
    """2-dim mean pivot of D over (A, B) — executable truth of reference
    groupby(dims)[values].mean() (frame.py:1065-1067)."""
    eng = FrameEngine(pivot_flat, indexcols=[], validate=False)
    out = eng.multid_pivot("D", "A", "B").collect()
    got = {r["A"]: (r["one"], r["three"], r["two"]) for r in out}
    assert got["bar"] == (20.0, 40.0, 60.0)
    assert got["foo"] == (40.0, 80.0, 40.0)


def test_multid_pivot_multi_values(pivot_flat):
    """Per-A means (reference tests/test_frameengine.py:50-62; the test
    file's expected_values frame is an unaggregated sketch — the executable
    truth is groupby mean): C {bar: 4.0, foo: 4.8}, D {bar: 40, foo: 48}."""
    eng = FrameEngine(pivot_flat, indexcols=[], validate=False)
    out = {r["A"]: (r["C"], r["D"])
           for r in eng.multid_pivot(["C", "D"], "A").collect()}
    assert out["bar"] == (4.0, 40.0)
    assert out["foo"] == (4.8, 48.0)


def test_to_puffy_collect_and_custom_agg(spark):
    df = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0), (2, "z", 3.0)], ["k", "s", "v"]
    )
    eng = FrameEngine(df, indexcols=["k", "s"])
    nested = eng.to_puffy("k", aggfunc={"s": None, "v": "sum"})
    got = {r["k"]: (sorted(r["s"]), r["v"]) for r in nested.table.collect()}
    assert got == {1: (["x", "y"], 3.0), 2: (["z"], 3.0)}


def test_to_puffy_keep_missing_idcs(spark):
    """Non-grouped index cols demoted to data and aggregated
    (frame.py:991-994), unless keep_missing_idcs=False."""
    df = spark.createDataFrame([(1, 10, "a"), (1, 20, "b")], ["k", "k2", "v"])
    eng = FrameEngine(df, indexcols=["k", "k2"])
    kept = eng.to_puffy("k")
    assert set(kept.table.columns) == {"k", "k2", "v"}
    dropped = eng.to_puffy("k", keep_missing_idcs=False)
    assert set(dropped.table.columns) == {"k", "v"}


def test_roundtrip_property(spark):
    """FIXTURES.md A4: to_long -> to_puffy recovers original multisets and
    explode row count = sum of cell cardinalities (SURVEY §5.3)."""
    rng = random.Random(42)
    rows, total_cells = [], 0
    for k1 in range(40):
        xs = [round(rng.uniform(0, 10), 2) for _ in range(rng.randint(0, 5))]
        total_cells += len(xs)
        rows.append((k1, f"g{k1 % 3}", xs))
    schema = T.StructType([
        T.StructField("k1", T.LongType()),
        T.StructField("k2", T.StringType()),
        T.StructField("xs", T.ArrayType(T.DoubleType())),
    ])
    df = spark.createDataFrame(rows, schema)
    eng = FrameEngine(df, indexcols=["k1", "k2"])
    long = eng.to_long("xs")
    assert long.count() == total_cells

    back = FrameEngine(long, indexcols=["k1", "k2", "xs_level0"],
                       validate=False).to_puffy("k1", "k2",
                                                sort_by=["xs_level0"])
    orig = {(r["k1"], r["k2"]): r["xs"] for r in df.collect() if r["xs"]}
    rt = {(r["k1"], r["k2"]): r["xs"] for r in back.table.collect()}
    assert rt == orig  # empty-array rows drop (dropna explode), rest exact


def test_to_puffy_requires_index(spark):
    from puffbird_spark import PuffbirdSparkError
    df = spark.createDataFrame([(1, 2)], ["k", "v"])
    eng = FrameEngine(df, indexcols=["k"])
    with pytest.raises(PuffbirdSparkError):
        eng.to_puffy()


# ------------------------------------------------------------------ #
# round-2: to_xarray guard + float consistency, aggfunc slow path,
# pivot_values passthrough
# ------------------------------------------------------------------ #

def test_to_xarray_guard_and_consistency(pivot_flat, monkeypatch):
    xr = pytest.importorskip("xarray")  # noqa: F841
    eng = FrameEngine(pivot_flat, indexcols=[], validate=False)
    da = eng.to_xarray("D", "A", "B")
    # same exact-mean expression as multid_pivot: identical values
    piv = {r["A"]: (r["one"], r["three"], r["two"])
           for r in eng.multid_pivot("D", "A", "B").collect()}
    for a in ("bar", "foo"):
        got = tuple(float(da.sel(A=a, B=b)) for b in ("one", "three", "two"))
        assert got == piv[a]
    # the guard: refuse driver-side collect above the row bound
    monkeypatch.setattr(FrameEngine, "XARRAY_MAX_ROWS", 1)
    from puffbird_spark import PuffbirdSparkError
    with pytest.raises(PuffbirdSparkError, match="allow_large"):
        eng.to_xarray("D", "A", "B")
    assert eng.to_xarray("D", "A", "B", allow_large=True) is not None


def test_to_puffy_arbitrary_python_aggfunc(spark):
    """aggfunc=np.mean (reference's arbitrary-callable contract) runs via
    the GROUPED_AGG pandas-UDF slow path instead of raising."""
    import numpy as np

    df = spark.createDataFrame(
        [(0, 1.0), (0, 3.0), (1, 5.0)], ["k", "v"]
    )
    eng = FrameEngine(df, indexcols=["k", "v"], validate=False)
    out = {r["k"]: r["v"]
           for r in eng.to_puffy("k", aggfunc=np.mean).table.collect()}
    assert out == {0: 2.0, 1: 5.0}


def test_to_puffy_column_rejecting_callables(spark):
    """Callables outside numpy/builtins that reject a Column (ADVICE r2:
    statistics.median iterates its argument; a Series-style lambda calls
    .mean()) must fall through to the GROUPED_AGG slow path instead of
    leaking the probe's TypeError."""
    import statistics

    df = spark.createDataFrame(
        [(0, 1.0), (0, 3.0), (0, 7.0), (1, 5.0)], ["k", "v"]
    )
    eng = FrameEngine(df, indexcols=["k", "v"], validate=False)
    out = {r["k"]: r["v"]
           for r in eng.to_puffy("k", aggfunc=statistics.median).table.collect()}
    assert out == {0: 3.0, 1: 5.0}
    out = {r["k"]: r["v"]
           for r in eng.to_puffy("k", aggfunc=lambda s: s.mean()).table.collect()}
    assert out == {0: 11.0 / 3.0, 1: 5.0}


def test_multid_pivot_pivot_values(pivot_flat):
    eng = FrameEngine(pivot_flat, indexcols=[], validate=False)
    out = eng.multid_pivot("D", "A", "B", pivot_values=["one", "two"])
    got = {r["A"]: (r["one"], r["two"]) for r in out.collect()}
    assert got["bar"] == (20.0, 60.0)
    assert got["foo"] == (40.0, 40.0)
    assert sorted(out.columns) == ["A", "one", "two"]
