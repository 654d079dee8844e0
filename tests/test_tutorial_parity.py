"""Tutorial-parity: the reference's adversarial 7-column table behaviors
(FIXTURES.md A2; tutorials/Create_Long_DataFrames.ipynb cells 4-33), on
Spark-native nested types + JSON variants for the ragged columns."""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from puffbird_spark import FrameEngine


@pytest.fixture(scope="module")
def adversarial(spark):
    """A2-shaped table: a=string, b=2x3 tensors (one NULL cell),
    d=ragged kx3 tensors (one NULL cell), e=array<struct> frame-cells
    (one NULL), c=JSON variant with heterogeneous dict values."""
    schema = T.StructType([
        T.StructField("idx", T.LongType()),
        T.StructField("a", T.StringType()),
        T.StructField("b", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("d", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("e", T.ArrayType(T.StructType([
            T.StructField("c1", T.LongType()),
            T.StructField("c2", T.LongType()),
        ]))),
        T.StructField("c", T.StringType()),
    ])
    rows = [
        (0, "aa", [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]],
         [[0.1, 0.2, 0.3]],
         [Row(c1=1, c2=2), Row(c1=3, c2=4)],
         json.dumps({"q": [1, 2], "w": 9})),
        (1, "bb", None,                                  # NaN cell in b
         [[1.1, 1.2, 1.3], [2.1, 2.2, 2.3]],
         [Row(c1=5, c2=6)],
         json.dumps("scalar")),
        (2, "cc", [[7.0, 8.0, 9.0], [10.0, 11.0, 12.0]],
         None,                                           # None cell in d
         None,                                           # NaN cell in e
         None),
    ]
    return spark.createDataFrame(rows, schema)


def test_default_explode_cartesian(adversarial):
    """Tutorial cell 6: default to_long of independent columns = per-row
    cartesian of their leaf counts (NULL cells survive via outer join)."""
    eng = FrameEngine(adversarial, indexcols=["idx"])
    out = eng.to_long("b", "e")
    counts = {r["idx"]: r["n"] for r in
              out.groupBy("idx").agg(F.count(F.lit(1)).alias("n")).collect()}
    # row0: b 6 leaves x e 4 stacked fields = 24; row1: b NULL -> e alone 2;
    # row2: b 6 leaves, e NULL -> 6
    assert counts == {0: 24, 1: 2, 2: 6}


def test_single_column_explode_then_group(adversarial):
    """Tutorial cells 9-11: explode one column, group on a level column."""
    eng = FrameEngine(adversarial, indexcols=["idx"])
    long = eng.to_long("b")
    agg = (
        long.groupBy("b_level1")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("b_level1")
        .collect()
    )
    # two non-null b cells, each 2x3: 4 values per inner position
    assert [(r["b_level1"], r["n"]) for r in agg] == [(0, 4), (1, 4), (2, 4)]


def test_shared_axes_alignment(adversarial):
    """Tutorial cell 13: aligned_axis={'b': 1, 'd': 1} — inner dimension is
    one logical axis, so rows align positionally on it instead of crossing."""
    eng = FrameEngine(adversarial, indexcols=["idx"])
    cart = eng.to_long("b", "d")
    aligned = eng.to_long("b", "d", aligned_axis={"b": 1, "d": 1})
    assert "aligned_axis" in aligned.columns
    # row0: cartesian 6x3=18 vs aligned 2x1x3=6
    cart0 = cart.filter("idx = 0").count()
    ali0 = aligned.filter("idx = 0").count()
    assert cart0 == 18 and ali0 == 6
    # aligned rows pair equal inner positions
    bad = aligned.filter(
        F.col("b_level1").isNotNull() & F.col("d_level1").isNotNull()
        & (F.col("b_level1") != F.col("d_level1"))
    ).count() if "b_level1" in aligned.columns else 0
    assert bad == 0 or "b_level1" not in aligned.columns


def test_null_cell_outer_survival(adversarial):
    """Tutorial cells 14-16: a row whose cell is NULL in one column still
    appears through the other columns."""
    eng = FrameEngine(adversarial, indexcols=["idx"])
    out = eng.to_long("a", "b")
    row1 = [r for r in out.collect() if r["idx"] == 1]
    assert len(row1) == 1
    assert row1[0]["a"] == "bb" and row1[0]["b"] is None


def test_frame_cells_one_iteration(adversarial):
    """Tutorial cells 19-20: frame-valued cells (array<struct>) explode to
    position + field-name levels in one logical step."""
    eng = FrameEngine(adversarial, indexcols=["idx"])
    out = eng.to_long("e")
    assert out.columns == ["idx", "e_level0", "e_level1", "e"]
    got = {(r["idx"], r["e_level0"], r["e_level1"], r["e"])
           for r in out.collect()}
    assert (0, 0, "c1", 1) in got and (0, 1, "c2", 4) in got
    assert (1, 0, "c2", 6) in got


def test_expand_cols_prefixed_fields(adversarial):
    """Tutorial cells 21-24: expand_cols=['e'] inlines fields as e_<field>
    columns instead of stacking them."""
    eng = FrameEngine(adversarial, indexcols=["idx"])
    out = eng.to_long("a", "e", expand_cols=["e"])
    assert {"e_c1", "e_c2", "a"} <= set(out.columns)
    row0 = [r for r in out.collect() if r["idx"] == 0]
    assert len(row0) == 2  # 2 struct rows x 1 scalar a
    assert {(r["e_c1"], r["e_c2"]) for r in row0} == {(1, 2), (3, 4)}


def test_variant_and_native_combined(adversarial):
    """Heterogeneous JSON column c combined with native nested b in one
    to_long call (the ragged column story of SURVEY §7 risk 1)."""
    eng = FrameEngine(adversarial, indexcols=["idx"])
    out = eng.to_long("c", "b", variant_cols=["c"], max_depth={"c": 2, "b": 3})
    r0 = [r for r in out.collect() if r["idx"] == 0]
    # c: {"q":[1,2],"w":9} -> 3 leaves; b: 6 leaves -> 18 combined rows
    assert len(r0) == 18
    c_leaves = {(r["c_level0"], r["c_level1"], r["c"]) for r in r0}
    assert ("q", "0", "1") in c_leaves and ("w", None, "9") in c_leaves


# ------------------------------------------------------------------ #
# DIFFERENTIAL cells (round-3 VERDICT #7): the remaining adversarial
# tutorial columns run through the ACTUAL reference library as the
# oracle (cells 32-33: heterogeneous dict column c with scalar-NULL
# level positions; the mixed-scalar column g).
# ------------------------------------------------------------------ #


@pytest.fixture(scope="module")
def ref():
    """Reference FrameEngine with xarray stubbed (same shim as
    test_reference_parity)."""
    import sys
    import types

    stubbed = "xarray" not in sys.modules
    if stubbed:
        sys.modules["xarray"] = types.ModuleType("xarray")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from puffbird import FrameEngine as RefEngine
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference not importable: {e}")
    yield RefEngine
    if stubbed:
        sys.modules.pop("xarray", None)


def _canon_level(v):
    """Level canonicalization across engines: reference emits positions as
    floats (0.0) and keys as strings; the variant path emits everything as
    strings. NaN/None -> None, numeric -> str(int), else str."""
    if v is None or v != v:
        return None
    try:
        return str(int(float(v)))
    except (TypeError, ValueError):
        return str(v)


def _canon_value(v):
    if v is None or v != v:
        return None
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)


#: tutorial cell-4 column 'c' rows 0-3 (tuple rendered as list — JSON has
#: no tuple; the reference superstacks both by position identically)
_C_CELLS = [
    {"dicta": [1, 2, 3], "dictb": 3, "dictc": {"key1": 1, "key2": 2}},
    {"dicta": [52, 3], "dictb": [3, 4], "dictc": {"key4": 1, "key2": 2}},
    {"dicta": [12, 67], "dictb": [4, 5], "dictc": {"key3": 1, "key2": 77}},
    {"dicta": 123, "dictb": "words", "dictc": {"key1": 4, "key2": 2}},
]


def test_tutorial_c_column_differential(ref, spark):
    """Tutorial cell 32: to_long('c') over heterogeneous dict cells —
    list values explode by position, nested dicts by key, scalars pass
    through. Reference output (k, c_level0, c_level1, c) is the oracle,
    value-for-value."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"k": range(len(_C_CELLS)), "c": _C_CELLS}).set_index("k")
    r = ref(pdf).to_long("c").rename(columns={"index_level0": "k"})
    assert list(r.columns) == ["k", "c_level0", "c_level1", "c"]
    expected = {
        (int(row["k"]), _canon_level(row["c_level0"]),
         _canon_level(row["c_level1"]), _canon_value(row["c"]))
        for _, row in r.iterrows()
    }

    sdf = spark.createDataFrame(
        [(i, json.dumps(c)) for i, c in enumerate(_C_CELLS)],
        "k long, c string",
    )
    out = FrameEngine(sdf, indexcols=["k"]).to_long(
        "c", variant_cols=["c"], max_depth={"c": 2})
    assert out.columns == ["k", "c_level0", "c_level1", "c"]
    got = {
        (r2["k"], _canon_level(r2["c_level0"]),
         _canon_level(r2["c_level1"]), _canon_value(r2["c"]))
        for r2 in out.collect()
    }
    assert got == expected


def test_tutorial_scalar_null_level_positions(ref, spark):
    """Tutorial cell 33 behavior: a SCALAR leaf inside an exploded cell
    (row 3's dicta=123, dictb='words') keeps its key at level0 but leaves
    level1 NULL — positions only exist where there was nesting. Checked
    differentially on the exact rows, both engines."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"k": range(len(_C_CELLS)), "c": _C_CELLS}).set_index("k")
    r = ref(pdf).to_long("c").rename(columns={"index_level0": "k"})
    ref_scalar = {
        (_canon_level(row["c_level0"]), _canon_value(row["c"]))
        for _, row in r.iterrows()
        if int(row["k"]) == 3 and row["c_level1"] != row["c_level1"]
    }
    assert ref_scalar == {("dicta", 123.0), ("dictb", "words")}

    sdf = spark.createDataFrame(
        [(i, json.dumps(c)) for i, c in enumerate(_C_CELLS)],
        "k long, c string",
    )
    out = FrameEngine(sdf, indexcols=["k"]).to_long(
        "c", variant_cols=["c"], max_depth={"c": 2})
    got_scalar = {
        (r2["c_level0"], _canon_value(r2["c"]))
        for r2 in out.collect()
        if r2["k"] == 3 and r2["c_level1"] is None
    }
    assert got_scalar == ref_scalar


def test_tutorial_cell24_collision_rename_differential(ref, spark):
    """Tutorial cells 23-24: ``puffy_to_long(df, 'a', 'e',
    expand_cols=['e'])`` where the frame-cells in ``e`` carry a named
    MultiIndex ['a', 'b'] — inner index level 'a' collides with the
    top-level column 'a' and must surface as ``a_e``; non-colliding 'b'
    stays bare; value columns keep the ``e_`` prefix; a NaN frame-cell
    survives as an all-NULL row. Reference output is the oracle."""
    import numpy as np
    import pandas as pd

    def frame(vals, labels):
        return pd.DataFrame(
            {"c1": vals, "c2": vals},
            index=pd.MultiIndex.from_arrays(
                [labels, labels], names=["a", "b"]),
        )

    pdf = pd.DataFrame({
        "a": ["aa", "bb", "cc"],
        "e": [frame([1, 2, 3], ["a", "b", "c"]),
              frame([1, 2, 3, 4], ["a", "b", "c", "d"]),
              np.nan],
    }, index=pd.RangeIndex(3, name="k"))
    r = ref(pdf).to_long("a", "e", expand_cols=["e"]).rename(
        columns={"index_level0": "k"})
    assert list(r.columns) == ["k", "a", "a_e", "b", "e_c1", "e_c2"]
    expected = {
        (int(row["k"]), row["a"], _canon_level(row["a_e"]),
         _canon_level(row["b"]), _canon_value(row["e_c1"]),
         _canon_value(row["e_c2"]))
        for _, row in r.iterrows()
    }

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("a", T.StringType()),
        T.StructField("e", T.ArrayType(T.StructType([
            T.StructField("a", T.StringType()),
            T.StructField("b", T.StringType()),
            T.StructField("c1", T.LongType()),
            T.StructField("c2", T.LongType()),
        ]))),
    ])
    rows = [
        (0, "aa", [Row(a=x, b=x, c1=v, c2=v)
                   for v, x in enumerate("abc", start=1)]),
        (1, "bb", [Row(a=x, b=x, c1=v, c2=v)
                   for v, x in enumerate("abcd", start=1)]),
        (2, "cc", None),
    ]
    sdf = spark.createDataFrame(rows, schema)
    out = FrameEngine(sdf, indexcols=["k"]).to_long(
        "a", "e", expand_cols=["e"], expand_index_fields={"e": ["a", "b"]})
    assert out.columns == ["k", "a", "a_e", "b", "e_c1", "e_c2"]
    got = {
        (r2["k"], r2["a"], _canon_level(r2["a_e"]),
         _canon_level(r2["b"]), _canon_value(r2["e_c1"]),
         _canon_value(r2["e_c2"]))
        for r2 in out.collect()
    }
    assert got == expected


def test_tutorial_cell33_scalar_null_pos_multi_column_differential(
        ref, spark):
    """Tutorial cell 33 through a MULTI-column to_long: scalar leaves
    inside the variant column keep a NULL level1 position, and those
    NULL-pos rows must still cross with the other exploded column — and
    with its all-NULL row when that cell is NaN — exactly as the
    reference's outer merge does. (The single-column case is covered
    above; the multi-column cross is what round-4 left open.)"""
    import numpy as np
    import pandas as pd

    c_cells = [_C_CELLS[0], _C_CELLS[3]]  # row1 has both scalar leaves
    b_cells = [np.array([[1.0, 2.0], [3.0, 4.0]]), np.nan]
    pdf = pd.DataFrame(
        {"b": b_cells, "c": c_cells}, index=pd.RangeIndex(2, name="k"))
    r = ref(pdf).to_long("b", "c").rename(columns={"index_level0": "k"})
    assert list(r.columns) == [
        "k", "b_level0", "b_level1", "b", "c_level0", "c_level1", "c"]
    expected = {
        (int(row["k"]), _canon_level(row["b_level0"]),
         _canon_level(row["b_level1"]), _canon_value(row["b"]),
         _canon_level(row["c_level0"]), _canon_level(row["c_level1"]),
         _canon_value(row["c"]))
        for _, row in r.iterrows()
    }
    # the cell-33 shape really is present: scalar leaves with NULL pos
    assert (1, None, None, None, "dicta", None, 123.0) in expected
    assert (1, None, None, None, "dictb", None, "words") in expected

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("b", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("c", T.StringType()),
    ])
    rows = [
        (0, [[1.0, 2.0], [3.0, 4.0]], json.dumps(c_cells[0])),
        (1, None, json.dumps(c_cells[1])),
    ]
    sdf = spark.createDataFrame(rows, schema)
    out = FrameEngine(sdf, indexcols=["k"]).to_long(
        "b", "c", variant_cols=["c"], max_depth={"b": 2, "c": 2})
    assert out.columns == [
        "k", "b_level0", "b_level1", "b", "c_level0", "c_level1", "c"]
    got = {
        (r2["k"], _canon_level(r2["b_level0"]),
         _canon_level(r2["b_level1"]), _canon_value(r2["b"]),
         _canon_level(r2["c_level0"]), _canon_level(r2["c_level1"]),
         _canon_value(r2["c"]))
        for r2 in out.collect()
    }
    assert got == expected


def test_tutorial_g_column_mixed_scalars_differential(ref, spark):
    """Tutorial column 'g': mixed cell types in ONE column — plain
    scalars (level NULL), a dict (key level), a 1-tuple (position level),
    a Series (key level), an int. The set cell is excluded: Python set
    iteration order is process-dependent, so its explosion order is not a
    well-defined oracle. JSON renderings: tuple -> list, Series -> dict."""
    import pandas as pd

    g_cells = ["a", "b", {"ff": "gg"}, ("r",), pd.Series({"a": "b"}), 1]
    pdf = pd.DataFrame({"k": range(len(g_cells)), "g": g_cells}).set_index("k")
    r = ref(pdf).to_long("g").rename(columns={"index_level0": "k"})
    assert list(r.columns) == ["k", "g_level0", "g"]
    expected = {
        (int(row["k"]), _canon_level(row["g_level0"]),
         _canon_value(row["g"]))
        for _, row in r.iterrows()
    }

    g_json = ['"a"', '"b"', '{"ff": "gg"}', '["r"]', '{"a": "b"}', "1"]
    sdf = spark.createDataFrame(
        [(i, g) for i, g in enumerate(g_json)], "k long, g string")
    out = FrameEngine(sdf, indexcols=["k"]).to_long(
        "g", variant_cols=["g"], max_depth={"g": 1})
    assert out.columns == ["k", "g_level0", "g"]
    got = {
        (r2["k"], _canon_level(r2["g_level0"]), _canon_value(r2["g"]))
        for r2 in out.collect()
    }
    assert got == expected
