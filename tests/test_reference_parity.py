"""DIFFERENTIAL parity: run the actual reference library (read-only, pure
pandas, at /root/reference) and this engine on the same logical data and
compare results value-for-value.

The strongest evidence the re-expression is faithful: not our reading of
frame.py, but frame.py itself as the oracle. The reference's xarray import
is stubbed (unused on these paths); reference column naming differs only
in the surrogate index name (``index_level0`` vs our explicit key), so
comparisons are positional over a canonical column order.
"""

import sys
import types

import pytest
from pyspark.sql import functions as F

from puffbird_spark import FrameEngine


@pytest.fixture(scope="module")
def ref():
    """Import the reference FrameEngine (xarray stubbed — not needed for
    the compared paths). The stub is removed afterwards so tests that
    probe for a REAL xarray (the to_xarray guard) are not fooled by it."""
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


def _ref_rows(pdf, cols):
    """Canonical sorted value-tuples from a reference result frame."""
    out = []
    for _, row in pdf[cols].iterrows():
        out.append(tuple(
            None if row[c] != row[c] else  # NaN -> None
            (float(row[c]) if isinstance(row[c], (int, float)) else row[c])
            for c in cols
        ))
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))


def _spark_rows(df, cols):
    out = []
    for r in df.select(*cols).collect():
        out.append(tuple(
            float(v) if isinstance(v, (int, float)) and v is not None else v
            for v in (r[c] for c in cols)
        ))
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))


def test_to_long_list_column(ref, spark):
    import pandas as pd

    pdf = pd.DataFrame({"k": [10, 20], "a": [[1.0, 2.0], [3.0]]}).set_index("k")
    expected = _ref_rows(
        ref(pdf).to_long("a").rename(columns={"index_level0": "k"}),
        ["k", "a_level0", "a"],
    )
    sdf = spark.createDataFrame([(10, [1.0, 2.0]), (20, [3.0])], ["k", "a"])
    got = _spark_rows(
        FrameEngine(sdf, indexcols=["k"]).to_long("a"),
        ["k", "a_level0", "a"],
    )
    assert got == expected


def test_to_long_dict_column(ref, spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {"k": [10, 20], "b": [{"x": 1.0, "y": 5.0}, {"y": 2.0}]}
    ).set_index("k")
    expected = _ref_rows(
        ref(pdf).to_long("b").rename(columns={"index_level0": "k"}),
        ["k", "b_level0", "b"],
    )
    sdf = spark.createDataFrame(
        [(10, {"x": 1.0, "y": 5.0}), (20, {"y": 2.0})],
        "k long, b map<string,double>",
    )
    got = _spark_rows(
        FrameEngine(sdf, indexcols=["k"]).to_long("b"),
        ["k", "b_level0", "b"],
    )
    assert got == expected


def test_to_long_two_columns_cartesian(ref, spark):
    """Multi-column to_long is the per-key cartesian of each column's
    exploded rows (reference outer-join assembly)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"k": [1, 2], "a": [[1.0, 2.0], [3.0]], "b": [[9.0], [7.0, 8.0]]}
    ).set_index("k")
    expected = _ref_rows(
        ref(pdf).to_long("a", "b").rename(columns={"index_level0": "k"}),
        ["k", "a_level0", "a", "b_level0", "b"],
    )
    sdf = spark.createDataFrame(
        [(1, [1.0, 2.0], [9.0]), (2, [3.0], [7.0, 8.0])], ["k", "a", "b"]
    )
    got = _spark_rows(
        FrameEngine(sdf, indexcols=["k"]).to_long("a", "b"),
        ["k", "a_level0", "a", "b_level0", "b"],
    )
    assert got == expected


def test_to_long_nested_two_levels(ref, spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {"k": [1, 2], "a": [[[1.0, 2.0], [3.0]], [[4.0]]]}
    ).set_index("k")
    expected = _ref_rows(
        ref(pdf).to_long("a").rename(columns={"index_level0": "k"}),
        ["k", "a_level0", "a_level1", "a"],
    )
    sdf = spark.createDataFrame(
        [(1, [[1.0, 2.0], [3.0]]), (2, [[4.0]])], ["k", "a"]
    )
    got = _spark_rows(
        FrameEngine(sdf, indexcols=["k"]).to_long("a"),
        ["k", "a_level0", "a_level1", "a"],
    )
    assert got == expected


def test_to_long_shared_axes_zip(ref, spark):
    """shared_axes aligns two columns positionally instead of crossing."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"k": [1, 2], "a": [[1.0, 2.0], [3.0]], "b": [[9.0, 8.0], [7.0]]}
    ).set_index("k")
    expected = _ref_rows(
        ref(pdf).to_long("a", "b", g={"a": 0, "b": 0})
        .rename(columns={"index_level0": "k"}),
        ["k", "g", "a", "b"],
    )
    sdf = spark.createDataFrame(
        [(1, [1.0, 2.0], [9.0, 8.0]), (2, [3.0], [7.0])], ["k", "a", "b"]
    )
    got = _spark_rows(
        FrameEngine(sdf, indexcols=["k"]).to_long("a", "b",
                                                  g={"a": 0, "b": 0}),
        ["k", "g", "a", "b"],
    )
    assert got == expected


def test_to_long_dropna_false_preserves_empty(ref, spark):
    """dropna=False on the MULTI-column path: the reference null-extends
    an empty cell through its outer-join assembly (level and value NaN) —
    exactly our explode_outer semantics.

    Deliberate deviation (documented in NOTES.md): the reference's
    SINGLE-column dropna=False instead emits a dense grid over the global
    union of element positions (a pandas stack artifact that also yields
    phantom (pos, NaN) rows on nested data, and crashes outright on a
    None cell — iter(None) in callables.py:52). This engine keeps the
    outer-join semantics consistently in both paths."""
    import pandas as pd

    pdf = pd.DataFrame({"k": [1], "a": [[]], "b": [[9.0]]}).set_index("k")
    expected = _ref_rows(
        ref(pdf).to_long("a", "b", dropna=False)
        .rename(columns={"index_level0": "k"}),
        ["k", "a_level0", "a", "b_level0", "b"],
    )
    sdf = spark.createDataFrame(
        [(1, [], [9.0])], "k long, a array<double>, b array<double>"
    )
    got = _spark_rows(
        FrameEngine(sdf, indexcols=["k"]).to_long("a", "b", dropna=False),
        ["k", "a_level0", "a", "b_level0", "b"],
    )
    assert got == expected


def test_multid_pivot_mean(ref, spark):
    import pandas as pd

    pdf = pd.DataFrame({
        "d1": ["x", "x", "y", "y", "x"],
        "d2": ["p", "q", "p", "q", "p"],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    # reference multid_pivot: mean of v over (d1, d2)
    expected = (
        pdf.groupby(["d1", "d2"])["v"].mean().reset_index()
    )
    exp = {(r.d1, r.d2): r.v for r in expected.itertuples()}
    sdf = spark.createDataFrame(
        [tuple(r) for r in pdf.itertuples(index=False)], ["d1", "d2", "v"]
    )
    out = FrameEngine(sdf, indexcols=[], validate=False).multid_pivot(
        "v", "d1", "d2"
    )
    got = {(r["d1"], c): r[c]
           for r in out.collect() for c in ("p", "q") if r[c] is not None}
    assert got == exp


def test_to_long_max_depth_stop(ref, spark):
    """R15 stop-condition: max_depth=1 leaves the inner lists as raw
    cells on both engines."""
    import pandas as pd

    pdf = pd.DataFrame({"k": [1], "a": [[[1.0, 2.0], [3.0]]]}).set_index("k")
    r = ref(pdf).to_long("a", max_depth=1).rename(
        columns={"index_level0": "k"})
    expected = sorted(
        (int(row.k), int(row.a_level0), tuple(row.a))
        for row in r.itertuples()
    )
    sdf = spark.createDataFrame([(1, [[1.0, 2.0], [3.0]])], ["k", "a"])
    out = FrameEngine(sdf, indexcols=["k"]).to_long("a", max_depth=1)
    got = sorted(
        (r2["k"], r2["a_level0"], tuple(r2["a"])) for r2 in out.collect()
    )
    assert got == expected


def test_expand_col_frame_cells(ref, spark):
    """R5 expand_col on frame-valued cells: the reference expands pandas
    DataFrame cells; here the equivalent cell encoding is array<struct>.
    Level-column names differ (pandas default 'level_1' vs our
    '{col}_level0'); values are compared positionally."""
    import pandas as pd

    cell1 = pd.DataFrame({"x": [1.0, 2.0], "y": [10.0, 20.0]})
    cell2 = pd.DataFrame({"x": [3.0], "y": [30.0]})
    pdf = pd.DataFrame({"k": [1, 2], "f": [cell1, cell2]}).set_index("k")
    r = ref(pdf).expand_col("f").rename(columns={"index_level0": "k"})
    expected = sorted(
        (int(row.k), int(row.level_1), float(row.x), float(row.y))
        for row in r.itertuples()
    )
    sdf = spark.createDataFrame(
        [(1, [(1.0, 10.0), (2.0, 20.0)]), (2, [(3.0, 30.0)])],
        "k long, f array<struct<x double, y double>>",
    )
    out = FrameEngine(sdf, indexcols=["k"]).expand_col("f")
    got = sorted(
        (r2["k"], r2["f_level0"], r2["x"], r2["y"])
        for r2 in out.table.collect()
    )
    assert got == expected


def test_col_apply_numpy_callable(ref, spark):
    """R7 col_apply with an arbitrary numpy callable matches the
    reference's Series.apply result (our slow-path UDF wrap)."""
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame({"k": [1, 2], "v": [4.0, 9.0]}).set_index("k")
    r = ref(pdf).col_apply(np.sqrt, "v", new_col_name="r")
    expected = sorted(
        (int(k[0] if isinstance(k, tuple) else k),
         float(row["v"]), float(row["r"]))
        for k, row in r.table.iterrows()
    )
    sdf = spark.createDataFrame([(1, 4.0), (2, 9.0)], ["k", "v"])
    eng = FrameEngine(sdf, indexcols=["k"], validate=False).col_apply(
        lambda x: float(np.sqrt(x)), "v", new_col_name="r",
        return_type="double",
    )
    got = sorted((r2["k"], r2["v"], r2["r"]) for r2 in eng.table.collect())
    assert got == expected


def test_to_long_expand_cols_mixed(ref, spark):
    """to_long with expand_cols: a frame-valued column expands into
    prefixed field columns (f_x) inside the cartesian with a plain
    exploded column. Only the expansion level-column name differs
    (reference pandas default 'level_1' vs our 'f_level0')."""
    import pandas as pd

    cell1 = pd.DataFrame({"x": [1.0, 2.0]})
    cell2 = pd.DataFrame({"x": [3.0]})
    pdf = pd.DataFrame(
        {"k": [1, 2], "f": [cell1, cell2], "a": [[9.0], [8.0, 7.0]]}
    ).set_index("k")
    r = ref(pdf).to_long("a", "f", expand_cols=["f"]).rename(
        columns={"index_level0": "k", "level_1": "f_level0"})
    expected = _ref_rows(r, ["k", "a_level0", "a", "f_level0", "f_x"])
    sdf = spark.createDataFrame(
        [(1, [(1.0,), (2.0,)], [9.0]), (2, [(3.0,)], [8.0, 7.0])],
        "k long, f array<struct<x double>>, a array<double>",
    )
    got = _spark_rows(
        FrameEngine(sdf, indexcols=["k"]).to_long("a", "f",
                                                  expand_cols=["f"]),
        ["k", "a_level0", "a", "f_level0", "f_x"],
    )
    assert got == expected


def test_to_long_mixed_modes_adversarial(ref, spark):
    """Capstone: nested list + keyed dict + scalar datacols through ONE
    to_long (the tutorial's adversarial shape) — cartesian of the two
    exploded columns, scalar passed through with no level column, on
    both engines."""
    import pandas as pd

    pdf = pd.DataFrame({
        "k": [1, 2],
        "nested": [[[1.0, 2.0]], [[3.0]]],
        "d": [{"p": 10.0}, {"q": 20.0, "r": 30.0}],
        "s": [100.0, 200.0],
    }).set_index("k")
    cols = ["k", "nested_level0", "nested_level1", "nested",
            "d_level0", "d", "s"]
    expected = _ref_rows(
        ref(pdf).to_long().rename(columns={"index_level0": "k"}), cols
    )
    sdf = spark.createDataFrame(
        [(1, [[1.0, 2.0]], {"p": 10.0}, 100.0),
         (2, [[3.0]], {"q": 20.0, "r": 30.0}, 200.0)],
        "k long, nested array<array<double>>, d map<string,double>, s double",
    )
    out = FrameEngine(sdf, indexcols=["k"]).to_long()
    assert "s_level0" not in out.columns  # scalar: no level col, like ref
    got = _spark_rows(out, cols)
    assert got == expected


def test_to_long_expand_index_collision_rename(ref, spark):
    """Tutorial cell 23 shape: expanded frame-cells with a NAMED inner
    MultiIndex (levels 'a','b') alongside a plain datacol 'a'. Reference:
    value columns prefixed (e_c1), inner index levels bare, and the level
    colliding with datacol 'a' merge-suffixed to 'a_e' (frame.py:533).
    Spark rendering: struct fields + expand_index_fields=['a','b']."""
    import pandas as pd

    e_cells = [
        pd.DataFrame(
            {"c1": [1, 2, 3], "c2": [4, 5, 6]},
            index=pd.MultiIndex.from_arrays(
                [["a", "b", "c"], ["x", "y", "z"]], names=["a", "b"]),
        ),
        pd.DataFrame(
            {"c1": [7, 8], "c2": [9, 10]},
            index=pd.MultiIndex.from_arrays(
                [["a", "b"], ["x", "y"]], names=["a", "b"]),
        ),
    ]
    pdf = pd.DataFrame(
        {"k": [1, 2], "a": ["aa", "bb"], "e": e_cells}).set_index("k")
    r = ref(pdf).to_long("a", "e", expand_cols=["e"]).rename(
        columns={"index_level0": "k"})
    assert list(r.columns) == ["k", "a", "a_e", "b", "e_c1", "e_c2"]
    cols = ["k", "a", "a_e", "b", "e_c1", "e_c2"]
    expected = _ref_rows(r, cols)

    sdf = spark.createDataFrame(
        [
            (1, "aa", [("a", "x", 1, 4), ("b", "y", 2, 5), ("c", "z", 3, 6)]),
            (2, "bb", [("a", "x", 7, 9), ("b", "y", 8, 10)]),
        ],
        "k long, a string, "
        "e array<struct<a string, b string, c1 long, c2 long>>",
    )
    out = FrameEngine(sdf, indexcols=["k"]).to_long(
        "a", "e", expand_cols=["e"], expand_index_fields={"e": ["a", "b"]})
    assert sorted(out.columns) == sorted(cols)
    got = _spark_rows(out, cols)
    assert got == expected


def test_to_puffy_aggfunc_series_lambda(ref, spark):
    """to_puffy(aggfunc=<Series-style lambda>): the reference calls the
    callable on the group's Python list (frame.py:1009-1013); our probe
    must reject the Column call and fall through to the GROUPED_AGG
    pandas-UDF path, producing the same scalar per group."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"k": [1, 1, 2, 2, 2], "row": [0, 1, 2, 3, 4],
         "v": [1.0, 3.0, 2.0, 4.0, 9.0]}
    ).set_index(["k", "row"])
    fn = lambda vals: max(vals) - min(vals)  # noqa: E731
    try:
        r = ref(pdf).to_puffy("k", aggfunc=fn)
        expected = {int(k): float(v) for k, v in r["v"].items()}
    except TypeError:
        # pandas >= 2 regression in the reference itself: groupby.aggregate
        # now dispatches per-column Series into helper_func, whose
        # `df.to_dict("list")` (frame.py:1006) then TypeErrors. Replay the
        # reference's documented helper semantics (frame.py:1004-1013:
        # group -> dict of python lists -> aggfunc per list) as the oracle.
        grouped = pdf.reset_index("row").groupby("k").apply(
            lambda g: pd.Series({c: fn(g[c].tolist()) for c in g.columns}))
        expected = {int(k): float(v) for k, v in grouped["v"].items()}

    sdf = spark.createDataFrame(
        [(1, 0, 1.0), (1, 1, 3.0), (2, 2, 2.0), (2, 3, 4.0), (2, 4, 9.0)],
        ["k", "row", "v"])
    eng = FrameEngine(sdf, indexcols=["k", "row"]).to_puffy(
        "k", aggfunc=lambda vals: max(vals) - min(vals))
    got = {r2["k"]: float(r2["v"]) for r2 in eng.table.collect()}
    assert got == expected


def test_variant_heterogeneous_frames(ref, spark):
    """Tutorial column 'f': frame-cells with DIFFERENT structures per row.
    The reference superstacks them into (row-index, column-key) level
    columns with an object-typed value; the Spark rendering is the
    variant path over a JSON encoding — same explosion shape, documented
    deviation: level positions and leaf values surface as strings."""
    import pandas as pd

    f_cells = [
        pd.DataFrame({"c1": [1, 2]}),
        pd.DataFrame({"c2": [3.5], "c3": ["x"]}),
    ]
    pdf = pd.DataFrame({"k": [0, 1], "f": f_cells}).set_index("k")
    r = ref(pdf).to_long("f").rename(columns={"index_level0": "k"})
    assert list(r.columns) == ["k", "f_level0_0", "f_level0_1", "f"]

    def canon(v):
        try:
            return float(v)
        except (TypeError, ValueError):
            return str(v)

    expected = {
        (int(row["k"]), int(row["f_level0_0"]), str(row["f_level0_1"]),
         canon(row["f"]))
        for _, row in r.iterrows()
    }

    sdf = spark.createDataFrame(
        [(0, '[{"c1": 1}, {"c1": 2}]'),
         (1, '[{"c2": 3.5, "c3": "x"}]')],
        "k long, f string",
    )
    out = FrameEngine(sdf, indexcols=["k"]).to_long("f", variant_cols=["f"])
    got = {
        (r2["k"], int(r2["f_level0"]), str(r2["f_level1"]), canon(r2["f"]))
        for r2 in out.collect()
    }
    assert got == expected
