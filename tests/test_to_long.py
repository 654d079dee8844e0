"""Golden tests for the explode core, ported from the reference's doctest
examples (``puffbird/frame.py:110-144``) and tutorial scenarios — the
reference's de-facto behavioral spec (SURVEY §5)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from puffbird_spark import FrameEngine, PuffbirdSparkError, puffy_to_long


@pytest.fixture(scope="module")
def doctest_table(spark):
    """FIXTURES.md A1: a=list column (ragged), b=dict-of-lists column."""
    schema = T.StructType([
        T.StructField("index_level0", T.LongType()),
        T.StructField("a", T.ArrayType(T.LongType())),
        T.StructField("b", T.MapType(T.StringType(), T.ArrayType(T.StringType()))),
    ])
    rows = [
        (0, [1, 2, 3], {"c": ["asdf"], "d": ["ret"]}),
        (1, [4, 5, 6, 7], {"d": ["r"]}),
        (2, [3, 4, 5], {"c": ["ff"]}),
    ]
    return spark.createDataFrame(rows, schema)


def test_doctest_golden_13_rows(spark, doctest_table):
    """The reference doctest output (frame.py:130-144): 13 rows, per-row
    cartesian of the two independently exploded columns."""
    eng = FrameEngine(doctest_table, indexcols=["index_level0"])
    out = eng.to_long()
    rows = out.collect()
    assert len(rows) == 13
    assert set(out.columns) == {
        "index_level0", "a_level0", "a", "b_level0", "b_level1", "b",
    }
    got = {
        (r["index_level0"], r["a_level0"], r["a"], r["b_level0"],
         r["b_level1"], r["b"])
        for r in rows
    }
    expected = set()
    data = {
        0: ([1, 2, 3], {"c": ["asdf"], "d": ["ret"]}),
        1: ([4, 5, 6, 7], {"d": ["r"]}),
        2: ([3, 4, 5], {"c": ["ff"]}),
    }
    for idx, (a_list, b_map) in data.items():
        for ai, av in enumerate(a_list):
            for bk, b_list in b_map.items():
                for bi, bv in enumerate(b_list):
                    expected.add((idx, ai, av, bk, bi, bv))
    assert got == expected


def test_single_column_explode(spark, doctest_table):
    eng = FrameEngine(doctest_table, indexcols=["index_level0"])
    out = eng.to_long("a")
    assert out.columns == ["index_level0", "a_level0", "a"]
    assert out.count() == 10  # 3 + 4 + 3


def test_shortcut_matches_engine(spark, doctest_table):
    out = puffy_to_long(doctest_table, "a", indexcols=["index_level0"])
    assert out.count() == 10


def test_max_depth_bounds_explosion(spark, doctest_table):
    """max_depth=1 on the map column peels only the key level."""
    eng = FrameEngine(doctest_table, indexcols=["index_level0"])
    out = eng.to_long("b", max_depth=1)
    assert out.columns == ["index_level0", "b_level0", "b"]
    # value column is still an array
    assert isinstance(out.schema["b"].dataType, T.ArrayType)
    assert out.count() == 4  # 2 + 1 + 1 map entries


def test_dropna_false_keeps_null_cells(spark):
    df = spark.createDataFrame(
        [(0, [1, 2]), (1, None)],
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("xs", T.ArrayType(T.LongType())),
        ]),
    )
    eng = FrameEngine(df, indexcols=["k"])
    assert eng.to_long("xs").count() == 2          # null cell dropped
    out = eng.to_long("xs", dropna=False)
    assert out.count() == 3                        # null survives w/ NULL level
    null_row = [r for r in out.collect() if r["k"] == 1][0]
    assert null_row["xs_level0"] is None and null_row["xs"] is None


def test_outer_join_survival_across_columns(spark):
    """A row whose cell is NaN-dropped in one column still appears in the
    long output via the other column (tutorial cells 14-16)."""
    df = spark.createDataFrame(
        [(0, [1, 2], ["x"]), (1, None, ["y", "z"])],
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("u", T.ArrayType(T.LongType())),
            T.StructField("v", T.ArrayType(T.StringType())),
        ]),
    )
    out = FrameEngine(df, indexcols=["k"]).to_long()
    ks = [r["k"] for r in out.collect()]
    assert sorted(set(ks)) == [0, 1]
    row1 = [r for r in out.collect() if r["k"] == 1]
    assert all(r["u"] is None and r["u_level0"] is None for r in row1)
    assert sorted(r["v"] for r in row1) == ["y", "z"]


def test_shared_axes_positional_zip(spark):
    """shared_axes converts the cartesian product into positional alignment
    (R4, frame.py:401-413; tutorial cell 13)."""
    df = spark.createDataFrame(
        [(0, [1, 2, 3], [10.0, 20.0, 30.0])],
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("p", T.ArrayType(T.LongType())),
            T.StructField("q", T.ArrayType(T.DoubleType())),
        ]),
    )
    eng = FrameEngine(df, indexcols=["k"])
    cart = eng.to_long("p", "q")
    assert cart.count() == 9
    zipped = eng.to_long("p", "q", t={"p": 0, "q": 0})
    assert zipped.count() == 3
    assert "t" in zipped.columns
    got = {(r["t"], r["p"], r["q"]) for r in zipped.collect()}
    assert got == {(0, 1, 10.0), (1, 2, 20.0), (2, 3, 30.0)}


def test_shared_axes_validation(spark, doctest_table):
    eng = FrameEngine(doctest_table, indexcols=["index_level0"])
    with pytest.raises(PuffbirdSparkError):
        eng.to_long("a", ax={"a": 0})  # needs >= 2 columns
    with pytest.raises(PuffbirdSparkError):
        eng.to_long("a", ax={"a": 0, "nope": 0})
    with pytest.raises(PuffbirdSparkError):
        eng.to_long("a", "b", ax={"a": -1, "b": 0})


def test_nested_array_two_levels(spark):
    df = spark.createDataFrame(
        [(0, [[1, 2], [3]])],
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("m", T.ArrayType(T.ArrayType(T.LongType()))),
        ]),
    )
    out = FrameEngine(df, indexcols=["k"]).to_long("m")
    assert out.columns == ["k", "m_level0", "m_level1", "m"]
    got = {(r["m_level0"], r["m_level1"], r["m"]) for r in out.collect()}
    assert got == {(0, 0, 1), (0, 1, 2), (1, 0, 3)}


def test_array_of_struct_stacks_fields(spark):
    """Frame-valued cells: array<struct> explodes to pos + field-name levels
    (reference one-iteration DataFrame.stack, frame.py:39-47)."""
    df = spark.createDataFrame(
        [Row(k=0, e=[Row(c1=1, c2=2), Row(c1=3, c2=4)])],
    )
    out = FrameEngine(df, indexcols=["k"]).to_long("e")
    assert out.columns == ["k", "e_level0", "e_level1", "e"]
    got = {(r["e_level0"], r["e_level1"], r["e"]) for r in out.collect()}
    assert got == {(0, "c1", 1), (0, "c2", 2), (1, "c1", 3), (1, "c2", 4)}


def test_heterogeneous_struct_promotes(spark):
    df = spark.createDataFrame([Row(k=0, s=Row(x=1, y=2.5))])
    out = FrameEngine(df, indexcols=["k"]).to_long("s")
    assert isinstance(out.schema["s"].dataType, T.DoubleType)
    got = {(r["s_level0"], r["s"]) for r in out.collect()}
    assert got == {("x", 1.0), ("y", 2.5)}


def test_primitive_column_passes_through(spark):
    """Primitive datacols stop immediately — no level columns (the Spark
    rendering of series_is_hashable, utils.py:9-20)."""
    df = spark.createDataFrame([(0, "hello", [1])], ["k", "s", "xs"])
    out = FrameEngine(df, indexcols=["k"]).to_long()
    assert set(out.columns) == {"k", "s", "xs_level0", "xs"}
    assert out.count() == 1


def test_expand_cols_inside_to_long(spark):
    """to_long(expand_cols=['e']) inlines struct fields as {col}_{field}
    columns (frame.py:489-503, tutorial cells 21-24)."""
    df = spark.createDataFrame(
        [Row(k=0, e=[Row(a="x", c1=1), Row(a="y", c1=2)], z=[5, 6])],
    )
    out = FrameEngine(df, indexcols=["k"]).to_long("e", "z", expand_cols=["e"])
    assert "e_a" in out.columns and "e_c1" in out.columns
    assert out.count() == 4  # 2 struct rows x 2 z values (cartesian)


def test_expand_col_collision_rename(spark):
    """Standalone expand_col: field colliding with existing column is
    suffix-renamed {field}_{col} (tutorial cell 24: a -> a_e)."""
    df = spark.createDataFrame(
        [Row(k=0, a="keep", e=[Row(a="x", c1=1)])],
    )
    eng = FrameEngine(df, indexcols=["k"]).expand_col("e")
    assert "a_e" in eng.table.columns and "a" in eng.table.columns
    assert "e_level0" in eng.indexcols
    row = eng.table.collect()[0]
    assert row["a"] == "keep" and row["a_e"] == "x"


def test_zip_explode_parallel_and_ragged(spark):
    """Fused shared-axis explosion: aligned pairs; ragged arrays pad with
    NULL (matching the full-outer positional join semantics)."""
    from puffbird_spark.explode import zip_explode

    df = spark.createDataFrame(
        [(0, [1, 2, 3], ["a", "b"])],
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("x", T.ArrayType(T.LongType())),
            T.StructField("y", T.ArrayType(T.StringType())),
        ]),
    )
    out = zip_explode(df, ["k"], ["x", "y"], "t")
    got = {(r["t"], r["x"], r["y"]) for r in out.collect()}
    assert got == {(0, 1, "a"), (1, 2, "b"), (2, 3, None)}
    with pytest.raises(PuffbirdSparkError):
        zip_explode(df.withColumn("s", F.lit("nope")), ["k"], ["x", "s"])


def test_reindex_kwarg_accepted_with_warning(spark):
    """Reference to_long(reindex=...) (frame.py:536-542) is accepted for
    drop-in compatibility and ignored with a warning."""
    from puffbird_spark import FrameEngine

    df = spark.createDataFrame([(0, [1, 2])], ["k", "xs"])
    eng = FrameEngine(df, indexcols=["k"], validate=False)
    with pytest.warns(UserWarning, match="reindex"):
        out = eng.to_long("xs", reindex=True)
    plain = eng.to_long("xs")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))
