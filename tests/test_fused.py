"""Fused to_long must be EXACTLY equivalent to the join-based assembly —
differential-tested on adversarial and randomized nested data, plan-tested
for the zero-shuffle claim."""

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from puffbird_spark import FrameEngine, PuffbirdSparkError
from puffbird_spark import plans as P


def _multiset(df):
    return sorted(
        tuple(str(v) for v in row)
        for row in df.select(*sorted(df.columns)).collect()
    )


@pytest.fixture(scope="module")
def nasty(spark):
    """Null cells, empty arrays, null leaves, empty maps, null map values,
    struct cells — every divergence candidate between the two strategies."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("xs", T.ArrayType(T.LongType())),
        T.StructField("m", T.MapType(T.StringType(), T.LongType())),
        T.StructField("s", T.StringType()),
    ])
    rows = [
        (0, [1, 2], {"a": 1}, "v0"),
        (1, None, {"b": 2, "c": 3}, "v1"),        # null array cell
        (2, [], {"d": 4}, "v2"),                  # empty array cell
        (3, [3, None, 4], {}, "v3"),              # null leaf + empty map
        (4, [5], {"e": None}, None),              # null map value + null scalar
        (5, None, None, None),                    # everything null
        (6, [None, None], {"f": 6}, "v6"),        # all-null leaves
    ]
    return spark.createDataFrame(rows, schema)


@pytest.mark.parametrize("dropna", [True, False])
def test_fused_equals_join_on_nasty(spark, nasty, dropna):
    eng = FrameEngine(nasty, indexcols=["k"])
    join = eng.to_long("xs", "m", "s", dropna=dropna, strategy="join")
    fused = eng.to_long("xs", "m", "s", dropna=dropna, strategy="fused")
    assert sorted(join.columns) == sorted(fused.columns)
    assert _multiset(join) == _multiset(fused)


def test_fused_equals_join_randomized(spark):
    rng = random.Random(7)
    rows = []
    for k in range(30):
        xs = (None if rng.random() < 0.2 else
              [rng.choice([None, rng.randint(0, 9)])
               for _ in range(rng.randint(0, 4))])
        m = (None if rng.random() < 0.2 else
             {f"k{j}": rng.choice([None, rng.randint(0, 9)])
              for j in range(rng.randint(0, 3))})
        rows.append((k, xs, m))
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("xs", T.ArrayType(T.LongType())),
        T.StructField("m", T.MapType(T.StringType(), T.LongType())),
    ])
    df = spark.createDataFrame(rows, schema)
    eng = FrameEngine(df, indexcols=["k"])
    for dropna in (True, False):
        join = eng.to_long("xs", "m", dropna=dropna, strategy="join")
        fused = eng.to_long("xs", "m", dropna=dropna, strategy="fused")
        assert _multiset(join) == _multiset(fused), f"dropna={dropna}"


def test_fused_struct_and_nested(spark):
    df = spark.createDataFrame(
        [Row(k=0, e=[Row(c1=1, c2=2)], nn=[[1], [2, 3]]),
         Row(k=1, e=None, nn=[[4]])],
    )
    eng = FrameEngine(df, indexcols=["k"])
    join = eng.to_long("e", "nn", strategy="join")
    fused = eng.to_long("e", "nn", strategy="fused")
    assert _multiset(join) == _multiset(fused)


def test_fused_is_default_and_shuffle_free(spark, nasty):
    eng = FrameEngine(nasty, indexcols=["k"])
    auto = eng.to_long("xs", "m")          # auto -> fused for 2+ plain cols
    assert P.count_exchanges(auto) == 0    # the whole point
    join = eng.to_long("xs", "m", strategy="join")
    assert P.count_exchanges(join) >= 1    # the join it replaces


def test_fused_rejects_unsupported_combos(spark, nasty):
    eng = FrameEngine(nasty, indexcols=["k"])
    with pytest.raises(PuffbirdSparkError, match="fused"):
        eng.to_long("xs", "m", strategy="fused", ax={"xs": 0, "m": 0})
    with pytest.raises(PuffbirdSparkError, match="strategy"):
        eng.to_long("xs", strategy="bogus")


def test_doctest_golden_under_fused(spark):
    """The reference 13-row golden must hold under the fused strategy."""
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
    df = spark.createDataFrame(rows, schema)
    out = FrameEngine(df, indexcols=["index_level0"]).to_long(strategy="fused")
    assert out.count() == 13
    assert set(out.columns) == {
        "index_level0", "a_level0", "a", "b_level0", "b_level1", "b",
    }


NESTED = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("b", T.ArrayType(T.ArrayType(T.DoubleType()))),
    T.StructField("d", T.ArrayType(T.ArrayType(T.DoubleType()))),
])
NESTED_ROWS = [
    (0, [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], [[0.1, 0.2, 0.3]]),
    (1, None, [[1.1, 1.2]]),                      # null cell
    (2, [[7.0, None]], [[8.0, 9.0, 10.0]]),       # null leaf + ragged
    (3, [[], [11.0]], [[12.0]]),                  # empty inner array
    (4, [None, [13.0]], [[14.0], None]),          # null inner arrays
    (5, [], []),                                  # both empty
    (6, [[15.0]], None),                          # null cell other side
]


@pytest.mark.parametrize("dropna", [True, False])
def test_fused_prefix_shared_axes_equals_join(spark, dropna):
    """Contiguous shared axes (depths 0 and 1, both members) zip inside
    the fused chain — identical to the join path's positional outer join,
    including ragged lengths, null inner arrays, null leaves, null and
    empty cells, in both dropna modes. Zero shuffles."""
    df = spark.createDataFrame(NESTED_ROWS, NESTED)
    eng = FrameEngine(df, indexcols=["k"])
    kw = dict(t={"b": 0, "d": 0}, ax={"b": 1, "d": 1})
    join = eng.to_long("b", "d", dropna=dropna, strategy="join", **kw)
    fused = eng.to_long("b", "d", dropna=dropna, strategy="fused", **kw)
    assert sorted(join.columns) == sorted(fused.columns)
    assert _multiset(join) == _multiset(fused)
    assert P.count_exchanges(fused) == 0


@pytest.mark.parametrize("dropna", [True, False])
def test_fused_shared_axis_with_free_sublevels(spark, dropna):
    """One shared axis at depth 0, free (unshared) explosion below it, plus
    an independent non-axis column — still join-equivalent and join-free."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("b", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("d", T.ArrayType(T.LongType())),
        T.StructField("s", T.StringType()),
    ])
    rows = [
        (0, [[1.0], [2.0, 3.0]], [7, 8, 9], "x"),
        (1, [None, []], [10], None),
        (2, None, None, "y"),
        (3, [[None, 4.0]], [], "z"),
    ]
    df = spark.createDataFrame(rows, schema)
    eng = FrameEngine(df, indexcols=["k"])
    kw = dict(ch={"b": 0, "d": 0})
    join = eng.to_long("b", "d", "s", dropna=dropna, strategy="join", **kw)
    fused = eng.to_long("b", "d", "s", dropna=dropna, strategy="fused", **kw)
    assert sorted(join.columns) == sorted(fused.columns)
    assert _multiset(join) == _multiset(fused)
    assert P.count_exchanges(fused) == 0


@pytest.mark.parametrize("dropna", [True, False])
def test_fused_free_level_above_shared_falls_back(spark, dropna):
    """A free level ABOVE the shared depth changes row multiplicities under
    ragged data — auto must pick the join path; explicit fused refuses."""
    df = spark.createDataFrame(NESTED_ROWS, NESTED)
    eng = FrameEngine(df, indexcols=["k"])
    kw = dict(ax={"b": 1, "d": 1})  # depth 0 left unshared
    auto = eng.to_long("b", "d", dropna=dropna, **kw)
    join = eng.to_long("b", "d", dropna=dropna, strategy="join", **kw)
    assert _multiset(auto) == _multiset(join)
    with pytest.raises(PuffbirdSparkError):
        eng.to_long("b", "d", dropna=dropna, strategy="fused", **kw)


def test_fused_randomized_prefix_axes(spark):
    """Randomized differential: nested ragged/nullable arrays, shared at
    depths 0+1, both dropna modes."""
    rng = random.Random(11)

    def inner():
        if rng.random() < 0.15:
            return None
        return [rng.choice([None, round(rng.uniform(0, 9), 1)])
                for _ in range(rng.randint(0, 3))]

    def outer():
        if rng.random() < 0.15:
            return None
        return [inner() for _ in range(rng.randint(0, 3))]

    rows = [(k, outer(), outer()) for k in range(40)]
    df = spark.createDataFrame(rows, NESTED)
    eng = FrameEngine(df, indexcols=["k"])
    kw = dict(t={"b": 0, "d": 0}, ax={"b": 1, "d": 1})
    for dropna in (True, False):
        join = eng.to_long("b", "d", dropna=dropna, strategy="join", **kw)
        fused = eng.to_long("b", "d", dropna=dropna, strategy="fused", **kw)
        assert _multiset(join) == _multiset(fused), f"dropna={dropna}"


@pytest.mark.parametrize("dropna", [True, False])
def test_fused_shared_axes_top_level(spark, dropna):
    """Depth-0 shared axis (the zip_explode case) through to_long — null
    and empty cells produce the join path's unmatched axis-NULL rows."""
    df = spark.createDataFrame(
        [
            (0, [1, 2, 3], [10.0, 20.0, 30.0]),
            (1, [4], [40.0, 50.0]),
            (2, None, [60.0]),          # null cell
            (3, [], [70.0]),            # empty cell
            (4, None, None),            # both null
            (5, [5, None], [80.0]),     # null leaf + ragged
        ],
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("p", T.ArrayType(T.LongType())),
            T.StructField("q", T.ArrayType(T.DoubleType())),
        ]),
    )
    eng = FrameEngine(df, indexcols=["k"])
    kw = dict(t={"p": 0, "q": 0})
    join = eng.to_long("p", "q", dropna=dropna, strategy="join", **kw)
    fused = eng.to_long("p", "q", dropna=dropna, strategy="fused", **kw)
    assert _multiset(join) == _multiset(fused)
    assert P.count_exchanges(fused) == 0


def test_fused_shared_axis_on_map_falls_back(spark):
    """Map-typed shared level: fused is positional-only, so auto must fall
    back to join and explicit fused must refuse."""
    df = spark.createDataFrame(
        [(0, {"a": 1}, {"a": 2.0})],
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("m1", T.MapType(T.StringType(), T.LongType())),
            T.StructField("m2", T.MapType(T.StringType(), T.DoubleType())),
        ]),
    )
    eng = FrameEngine(df, indexcols=["k"])
    out = eng.to_long("m1", "m2", ax={"m1": 0, "m2": 0})  # auto -> join
    got = {(r["ax"], r["m1"], r["m2"]) for r in out.collect()}
    assert got == {("a", 1, 2.0)}
    with pytest.raises(PuffbirdSparkError):
        eng.to_long("m1", "m2", strategy="fused", ax={"m1": 0, "m2": 0})


@pytest.mark.parametrize("dropna", [True, False])
def test_fused_interleaved_plain_column_falls_back(spark, dropna):
    """Round-8 regression: a plain column BETWEEN axis members changes
    the fold — a position only the later member holds lands as ONE
    standalone row per key in the join assembly, but a positional zip
    would replicate it across the plain column's expansion. auto must
    use join; explicit fused must refuse; member-prefix order fuses."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("b", T.ArrayType(T.LongType())),
        T.StructField("s", T.ArrayType(T.StringType())),
        T.StructField("d", T.ArrayType(T.LongType())),
    ])
    rows = [
        (1, [10], ["x", "y"], [20, 21]),       # d-only position 1
        (2, None, ["z"], [30]),                # null first member
        (3, [40, 41], [], [50]),               # b-only position 1
    ]
    df = spark.createDataFrame(rows, schema)
    eng = FrameEngine(df, indexcols=["k"])
    kw = dict(ax={"b": 0, "d": 0})
    join = eng.to_long("b", "s", "d", dropna=dropna, strategy="join", **kw)
    auto = eng.to_long("b", "s", "d", dropna=dropna, **kw)
    assert _multiset(auto) == _multiset(join)
    with pytest.raises(PuffbirdSparkError):
        eng.to_long("b", "s", "d", dropna=dropna, strategy="fused", **kw)
    # members leading the order: the proven prefix fusion still applies
    fused = eng.to_long("b", "d", "s", dropna=dropna,
                        strategy="fused", **kw)
    join2 = eng.to_long("b", "d", "s", dropna=dropna,
                        strategy="join", **kw)
    assert _multiset(fused) == _multiset(join2)
    assert P.count_exchanges(fused) == 0


@pytest.mark.parametrize("dropna", [True, False])
def test_disjoint_axis_groups_match_join_under_auto(spark, dropna):
    """TWO disjoint shared-axis groups: the fold aligns the second
    group via accumulated axis values (once-per-key standalone rows for
    member-only positions), which the current zip machinery cannot
    express — auto must fall back to join and match it."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("p", T.ArrayType(T.LongType())),
        T.StructField("q", T.ArrayType(T.DoubleType())),
        T.StructField("r", T.ArrayType(T.LongType())),
        T.StructField("s", T.ArrayType(T.DoubleType())),
    ])
    rows = [
        (0, [1, 2], [1.0], [7], [9.5, 8.5]),
        (1, None, [2.0, 3.0], [], [0.5]),
        (2, [], [], [8, 9], None),
        (3, [3, None], [4.0], None, None),
        (4, None, None, None, None),
        (5, [5], None, [10, None], [1.5]),
    ]
    df = spark.createDataFrame(rows, schema)
    eng = FrameEngine(df, indexcols=["k"])
    kw = dict(ax1={"p": 0, "q": 0}, ax2={"r": 0, "s": 0})
    join = eng.to_long("p", "q", "r", "s", dropna=dropna,
                       strategy="join", **kw)
    auto = eng.to_long("p", "q", "r", "s", dropna=dropna, **kw)
    assert _multiset(auto) == _multiset(join)
    with pytest.raises(PuffbirdSparkError):
        eng.to_long("p", "q", "r", "s", dropna=dropna,
                    strategy="fused", **kw)
