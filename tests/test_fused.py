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
def test_fold_exact_interleaved_plain_column(spark, dropna):
    """Round-8: a plain column BETWEEN axis members changes the fold —
    a position only the later member holds lands as ONE standalone row
    per key (not replicated across the plain column's expansion). The
    fold-exact path compiles this order sensitivity into generators:
    join-equivalent, zero shuffles, in both column orders."""
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
        (4, [60, None], ["w"], [70, 71, 72]),  # null leaf in leader
    ]
    df = spark.createDataFrame(rows, schema)
    eng = FrameEngine(df, indexcols=["k"])
    kw = dict(ax={"b": 0, "d": 0})
    for order in (("b", "s", "d"), ("s", "b", "d"), ("b", "d", "s")):
        join = eng.to_long(*order, dropna=dropna, strategy="join", **kw)
        fused = eng.to_long(*order, dropna=dropna, strategy="fused", **kw)
        assert sorted(join.columns) == sorted(fused.columns), order
        assert _multiset(join) == _multiset(fused), (order, dropna)
        assert P.count_exchanges(fused) == 0, order
        auto = eng.to_long(*order, dropna=dropna, **kw)
        assert P.count_exchanges(auto) == 0, order


@pytest.mark.parametrize("dropna", [True, False])
def test_fold_exact_disjoint_axis_groups(spark, dropna):
    """VERDICT r7 #7: TWO disjoint shared-axis groups fuse exactly —
    the second group's member-only positions land once per key
    (standalone rows), everything else composes multiplicatively."""
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
    for order in (("p", "q", "r", "s"), ("p", "r", "q", "s"),
                  ("r", "s", "p", "q")):
        kw = dict(ax1={"p": 0, "q": 0}, ax2={"r": 0, "s": 0})
        join = eng.to_long(*order, dropna=dropna, strategy="join", **kw)
        fused = eng.to_long(*order, dropna=dropna, strategy="fused", **kw)
        assert sorted(join.columns) == sorted(fused.columns), order
        assert _multiset(join) == _multiset(fused), (order, dropna)
        assert P.count_exchanges(fused) == 0, order


@pytest.mark.parametrize("dropna", [True, False])
def test_fold_exact_deep_group_with_free_sublevels(spark, dropna):
    """A depth-0+1 chain group with free sublevels below, a shallow
    second group, and a plain column — non-prefix order, fused."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("b", T.ArrayType(
            T.ArrayType(T.ArrayType(T.DoubleType())))),
        T.StructField("d", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("p", T.ArrayType(T.LongType())),
        T.StructField("q", T.ArrayType(T.LongType())),
        T.StructField("s", T.StringType()),
    ])
    rows = [
        (0, [[[1.0], [2.0, 3.0]]], [[0.1]], [1, 2], [3], "x"),
        (1, None, [[1.1, 1.2]], None, [4], None),
        (2, [[[7.0, None]], []], [[8.0], [9.0]], [5], [], "y"),
        (3, [[], [[11.0]]], [[12.0]], [], None, "z"),
        (4, [[None]], [[13.0], None], [6, 7], [8, 9], None),
        (5, None, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, schema)
    eng = FrameEngine(df, indexcols=["k"])
    kw = dict(t={"b": 0, "d": 0}, ax={"b": 1, "d": 1},
              u={"p": 0, "q": 0})
    order = ("p", "b", "s", "d", "q")
    join = eng.to_long(*order, dropna=dropna, strategy="join", **kw)
    fused = eng.to_long(*order, dropna=dropna, strategy="fused", **kw)
    assert sorted(join.columns) == sorted(fused.columns)
    assert _multiset(join) == _multiset(fused)
    assert P.count_exchanges(fused) == 0


def test_fold_exact_randomized(spark):
    """Randomized differential: two groups (one deep with free
    sublevels), a plain nested column, several column orders, both
    dropna modes — ragged, null cells, null inner arrays, null leaves."""
    rng = random.Random(29)

    def arr(depth):
        if rng.random() < 0.18:
            return None
        n = rng.randint(0, 3)
        if depth <= 1:
            return [rng.choice([None, rng.randint(0, 9)])
                    for _ in range(n)]
        return [arr(depth - 1) for _ in range(n)]

    rows = [(k, arr(2), arr(2), arr(1), arr(1), arr(1))
            for k in range(25)]
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("b", T.ArrayType(T.ArrayType(T.LongType()))),
        T.StructField("d", T.ArrayType(T.ArrayType(T.LongType()))),
        T.StructField("p", T.ArrayType(T.LongType())),
        T.StructField("q", T.ArrayType(T.LongType())),
        T.StructField("z", T.ArrayType(T.LongType())),
    ])
    df = spark.createDataFrame(rows, schema)
    eng = FrameEngine(df, indexcols=["k"])
    kw = dict(ax={"b": 0, "d": 0}, u={"p": 0, "q": 0})
    for order in (("b", "d", "p", "q", "z"), ("b", "p", "d", "q", "z"),
                  ("z", "p", "b", "q", "d")):
        for dropna in (True, False):
            join = eng.to_long(*order, dropna=dropna,
                               strategy="join", **kw)
            fused = eng.to_long(*order, dropna=dropna,
                                strategy="fused", **kw)
            assert _multiset(join) == _multiset(fused), (order, dropna)


def test_fused_partial_axis_overlap_still_falls_back(spark):
    """An axis bridging two chains (q carries ax1 AND ax2, p only ax1)
    is a partial overlap — multiplicities change under ragged data, so
    auto must use join and explicit fused must refuse."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("p", T.ArrayType(T.LongType())),
        T.StructField("q", T.ArrayType(T.ArrayType(T.LongType()))),
        T.StructField("r", T.ArrayType(T.ArrayType(T.LongType()))),
    ])
    df = spark.createDataFrame(
        [(0, [1, 2], [[3], [4, 5]], [[6]])], schema)
    eng = FrameEngine(df, indexcols=["k"])
    # ax1 on {p@0, q@0}; ax2 on {q@1, r@1} — q bridges, r's depth-0 free
    kw = dict(ax1={"p": 0, "q": 0}, ax2={"q": 1, "r": 1})
    with pytest.raises(PuffbirdSparkError):
        eng.to_long("p", "q", "r", strategy="fused", **kw)
    auto = eng.to_long("p", "q", "r", **kw)
    join = eng.to_long("p", "q", "r", strategy="join", **kw)
    assert _multiset(auto) == _multiset(join)


@pytest.mark.parametrize("dropna", [True, False])
def test_fused_zip_leaf_dead_subcells(spark, dropna):
    """Round-8 regression (zip path): a zip position whose sub-cell is
    non-null but produces ZERO frame rows downstream (`[]`, `[None]`)
    must be dropped unless another member's sub-tree survives — a bare
    isNotNull pred kept phantom positions the join never had."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("b", T.ArrayType(T.ArrayType(T.LongType()))),
        T.StructField("d", T.ArrayType(T.ArrayType(T.LongType()))),
        T.StructField("p", T.ArrayType(T.LongType())),
    ])
    rows = [
        (4, [[None]], [[0, 6, None], []], [6, 0, None]),
        (5, [[], [None, None]], [[1]], [2]),
        (6, [[7]], [[], [None]], None),
    ]
    df = spark.createDataFrame(rows, schema)
    eng = FrameEngine(df, indexcols=["k"])
    kw = dict(ax={"b": 0, "d": 0})
    join = eng.to_long("b", "d", "p", dropna=dropna, strategy="join", **kw)
    fused = eng.to_long("b", "d", "p", dropna=dropna,
                        strategy="fused", **kw)
    assert _multiset(join) == _multiset(fused)
    assert P.count_exchanges(fused) == 0


def test_fold_exact_randomized_more_seeds(spark):
    """Additional randomized sweeps — the seed-29 sweep caught both the
    empty-leader main-lineage case and the zip leaf-survival bug, so
    buy more dice rolls."""
    for seed in (101, 202):
        rng = random.Random(seed)

        def arr(depth):
            if rng.random() < 0.25:
                return None
            n = rng.randint(0, 3)
            if depth <= 1:
                return [rng.choice([None, rng.randint(0, 9)])
                        for _ in range(n)]
            return [arr(depth - 1) for _ in range(n)]

        rows = [(k, arr(2), arr(2), arr(1), arr(1)) for k in range(20)]
        schema = T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("b", T.ArrayType(T.ArrayType(T.LongType()))),
            T.StructField("d", T.ArrayType(T.ArrayType(T.LongType()))),
            T.StructField("p", T.ArrayType(T.LongType())),
            T.StructField("q", T.ArrayType(T.LongType())),
        ])
        df = spark.createDataFrame(rows, schema)
        eng = FrameEngine(df, indexcols=["k"])
        kw = dict(ax={"b": 0, "d": 0}, u={"p": 0, "q": 0})
        for order in (("b", "d", "p", "q"), ("p", "b", "q", "d")):
            for dropna in (True, False):
                join = eng.to_long(*order, dropna=dropna,
                                   strategy="join", **kw)
                fused = eng.to_long(*order, dropna=dropna,
                                    strategy="fused", **kw)
                assert _multiset(join) == _multiset(fused), (
                    seed, order, dropna)
