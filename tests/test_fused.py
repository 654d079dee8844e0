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
