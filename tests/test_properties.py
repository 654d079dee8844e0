"""Property-based tests (SURVEY §5.3) with hypothesis: explode/nest
round-trip invariants over randomized nested tables."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from puffbird_spark import FrameEngine

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10 ** 6),          # k (unique-ified below)
        st.lists(st.integers(min_value=-100, max_value=100),  # xs
                 max_size=6),
        st.dictionaries(st.sampled_from(["a", "b", "c"]),     # m
                        st.integers(min_value=0, max_value=9),
                        max_size=3),
    ),
    min_size=1,
    max_size=12,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("xs", T.ArrayType(T.LongType())),
    T.StructField("m", T.MapType(T.StringType(), T.LongType())),
])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=ROWS)
def test_explode_counts_and_roundtrip(spark, rows):
    # unique keys (hypothesis may duplicate k)
    rows = [(i, xs, m) for i, (_, xs, m) in enumerate(rows)]
    df = spark.createDataFrame(rows, SCHEMA)
    eng = FrameEngine(df, indexcols=["k"], validate=False)

    # invariant 1: explode row count = sum of cell cardinalities
    long_xs = eng.to_long("xs")
    assert long_xs.count() == sum(len(xs) for _, xs, _ in rows)
    long_m = eng.to_long("m", max_depth=1)
    assert long_m.count() == sum(len(m) for _, _, m in rows)

    # invariant 2: key columns functionally determine original rows —
    # re-nesting recovers the original multisets (empty cells drop)
    back = FrameEngine(long_xs, indexcols=["k", "xs_level0"], validate=False)
    rt = back.to_puffy("k", sort_by=["xs_level0"])
    got = {r["k"]: list(r["xs"]) for r in rt.table.collect()}
    expected = {k: xs for k, xs, _ in rows if xs}
    assert got == expected

    # invariant 3: map explode preserves key->value pairs exactly
    pairs = {(r["k"], r["m_level0"], r["m"]) for r in long_m.collect()}
    expected_pairs = {(k, mk, mv) for k, _, m in rows for mk, mv in m.items()}
    assert pairs == expected_pairs
