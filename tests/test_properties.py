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


PACK_ROWS = st.lists(
    st.integers(min_value=1, max_value=120),  # token counts
    min_size=1, max_size=40,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(toks=PACK_ROWS, budget=st.integers(min_value=16, max_value=96))
def test_pack_greedy_invariants(spark, toks, budget):
    """Greedy packing invariants on random corpora: pack ids are
    contiguous from 0 per shard; fill never exceeds the budget except for
    a single oversized doc alone in its pack; docs stay in id order
    within packs."""
    from puffbird_spark.operators.packing import pack_greedy
    from pyspark.sql import functions as F

    rows = [(i, "w " * n) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_greedy(df, F.split("text", " "), budget=budget,
                      shards=3).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["doc_id"])
        packs = {}
        for r in docs:
            packs.setdefault(r["pack_id"], []).append(r)
        # contiguous pack ids from 0
        assert sorted(packs) == list(range(len(packs)))
        prev_max_doc = -1
        for pid in sorted(packs):
            members = packs[pid]
            total = sum(m["n_tokens"] for m in members)
            # over-budget packs may only be a single oversized doc
            if total > budget:
                assert len(members) == 1 and members[0]["n_tokens"] > budget
            # final member's pack_fill equals the pack total
            assert members[-1]["pack_fill"] == total
            # id order: every doc in this pack comes after the previous pack
            for m in members:
                assert m["doc_id"] > prev_max_doc
            prev_max_doc = max(m["doc_id"] for m in members)
