"""Engine construction, projection, apply/drop/rename (R1, R6-R10)."""

import pytest
from pyspark.sql import functions as F

from puffbird_spark import CallableContainer, FrameEngine, PuffbirdSparkError


@pytest.fixture(scope="module")
def simple(spark):
    return spark.createDataFrame(
        [(0, "x", 1.0, [1, 2]), (1, "y", 2.0, [3])],
        ["k", "s", "v", "xs"],
    )


def test_auto_surrogate_key(spark):
    df = spark.createDataFrame([("a",), ("b",)], ["c"])
    eng = FrameEngine(df)
    assert eng.indexcols == ["index_level0"]
    assert eng.datacols == ["c"]
    assert eng.table.select("index_level0").distinct().count() == 2


def test_explicit_indexcols(simple):
    eng = FrameEngine(simple, indexcols=["k"])
    assert eng.indexcols == ["k"]
    assert eng.datacols == ["s", "v", "xs"]


def test_datacols_infers_indexcols(simple):
    eng = FrameEngine(simple, datacols=["xs"])
    assert set(eng.indexcols) == {"k", "s", "v"}


def test_duplicate_keys_rejected(spark):
    df = spark.createDataFrame([(0, "a"), (0, "b")], ["k", "v"])
    # eager: reference semantics, the check job runs at construction
    with pytest.raises(PuffbirdSparkError, match="unique"):
        FrameEngine(df, indexcols=["k"], validate="eager")
    with pytest.raises(PuffbirdSparkError, match="unique"):
        FrameEngine(df, indexcols=["k"], validate=True)
    FrameEngine(df, indexcols=["k"], validate=False)  # opt-out works


def test_lazy_validation_defers_to_first_use(spark):
    df = spark.createDataFrame([(0, "a"), (0, "b")], ["k", "v"])
    eng = FrameEngine(df, indexcols=["k"])  # default lazy: no job, no raise
    with pytest.raises(PuffbirdSparkError, match="unique"):
        eng.to_long("v")
    with pytest.raises(PuffbirdSparkError, match="unique"):
        FrameEngine(df, indexcols=["k"]).validate_keys()


def test_lazy_validation_no_job_at_construction(spark):
    """Default construction must be plan-only — no Spark job."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None) or []
    df = spark.createDataFrame([(0, "a"), (1, "b")], ["k", "v"])
    FrameEngine(df, indexcols=["k"])
    after = tracker.getJobIdsForGroup(None) or []
    assert len(after) == len(before), "lazy construction launched a job"
    # and validation runs AT MOST once when requested
    eng = FrameEngine(df, indexcols=["k"])
    eng.validate_keys()
    assert eng.validate_keys() is eng  # second call: cached no-op


def test_reserved_datacol_rejected(spark):
    df = spark.createDataFrame([(0, 1)], ["k", "apply_result"])
    with pytest.raises(PuffbirdSparkError, match="reserved"):
        FrameEngine(df, indexcols=["k"])


def test_index_datacol_name_collision_rejected(spark):
    """Index col matching {datacol}_level{n} pattern is rejected
    (reference DATACOL_REGEX, frame.py:33 / frame.py:1347-1352)."""
    df = spark.createDataFrame([(0, [1])], ["a_level0", "a"])
    with pytest.raises(PuffbirdSparkError, match="collides"):
        FrameEngine(df, indexcols=["a_level0"])


def test_projection(simple):
    eng = FrameEngine(simple, indexcols=["k"])
    sub = eng[["s", "v"]]
    assert sub.datacols == ["s", "v"]
    assert set(sub.table.columns) == {"k", "s", "v"}
    with pytest.raises(PuffbirdSparkError):
        eng[["k"]]  # index col is not a data column


def test_col_apply_native_column(simple):
    eng = FrameEngine(simple, indexcols=["k"])
    out = eng.col_apply(F.col("v") * 10, "v", new_col_name="v10")
    got = {r["v10"] for r in out.table.collect()}
    assert got == {10.0, 20.0}
    assert "v10" in out.datacols


def test_col_apply_python_udf(simple):
    eng = FrameEngine(simple, indexcols=["k"])
    out = eng.col_apply(lambda x: x.upper(), "s", new_col_name="S",
                        return_type="string")
    assert {r["S"] for r in out.table.collect()} == {"X", "Y"}


def test_apply_defaults_to_arrow_plan(simple):
    """A bare Python callable lands on ArrowEvalPython (Arrow-batched
    pandas_udf per-element map), NOT row-at-a-time BatchEvalPython —
    the explicit arrow=False opt-out is the only way to the slow path
    (VERDICT r5 #4)."""
    eng = FrameEngine(simple, indexcols=["k"])
    fast_col = eng.col_apply(lambda x: x.upper(), "s", new_col_name="S",
                             return_type="string")
    fast_row = eng.apply(lambda s, v: f"{s}:{v}", "tag", "s", "v",
                         return_type="string")
    slow = eng.col_apply(lambda x: x.upper(), "s", new_col_name="S",
                         return_type="string", arrow=False)
    for out in (fast_col, fast_row):
        plan = out.table._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan
    plan = slow.table._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" in plan


def test_apply_arrow_matches_udf(simple):
    """Arrow default and F.udf opt-out agree value-for-value, NULLs
    included, on string columns."""
    eng = FrameEngine(simple, indexcols=["k"])
    for kw in ({}, {"arrow": False}):
        out = eng.apply(lambda s, v: f"{s}:{v}", "tag", "s", "v",
                        return_type="string", **kw)
        assert {r["tag"] for r in out.table.collect()} == {"x:1.0", "y:2.0"}


def test_apply_multi_column(simple):
    eng = FrameEngine(simple, indexcols=["k"])
    out = eng.apply(lambda s, v: f"{s}:{v}", "tag", "s", "v",
                    return_type="string")
    assert {r["tag"] for r in out.table.collect()} == {"x:1.0", "y:2.0"}
    assert "tag" in out.datacols


def test_apply_map_kws(simple):
    """map_kws passes column values as keyword args — the documented
    behavior the reference breaks (frame.py:793 typo)."""
    eng = FrameEngine(simple, indexcols=["k"])
    out = eng.apply(
        lambda a, scale=1.0: a * scale, "scaled", "v",
        return_type="double", map_kws={"scale": "v"},
    )
    assert {r["scaled"] for r in out.table.collect()} == {1.0, 4.0}


def test_apply_default_name(simple):
    eng = FrameEngine(simple, indexcols=["k"])
    out = eng.apply(lambda v: v + 1, None, "v", return_type="double")
    assert "apply_result" in out.table.columns  # frame.py:787-788


def test_apply_assign_to_index_uniqueness(spark):
    df = spark.createDataFrame([(0, "a"), (1, "a")], ["k", "g"])
    eng = FrameEngine(df, indexcols=["k"])
    out = eng.apply(lambda g: g, "g2", "g", return_type="string",
                    assign_to_index=True)
    assert "g2" in out.indexcols  # (k, g2) still unique


def test_drop_and_rename(simple):
    eng = FrameEngine(simple, indexcols=["k"])
    out = eng.drop("xs")
    assert "xs" not in out.table.columns
    out2 = eng.rename(v="value")
    assert "value" in out2.datacols and "v" not in out2.table.columns
    with pytest.raises(PuffbirdSparkError):
        eng.drop("k")  # cannot drop all index columns


def test_callable_container_dispatch():
    cc = CallableContainer(lambda x: "default")
    cc.add(lambda x: "int", int)
    cc.add(lambda x: "str", str)
    assert cc(3) == "int"
    assert cc("a") == "str"
    assert cc(1.5) == "default"


def test_enforce_identifier_string(spark):
    """Identifier sanitation (R18, frame.py:1113-1168): illegal characters
    are spelled out deterministically."""
    df = spark.createDataFrame([(1, 2.0, 3.0)], ["k", "my-col", "pct %"])
    eng = FrameEngine(df, indexcols=["k"], enforce_identifier_string=True)
    assert set(eng.datacols) == {"my_MINUS_col", "pct__PERCENT_"}


def test_union_by_name_missing_columns(spark):
    """unionByName with allowMissingColumns — EXT set-op surface."""
    a = spark.createDataFrame([(1, "x")], ["k", "only_a"])
    b = spark.createDataFrame([(2, 9.0)], ["k", "only_b"])
    out = a.unionByName(b, allowMissingColumns=True)
    rows = {r["k"]: (r["only_a"], r["only_b"]) for r in out.collect()}
    assert rows == {1: ("x", None), 2: (None, 9.0)}


def test_python_udtf(spark):
    """Python UDTF surface (SURVEY §2.2 UDF row): table function splitting
    text into (word, length) rows, callable from SQL."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, n: int")
    class SplitWords:
        def eval(self, text: str):
            for w in (text or "").split(" "):
                yield w, len(w)

    spark.udtf.register("pbs_split_words", SplitWords)
    rows = spark.sql("SELECT * FROM pbs_split_words('a bb ccc')").collect()
    assert [(r["word"], r["n"]) for r in rows] == [("a", 1), ("bb", 2), ("ccc", 3)]


def test_schema_of_json(spark):
    """schema_of_json (SURVEY §2.2 json row) — schema discovery for the
    variant ingest path."""
    s = spark.range(1).select(
        F.schema_of_json(F.lit('{"k": 1, "xs": [1.5]}')).alias("s")
    ).collect()[0]["s"]
    assert "k" in s and "BIGINT" in s and "ARRAY" in s


def test_cols_and_rename_views(spark):
    """Reference parity: cols, datacols_rename/indexcols_rename/cols_rename
    (frame.py:244-293) — rename views track original -> current names,
    composing across chained renames."""
    df = spark.createDataFrame([(0, 1.0, "x")], ["k", "v", "s"])
    eng = FrameEngine(df, indexcols=["k"], validate=False)
    assert eng.cols == ["v", "s", "k"]

    r1 = eng.rename(v="value")
    assert r1.datacols_rename == {"v": "value"}
    assert r1.indexcols_rename == {}
    r2 = r1.rename(value="val2", k="key")
    assert r2.datacols_rename == {"v": "val2"}     # composed a->b->c
    assert r2.indexcols_rename == {"k": "key"}
    assert r2.cols_rename == {"v": "val2", "k": "key"}
    assert r2.cols == ["val2", "s", "key"]


def test_oracle_registry_lint_no_complex_columns():
    """Registry lint (round-3 VERDICT #1): no oracle-hashed query may emit
    a top-level array/map/struct column — the driver canonicalizer cannot
    hash list cells, a class that shipped twice (r2 fn_struct, r3
    agg_percentiles_exact). DuckDB DESCRIBE over the oracle; the Spark
    side must mirror the oracle schema to hash-match, so this covers both
    engines without executing anything."""
    from puffbird_spark.queries.base import lint_oracles

    assert lint_oracles() == []
