"""Engine-surface gates for the reference rows that round 1 covered only
with unit tests: R6 projection, R7 col_apply, R8 apply, R9/R10 drop/rename,
R13 puffy_to_long shortcut, R18 identifier sanitation. Each runs the actual
FrameEngine method and oracle-checks the result, so SURVEY §2.1 parity has
driver evidence end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..engine import FrameEngine
from .base import dec, load, query


@query("engine_col_apply", oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
  CAST(l_quantity AS DOUBLE) * 2 AS qty2,
  CAST(l_quantity AS DOUBLE) * 2 + 1 AS qty2p
FROM lineitem
""")
def engine_col_apply(spark, sf_dir):
    """R7 col_apply through both fast paths: a Column expression
    (JVM-side, preferred) then a vectorized pandas UDF (Arrow-batched)
    chained on its output. Exact arithmetic (x*2, +1 on clean 2-dp
    doubles) keeps both engines bit-equal."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    eng = FrameEngine(li, indexcols=["l_orderkey", "l_linenumber"],
                      validate=False)
    eng = eng.col_apply(
        F.col("l_quantity").cast("double") * 2, "l_quantity",
        new_col_name="qty2",
    )
    eng = eng.col_apply(
        lambda s: s + 1, "qty2", new_col_name="qty2p",
        return_type="double", vectorized=True,
    )
    return eng.table


@query("engine_apply_rowwise", oracle="""
SELECT p_partkey, p_retailprice, p_size,
  p_retailprice * p_size AS size_value
FROM part
""")
def engine_apply_rowwise(spark, sf_dir):
    """R8 apply: row-wise multi-column Python UDF, mixing a positional
    column arg with the map_kws path (the reference's documented contract;
    its own map_kws is broken by the _substitue_col typo, frame.py:793).
    Row-at-a-time Python is the declared slow path — bounded table."""
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    eng = FrameEngine(part, indexcols=["p_partkey"], validate=False)
    out = eng.apply(
        lambda price, size: price * size,
        "size_value", "p_retailprice",
        return_type="double",
        map_kws={"size": "p_size"},
    )
    return out.table


@query("engine_project_ops", oracle="""
SELECT c_custkey, c_acctbal AS bal FROM customer
""")
def engine_project_ops(spark, sf_dir):
    """R6 __getitem__ projection + R10 rename + R9 drop, chained: select
    two data columns, rename one, drop the other — index columns ride
    along untouched."""
    cust = load(spark, sf_dir, "customer")
    eng = FrameEngine(cust, indexcols=["c_custkey"], validate=False)
    projected = eng[["c_acctbal", "c_mktsegment"]]
    renamed = projected.rename(c_acctbal="bal")
    dropped = renamed.drop("c_mktsegment")
    return dropped.table


@query("engine_puffy_to_long_shortcut", oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT vec_id,
  CAST(unnest(range(0, len(v))) AS INT) AS embedding_level0,
  unnest(v) AS embedding
FROM e
""")
def engine_puffy_to_long_shortcut(spark, sf_dir):
    """R13 puffy_to_long: the one-call module-level shortcut (reference
    shortcuts.py) — construct + to_long without touching FrameEngine."""
    from ..shortcuts import puffy_to_long

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return puffy_to_long(emb, "embedding", indexcols=["vec_id"])


@query("engine_sanitize", oracle="""
SELECT p_partkey,
  CAST(p_retailprice AS DOUBLE) AS retail_price,
  CAST(p_size AS DOUBLE) AS size_PERCENT_,
  CAST(p_size AS DOUBLE) AS _2size
FROM part
""")
def engine_sanitize(spark, sf_dir):
    """R18 identifier sanitation: columns named with spaces, illegal
    characters, and leading digits are coerced to valid identifiers by
    the reference's spelled-out replacement table (space -> _,
    '%' -> _PERCENT_, leading digit -> '_' prefix)."""
    part = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("retail price"),
        F.col("p_size").cast("double").alias("size%"),
        F.col("p_size").cast("double").alias("2size"),
    )
    eng = FrameEngine(
        part, indexcols=["p_partkey"], validate=False,
        enforce_identifier_string=True,
    )
    return eng.table


@query("engine_aggfunc_dispatch", oracle="""
SELECT l_orderkey,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS l_quantity
FROM lineitem GROUP BY l_orderkey
""")
def engine_aggfunc_dispatch(spark, sf_dir):
    """R14 CallableContainer through to_puffy's aggfunc seam: the
    container's registered Column->Column callable is dispatched for the
    aggregation (exact decimal sum, cast at the end)."""
    from ..dispatch import CallableContainer
    from pyspark.sql import Column

    container = CallableContainer(
        lambda c: F.sum(c.cast("decimal(12,2)")).cast("double")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    eng = FrameEngine(li, indexcols=["l_orderkey", "l_linenumber"],
                      validate=False)
    out = eng.to_puffy("l_orderkey", aggfunc=container)
    return out.table.select("l_orderkey", "l_quantity")


@query("engine_to_long_structs", oracle="""
SELECT l_orderkey, l_linenumber, CAST(lvl AS INT) AS charges_level0,
  CASE lvl WHEN 0 THEN CAST(l_quantity AS DOUBLE)
           ELSE CAST(l_quantity AS DOUBLE) * 2 END AS charges_q,
  CASE lvl WHEN 0 THEN CAST(l_discount AS DOUBLE)
           ELSE CAST(l_tax AS DOUBLE) END AS charges_d
FROM lineitem CROSS JOIN (VALUES (0), (1)) t(lvl)
""")
def engine_to_long_structs(spark, sf_dir):
    """R5-inside-R2: ``to_long`` over an array-of-struct datacol ends in
    FLAT columns — posexplode inlines the array (level column) and field
    projection flattens the struct to ``{col}_{field}`` scalars (reference
    frame.py:489-503, tutorial cell 24). All-exact values (2-dp decimals
    cast to double, *2) keep both engines bit-equal."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.array(
            F.struct(
                F.col("l_quantity").cast("double").alias("q"),
                F.col("l_discount").cast("double").alias("d"),
            ),
            F.struct(
                (F.col("l_quantity") * 2).cast("double").alias("q"),
                F.col("l_tax").cast("double").alias("d"),
            ),
        ).alias("charges"),
    )
    eng = FrameEngine(li, indexcols=["l_orderkey", "l_linenumber"],
                      validate=False)
    return eng.to_long("charges", expand_cols=["charges"])
