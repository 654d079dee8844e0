"""Explode family, pivot/unpivot, and the FrameEngine flagship round-trip
(SURVEY §2.1 R2/R11/R12 exercised on the relational testdata, §2.2 explode /
pivot rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..engine import FrameEngine
from .base import dec, load, query


@query("explode_tokens", oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE lang = 'en')
SELECT doc_id,
       CAST(unnest(range(0, len(toks))) AS INT) AS pos,
       unnest(toks) AS token
FROM t
""")
def explode_tokens(spark, sf_dir):
    """posexplode: tokenized documents to (doc, position, token) rows.
    Generators pipeline inside whole-stage codegen — no shuffle."""
    docs = load(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    )


@query("engine_to_long_roundtrip", oracle="""
SELECT l_orderkey,
  CAST(row_number() OVER (PARTITION BY l_orderkey
                          ORDER BY l_linenumber, l_quantity) - 1
       AS INT) AS l_quantity_level0,
  l_quantity
FROM lineitem
""")
def engine_to_long_roundtrip(spark, sf_dir):
    """FLAGSHIP: the puffy-table engine on relational data. Nest lineitem
    quantities per order (to_puffy, ordered by linenumber), then explode
    back out (to_long) — positions must reproduce the linenumber order.
    Exercises R1 construction, R11 order-preserving nest, R2/R3 explode."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    eng = FrameEngine(li, indexcols=["l_orderkey", "l_linenumber"], validate=False)
    puffy = eng.to_puffy("l_orderkey", sort_by=["l_linenumber"])
    return puffy.to_long("l_quantity")


@query("engine_to_long_shared_axes", oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
axes AS (SELECT g, pos FROM (SELECT unnest(range(2)) AS g)
         CROSS JOIN (SELECT unnest(range(4)) AS pos))
SELECT e.vec_id,
       CAST(axes.g AS INT) AS g, CAST(axes.pos AS INT) AS pos,
       v[4 * g + pos + 1] AS a, v[8 + 4 * g + pos + 1] AS b
FROM e CROSS JOIN axes
""")
def engine_to_long_shared_axes(spark, sf_dir):
    """R4 shared axes through the FUSED chain: two array<array<double>>
    columns aligned at both depths explode with in-chain positional zips
    (zero joins, zero shuffles before the sink) — the reference's
    positional full-outer merge (frame.py:531) without the merge."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    df = emb.select(
        "vec_id",
        F.array(F.slice(v, 1, 4), F.slice(v, 5, 4)).alias("a"),
        F.array(F.slice(v, 9, 4), F.slice(v, 13, 4)).alias("b"),
    )
    eng = FrameEngine(df, indexcols=["vec_id"])
    return eng.to_long("a", "b", g={"a": 0, "b": 0}, pos={"a": 1, "b": 1})


@query("pivot_returnflag", oracle="""
SELECT l_linestatus,
  CAST(SUM(CASE WHEN l_returnflag = 'A'
       THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS "A",
  CAST(SUM(CASE WHEN l_returnflag = 'N'
       THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS "N",
  CAST(SUM(CASE WHEN l_returnflag = 'R'
       THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS "R"
FROM lineitem GROUP BY l_linestatus
""")
def pivot_returnflag(spark, sf_dir):
    """Pivot with explicit value list — skips Spark's extra distinct-values
    job AND keeps the output schema static (what you want on a cluster)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
    )


@query("unpivot_part", oracle="""
SELECT p_partkey, metric, val FROM (
  SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size,
         p_retailprice FROM part) t
UNPIVOT (val FOR metric IN (p_size, p_retailprice))
""")
def unpivot_part(spark, sf_dir):
    part = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    )
    return part.unpivot(
        ["p_partkey"], ["p_size", "p_retailprice"], "metric", "val"
    )


@query("multid_pivot_acctbal", oracle="""
SELECT n_name,
  CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
       THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE)
       / COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END)
    AS "AUTOMOBILE",
  CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING'
       THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE)
       / COUNT(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END)
    AS "BUILDING",
  CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE'
       THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE)
       / COUNT(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 END)
    AS "FURNITURE",
  CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD'
       THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE)
       / COUNT(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 END)
    AS "HOUSEHOLD",
  CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY'
       THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE)
       / COUNT(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END)
    AS "MACHINERY"
FROM customer
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""")
def multid_pivot_acctbal(spark, sf_dir):
    """R12 multid_pivot on real data: mean acctbal by nation x segment.

    The engine mean is exact-decimal-sum / count — bit-equal doubles on
    both engines, so NO rounding is applied (rounding doubles is itself
    engine-divergent: Spark rounds the shortest decimal repr, DuckDB the
    binary value)."""
    cust = load(spark, sf_dir, "customer")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    joined = cust.join(nation, cust.c_nationkey == nation.n_nationkey).select(
        "n_name", "c_mktsegment", dec("c_acctbal").alias("bal")
    )
    eng = FrameEngine(joined, indexcols=[], validate=False)
    return eng.multid_pivot("bal", "n_name", "c_mktsegment")


@query("explode_inline_stack", oracle="""
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
  FROM lineitem WHERE l_orderkey <= 2000)
SELECT l_orderkey, l_linenumber, 'qty' AS metric,
       CAST(l_quantity AS DOUBLE) AS val
FROM li
UNION ALL
SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM li
""")
def explode_inline_stack(spark, sf_dir):
    """stack(): widen-to-rows without a shuffle (the generator sibling of
    unpivot) — 2 metric rows per lineitem, pipelined in codegen."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") <= 2000
    ).select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").cast("double").alias("q"),
        F.col("l_extendedprice").alias("p"),
    )
    return li.select(
        "l_orderkey", "l_linenumber",
        F.expr("stack(2, 'qty', q, 'price', p)").alias("metric", "val"),
    )


@query("explode_inline", oracle="""
WITH n AS (
  SELECT l_orderkey,
         list(struct_pack(ln := l_linenumber, qty := l_quantity)
              ORDER BY l_linenumber) AS items
  FROM lineitem GROUP BY l_orderkey)
SELECT l_orderkey, unnest(items, recursive := true)
FROM n
""")
def explode_inline(spark, sf_dir):
    """inline(): explode an array<struct> into columns directly — the
    one-step form of expand_col's posexplode + star-expansion."""
    li = load(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct(
                F.col("l_linenumber").alias("ln"),
                F.col("l_quantity").alias("qty"),
            ))
        ).alias("items")
    )
    return nested.select("l_orderkey", F.inline("items"))


@query("engine_to_long_fold_exact", oracle="""
WITH f1 AS (SELECT doc_id, CAST(unnest(range(0, doc_id % 4)) AS INT) AS ax1
            FROM documents),
fa AS (SELECT doc_id, ax1, CAST(doc_id * 7 + ax1 AS BIGINT) AS a FROM f1),
f2 AS (SELECT doc_id, CAST(unnest(range(0, doc_id % 3)) AS INT) AS ax2
       FROM documents),
fc AS (SELECT doc_id, ax2, CAST(doc_id * 13 + ax2 AS BIGINT) AS c FROM f2),
f3 AS (SELECT doc_id, CAST(unnest(range(0, doc_id % 5)) AS INT) AS ax1
       FROM documents),
fb AS (SELECT doc_id, ax1, CAST(doc_id * 11 + ax1 AS BIGINT) AS b FROM f3),
f4 AS (SELECT doc_id, CAST(unnest(range(0, (doc_id + 1) % 4)) AS INT) AS ax2
       FROM documents),
fd AS (SELECT doc_id, ax2, CAST(doc_id * 17 + ax2 AS BIGINT) AS d FROM f4),
j1 AS (SELECT * FROM fa FULL JOIN fc USING (doc_id)),
j2 AS (SELECT * FROM j1 FULL JOIN fb USING (doc_id, ax1)),
j3 AS (SELECT * FROM j2 FULL JOIN fd USING (doc_id, ax2))
SELECT doc_id, ax1, ax2, a, b, c, d FROM j3
""")
def engine_to_long_fold_exact(spark, sf_dir):
    """R2/R4 fold-exact fusion (round 8, explode.py
    ``explode_fold_exact``): TWO disjoint shared-axis groups ({a,b} on
    ax1, {c,d} on ax2) INTERLEAVED in the column order (a, c, b, d) —
    the configuration whose order-dependent fold semantics (standalone
    once-per-key rows for member-only positions, multiplied only by
    later-folding frames) the round-8 machinery compiles to generators
    with zero joins/shuffles. The oracle replicates the fold literally:
    per-column frames full-outer-joined in column order on
    (key [, axis]) — any multiplicity error in the led/standalone
    split, the creator masking, or the main-lineage suppression breaks
    the hash. Ragged lengths incl. empty frames (doc_id multiples of
    12 empty BOTH leaders) exercise every branch."""
    docs = load(spark, sf_dir, "documents").select("doc_id")

    def arr(mult: int, modulus: int, shift: int = 0):
        n = (F.col("doc_id") + shift) % modulus
        seq = F.transform(
            F.sequence(F.lit(0), (n - 1).cast("int")),
            lambda i: F.col("doc_id") * mult + i.cast("bigint"))
        return F.when(n > 0, seq).otherwise(
            F.array().cast("array<bigint>"))

    df = docs.select(
        "doc_id",
        arr(7, 4).alias("a"), arr(11, 5).alias("b"),
        arr(13, 3).alias("c"), arr(17, 4, shift=1).alias("d"),
    )
    eng = FrameEngine(df, indexcols=["doc_id"], validate=False)
    return eng.to_long(
        "a", "c", "b", "d",
        ax1={"a": 0, "b": 0}, ax2={"c": 0, "d": 0})
