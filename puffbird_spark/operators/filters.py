"""Composable quality-filter pipeline with drop accounting — the audit
layer every production curation pipeline carries (Dolma, RedPajama,
FineWeb all publish per-rule removal rates): you never ship a filter
chain without knowing what each rule costs you.

A pipeline is an ordered list of ``(rule_name, keep_predicate)``. The
semantics are short-circuit: a document is attributed to the FIRST rule
it fails (the order-dependent number operators actually want — it tells
you what each rule removes *given everything before it*), alongside an
order-independent "fails this rule at all" count per rule.

Execution shape: the whole classification is ONE scan-local CASE chain
(``coalesce(when(...))``) plus conditional sums in a single global
aggregation — one pass over the corpus, a one-row result exploded into
the per-rule audit. No shuffle of documents at all; at 100 TB this
costs exactly one read. NULL predicates (e.g. a rule over NULL text)
count as failures — a filter that cannot evaluate must not silently
pass documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: audit row name for documents that pass every rule
KEPT = "__kept"


def _fail(pred: Column) -> Column:
    """A rule fails unless its keep-predicate is literally TRUE — NULL
    (unevaluable) fails."""
    return ~F.coalesce(pred, F.lit(False))


def apply_filters(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """The survivors: rows passing EVERY rule (scan-local, one filter)."""
    keep = F.lit(True)
    for _, pred in rules:
        keep = keep & ~_fail(pred)
    return df.filter(keep)


def filter_audit(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Per-rule drop accounting in ONE pass: returns
    ``(rule, n_first_fail, n_fail_any)`` with one row per rule plus the
    ``__kept`` row (``n_first_fail`` = survivors, ``n_fail_any`` = 0).
    ``sum(n_first_fail)`` over all rows == total documents, always —
    the audit is a partition of the corpus."""
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names in {names}")
    first_fail = F.coalesce(
        *[F.when(_fail(p), F.lit(n)) for n, p in rules], F.lit(KEPT)
    )
    aggs = [
        F.sum(F.when(F.col("__ff") == n, 1).otherwise(0))
        .cast("long").alias(f"__first_{i}")
        for i, n in enumerate(names)
    ] + [
        F.sum(F.when(_fail(p), 1).otherwise(0))
        .cast("long").alias(f"__any_{i}")
        for i, (_, p) in enumerate(rules)
    ] + [
        F.sum(F.when(F.col("__ff") == KEPT, 1).otherwise(0))
        .cast("long").alias("__kept_n")
    ]
    one = df.withColumn("__ff", first_fail).agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(n).alias("rule"),
                F.col(f"__first_{i}").alias("n_first_fail"),
                F.col(f"__any_{i}").alias("n_fail_any"),
            )
            for i, n in enumerate(names)
        ],
        F.struct(
            F.lit(KEPT).alias("rule"),
            F.col("__kept_n").alias("n_first_fail"),
            F.lit(0).cast("long").alias("n_fail_any"),
        ),
    )
    return one.select(F.explode(rows).alias("r")).select(
        "r.rule", "r.n_first_fail", "r.n_fail_any"
    )
