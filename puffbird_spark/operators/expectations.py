"""Sink-side data-quality expectations — validate rows against named
predicate rules at write time, quarantine the failures, and emit a
per-rule violation scorecard (the Delta Live Tables "expectations" /
Great-Expectations-at-the-sink pattern; the reference engine has no
write path at all, so this is EXT lakehouse scope).

Scale shape: ONE pass computes every rule as a boolean column (all
scan-local codegen — rules are Column predicates, never Python), the
pass/fail split is two filters over the same evaluated frame (Catalyst
collapses the rule projection into both branches; no shuffle), and the
scorecard is one global aggregation of the boolean columns (map-side
partial sums — counts, never rows, reach the driver). Quarantined rows
carry a ``__violations`` array naming every failed rule, so the
dead-letter table is actionable, not just a reject pile."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_expectations(
    df: DataFrame,
    rules: dict[str, Column],
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Evaluate named expectation ``rules`` (name -> boolean Column;
    NULL counts as a violation, the SQL-constraint convention) and
    return ``(passed, quarantined, scorecard)``:

    - ``passed`` — rows satisfying EVERY rule, original schema;
    - ``quarantined`` — the rest, plus ``__violations``
      (array<string> of failed rule names, name-sorted);
    - ``scorecard`` — one row per rule: evaluated count, violation
      count, 6-dp violation rate, plus a ``__total`` row for the
      all-rules row status.

    All three derive from one rule-evaluation projection; nothing
    re-evaluates rules per consumer."""
    if not rules:
        raise ValueError("need at least one expectation rule")
    names = sorted(rules)
    evaluated = df.select(
        "*",
        *[F.coalesce(rules[n].cast("boolean"), F.lit(False))
          .alias(f"__ok_{i}") for i, n in enumerate(names)],
    )
    ok_cols = [F.col(f"__ok_{i}") for i in range(len(names))]
    all_ok = ok_cols[0]
    for c in ok_cols[1:]:
        all_ok = all_ok & c
    passed = evaluated.filter(all_ok).drop(
        *[f"__ok_{i}" for i in range(len(names))])
    quarantined = (
        evaluated.filter(~all_ok)
        .select(
            "*",
            F.array_compact(F.array(*[
                F.when(~F.col(f"__ok_{i}"), F.lit(n))
                for i, n in enumerate(names)])).alias("__violations"))
        .drop(*[f"__ok_{i}" for i in range(len(names))])
    )
    agg_cols = []
    for i, n in enumerate(names):
        agg_cols.append(
            F.sum(F.when(~F.col(f"__ok_{i}"), 1).otherwise(0))
            .alias(f"__v_{i}"))
    scorecard_wide = evaluated.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.when(~all_ok, 1).otherwise(0)).alias("__vt"),
        *agg_cols)
    # empty input (a realistic empty delta): sums over zero rows are
    # NULL, but "zero rows had zero violations" — coalesce the counts
    # and leave the RATE NULL (0/0 is undefined, not 0%) (probe b10)
    def _vcount(c):
        return F.coalesce(c, F.lit(0)).cast("long")

    def _vrate(c):
        return F.when(
            F.col("__n") > 0, F.round(c / F.col("__n"), 6))

    rows = [
        F.struct(
            F.lit(n).alias("rule"),
            F.col("__n").cast("long").alias("n_rows"),
            _vcount(F.col(f"__v_{i}")).alias("n_violations"),
            _vrate(F.col(f"__v_{i}")).alias("violation_rate"))
        for i, n in enumerate(names)
    ]
    rows.append(F.struct(
        F.lit("__total").alias("rule"),
        F.col("__n").cast("long").alias("n_rows"),
        _vcount(F.col("__vt")).alias("n_violations"),
        _vrate(F.col("__vt")).alias("violation_rate")))
    scorecard = scorecard_wide.select(
        F.explode(F.array(*rows)).alias("r")).select("r.*")
    return passed, quarantined, scorecard
