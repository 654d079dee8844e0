"""Merge/upsert (the lakehouse MERGE INTO shape) as a pure DataFrame
operator: apply a batch of updates to a target by key — update matched
rows, insert unmatched ones, optionally delete flagged ones.

Scale design: ONE full-outer join on the merge keys is the whole
operation. The updates side is usually a small CDC batch — broadcast it
(``broadcast_updates=True``, default) and the target is never shuffled at
all; with a big updates side both sides shuffle once on the key. Column
reconciliation is per-column ``coalesce(update, target)``, so the plan
stays pure projections over the join — no UDFs, no row comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
    broadcast_updates: bool = True,
) -> DataFrame:
    """MERGE semantics: rows in ``updates`` override matching ``target``
    rows (matched-update), unmatched update rows are inserted, and — when
    ``delete_col`` names a boolean column on the updates side — matched
    rows flagged true are dropped (matched-delete).

    Update rows may carry a subset of the target's value columns; omitted
    columns keep the target's value. Extra update-only columns are
    rejected (they would silently widen the target schema).

    Reconciliation is ``coalesce(update, target)`` per column, so a NULL
    in an update row means "keep the target's value" — to actually null a
    field, route it through ``delete_col`` + re-insert (SQL MERGE's
    overwrite-with-NULL is not expressible without per-column presence
    flags, which would double the update schema).
    """
    upd_value_cols = [c for c in updates.columns
                      if c not in keys and c != delete_col]
    stray = set(upd_value_cols) - set(target.columns)
    if stray:
        raise ValueError(
            f"update columns not in target: {sorted(stray)} "
            "(MERGE cannot widen the target schema)"
        )
    u = updates
    if delete_col is None:
        u = u.withColumn("__del", F.lit(False))
    else:
        u = u.withColumnRenamed(delete_col, "__del").withColumn(
            "__del", F.coalesce(F.col("__del"), F.lit(False))
        )
    # prefix update-side value columns so both versions survive the join
    for c in upd_value_cols:
        u = u.withColumnRenamed(c, "__u_" + c)
    u = u.select(*keys, *["__u_" + c for c in upd_value_cols], "__del")
    if broadcast_updates:
        u = F.broadcast(u)

    joined = target.join(u, on=keys, how="full_outer")
    merged_cols = []
    for c in target.columns:
        if c in keys:
            merged_cols.append(F.col(c))
        elif c in upd_value_cols:
            # matched-update / insert: update value wins when present
            merged_cols.append(
                F.coalesce(F.col("__u_" + c), F.col(c)).alias(c)
            )
        else:
            merged_cols.append(F.col(c))
    return (
        joined
        # matched-delete: drop rows whose update row is flagged
        .filter(~F.coalesce(F.col("__del"), F.lit(False)))
        .select(*merged_cols)
    )
