"""Merge/upsert (the lakehouse MERGE INTO shape) as a pure DataFrame
operator: apply a batch of updates to a target by key — update matched
rows, insert unmatched ones, optionally delete flagged ones.

Scale design — two modes:

- ``broadcast_updates=True`` (default, the CDC-batch case): Spark cannot
  broadcast ANY side of a full-outer join (it falls back to a sort-merge
  join that shuffles the whole target), so the merge decomposes into
  broadcast-able passes: (1) target LEFT JOIN updates — a broadcast hash
  join, zero target shuffle — handles matched-update and matched-delete;
  (2) inserts are update keys absent from the target, found with a
  broadcast LEFT SEMI against the target (small output) and a tiny
  anti-join on the updates side. The target is scanned twice but
  shuffled NEVER — at 100 TB two scans beat one full-table shuffle by a
  wide margin.
- ``broadcast_updates=False`` (updates comparable to the target): one
  full-outer join; both sides shuffle once on the key.

Column reconciliation is per-column ``coalesce(update, target)`` — pure
projections, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
    broadcast_updates: bool = True,
    on_duplicate: str = "error",
    version_col: str | None = None,
) -> DataFrame:
    """MERGE semantics: rows in ``updates`` override matching ``target``
    rows (matched-update), unmatched update rows are inserted, and — when
    ``delete_col`` names a boolean column on the updates side — matched
    rows flagged true are dropped (matched-delete; deleting a nonexistent
    row is a no-op).

    Update rows may carry a subset of the target's value columns; omitted
    columns keep the target's value (inserts get NULL there). Extra
    update-only columns are rejected (they would silently widen the
    target schema).

    Reconciliation is ``coalesce(update, target)`` per column, so a NULL
    in an update row means "keep the target's value" — to actually null a
    field, route it through ``delete_col`` + re-insert (SQL MERGE's
    overwrite-with-NULL is not expressible without per-column presence
    flags, which would double the update schema).

    Duplicate update keys (a CDC batch with several changes to one key)
    would fan matched target rows out through the join — the classic
    silent MERGE corruption. ``on_duplicate`` controls it (ADVICE r2):

    - ``"error"`` (default): raise ``ValueError`` when any key appears
      more than once in ``updates`` — SQL MERGE's "multiple source rows
      matched" error. Costs one aggregate job over the (small) updates
      side before planning the merge.
    - ``"last_wins"``: deterministically reduce updates to one row per
      key first: highest ``version_col`` wins (required), remaining value
      columns as descending tie-breakers so equal versions still resolve
      deterministically.
    - ``"allow"``: skip the check (caller guarantees uniqueness; zero
      extra work).

    NULL update keys never equi-join to the target, so a null-key update
    row is NOT MATCHED and inserts — the same outcome SQL MERGE gives a
    null source key.
    """
    if not keys:
        raise ValueError("merge_upsert: keys must be non-empty — a "
                         "keyless MERGE has no match semantics")
    if on_duplicate not in ("error", "last_wins", "allow"):
        raise ValueError(f"on_duplicate: {on_duplicate!r} not in error/last_wins/allow")
    if on_duplicate == "last_wins":
        if version_col is None:
            raise ValueError("on_duplicate='last_wins' requires version_col")
        tiebreak = [F.col(c).desc_nulls_last() for c in updates.columns
                    if c not in keys and c != version_col]
        w = Window.partitionBy(*keys).orderBy(
            F.col(version_col).desc_nulls_last(), *tiebreak
        )
        updates = (
            updates.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn")
        )
        if version_col not in target.columns:
            # CDC metadata column, not part of the merge payload
            updates = updates.drop(version_col)
    elif on_duplicate == "error":
        dup = (
            updates.groupBy(*keys).count()
            .filter(F.col("count") > 1).limit(1).collect()
        )
        if dup:
            key_repr = {k: dup[0][k] for k in keys}
            raise ValueError(
                f"updates contain duplicate key {key_repr} "
                "(SQL MERGE: multiple source rows matched); pass "
                "on_duplicate='last_wins' with version_col, or 'allow'"
            )
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

    def reconciled(cols_source: list[str]) -> list:
        out = []
        for c in cols_source:
            if c in keys:
                out.append(F.col(c))
            elif c in upd_value_cols:
                out.append(F.coalesce(F.col("__u_" + c), F.col(c)).alias(c))
            else:
                out.append(F.col(c))
        return out

    if not broadcast_updates:
        joined = target.join(u, on=keys, how="full_outer")
        return (
            joined.filter(~F.coalesce(F.col("__del"), F.lit(False)))
            .select(*reconciled(target.columns))
        )

    u_b = F.broadcast(u)
    # pass 1 — matched-update / matched-delete: broadcast hash join,
    # the target side is scanned in place, never shuffled
    updated = (
        target.join(u_b, on=keys, how="left")
        .filter(~F.coalesce(F.col("__del"), F.lit(False)))
        .select(*reconciled(target.columns))
    )
    # pass 2 — inserts: update keys absent from the target. The semi join
    # broadcasts the updates onto a second target scan; its OUTPUT is at
    # most |updates| rows, so the anti join below is tiny-vs-tiny.
    matched_keys = target.join(
        u_b.select(*keys), on=keys, how="left_semi"
    ).select(*keys).distinct()
    inserts_src = u.join(F.broadcast(matched_keys), on=keys, how="left_anti")
    insert_cols = []
    for c in target.columns:
        if c in keys:
            insert_cols.append(F.col(c))
        elif c in upd_value_cols:
            insert_cols.append(F.col("__u_" + c).alias(c))
        else:
            insert_cols.append(F.lit(None).cast(
                target.schema[c].dataType
            ).alias(c))
    inserts = inserts_src.filter(~F.col("__del")).select(*insert_cols)
    return updated.unionByName(inserts)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    eff_col: str = "effective_ts",
) -> DataFrame:
    """Apply a change batch to a Type-2 slowly-changing dimension
    (Kimball SCD2 — the maintenance twin of the read-side
    :func:`~puffbird_spark.operators.asof.scd2_join`): for each key in
    ``updates`` whose attributes DIFFER from its current row, the
    current row closes (``valid_to = effective_ts``) and a new current
    row opens at ``effective_ts``; no-op updates (identical attributes,
    null-safe compare) leave the dimension untouched; updates for
    unknown keys insert a fresh current row. History rows
    (``valid_to IS NOT NULL``) pass through untouched by construction.

    One update per key per batch (enforced — raise on duplicates:
    applying two changes to one key in one batch has no well-defined
    order). Batches must also arrive in EFFECTIVE-TIME ORDER per key
    (enforced — raise): a change whose ``effective_ts`` is at or before
    the current row's ``valid_from`` would close that row with an
    inverted/zero-length interval AND open an overlapping current row —
    silent dimension corruption that the read-side ``scd2_join`` then
    resolves to the WRONG attribute for every timestamp in the overlap
    (found by the r11 adversarial CDC probe). A NULL ``effective_ts``
    likewise raises instead of silently dropping the change. Plan
    shape: the dimension's CURRENT slice left-joins the
    (broadcast-able) update batch on the key — history never joins
    anything; at 100 TB partition the dimension table by ``to_col IS
    NULL`` (the snapshot/manifest layout of `operators/layout.py`)
    so maintenance scans only the current slice. Both enforcement
    probes are ``limit(1)`` early-exit jobs (one over the small batch,
    one over the current-slice broadcast join)."""
    keys = list(key_cols)
    attrs = list(attr_cols)
    if not keys:
        raise ValueError("scd2_apply: key_cols must be non-empty — a "
                         "keyless dimension has no identity to track")
    dup = (updates.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
           .filter(F.col("n") > 1).limit(1).collect())
    if dup:
        raise ValueError(
            f"scd2_apply: multiple updates for key {dup[0][:len(keys)]} "
            "in one batch — apply batches per effective time instead")
    null_eff = updates.filter(F.col(eff_col).isNull()).limit(1).collect()
    if null_eff:
        raise ValueError(
            "scd2_apply: update with NULL effective_ts for key "
            f"{[null_eff[0][k] for k in keys]} — a change without an "
            "effective time cannot open or close a validity interval")
    hist = dim.filter(F.col(to_col).isNotNull())
    cur = dim.filter(F.col(to_col).isNull())
    u = updates.select(
        *keys,
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.col(eff_col).alias("__eff"))
    j = cur.join(F.broadcast(u), keys, "full_outer")
    changed = F.col("__eff").isNotNull() & F.col(from_col).isNotNull() & (
        ~F.struct(*[F.col(a) for a in attrs]).eqNullSafe(
            F.struct(*[F.col(f"__u_{a}").alias(a) for a in attrs])))
    inserted = F.col("__eff").isNotNull() & F.col(from_col).isNull()
    late = j.filter(changed & (F.col("__eff") <= F.col(from_col))) \
        .limit(1).collect()
    if late:
        raise ValueError(
            "scd2_apply: out-of-order change for key "
            f"{[late[0][k] for k in keys]} — effective_ts "
            f"{late[0]['__eff']!r} is at or before the current row's "
            f"{from_col} {late[0][from_col]!r}; closing it would write "
            "an inverted/zero-length interval overlapping the new "
            "current row. Apply CDC batches in effective-time order")
    untouched = j.filter(~changed & ~inserted & F.col(from_col).isNotNull()) \
        .select(*keys, *attrs, from_col, to_col)
    closed = j.filter(changed).select(
        *keys, *attrs, from_col, F.col("__eff").alias(to_col))
    opened = j.filter(changed | inserted).select(
        *keys,
        *[F.col(f"__u_{a}").alias(a) for a in attrs],
        F.col("__eff").alias(from_col),
        F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col))
    return hist.select(*keys, *attrs, from_col, to_col) \
        .unionByName(untouched).unionByName(closed).unionByName(opened)
