"""As-of join (nearest right row with ``right_ts <= left_ts`` per key).

The reference has no as-of join; this is EXT surface (SURVEY §2.2). Built as
a composition of existing DataFrame ops — the classic union-and-carry-forward
plan rather than a per-key nested loop:

1. tag left rows 1 / right rows 0 and union them,
2. one window sorted by ``(ts, tag, tiebreak)`` per key carries the most
   recent right row forward (``last(..., ignorenulls=True)``),
3. keep the left rows and unpack the carried right struct.

Scale: exactly ONE shuffle (the window partition by key), no matter how many
right rows match; skewed keys are split by AQE. This is the plan you want at
100 TB — a range-join + rank would shuffle twice and blow up on wide
windows. Right rows at the same timestamp resolve by ``tiebreak`` (largest
wins), keeping results deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..errors import PuffbirdSparkError


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tiebreak: str | None = None,
    strict: bool = False,
    direction: str = "backward",
    tolerance: float | int | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the columns of the matched
    right row per ``direction`` (pandas ``merge_asof`` parity):

    - ``"backward"`` (default): latest right with ``right_ts <= left_ts``
      (``<`` when ``strict``) — DuckDB ``ASOF LEFT JOIN`` semantics;
    - ``"forward"``: earliest right with ``right_ts >= left_ts``
      (``>`` when ``strict``) — the same union-and-carry plan over the
      REVERSED in-partition order, still one shuffle;
    - ``"nearest"``: whichever of the two is closer in time, ties to the
      backward match (pandas' rule). Two window passes share ONE
      exchange (same partition keys; the second direction adds an
      in-partition sort, not a shuffle).

    ``tolerance``: maximum allowed |left_ts - right_ts| — in SECONDS for
    timestamp columns, in the column's own units for numerics; a match
    farther than that nulls out (pandas parity). Same-timestamp ties
    resolve by ``tiebreak`` (largest wins, every direction —
    deterministic).

    ``right``'s non-key columns (including ``right_ts``) are appended to the
    left schema; unmatched left rows get NULLs (left-join semantics, matching
    DuckDB ``ASOF LEFT JOIN``).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise PuffbirdSparkError(
            f"direction must be backward|forward|nearest, got {direction!r}")
    if tolerance is not None and tolerance < 0:
        # deterministic but vacuous — |gap| <= negative matches nothing;
        # name the contract instead of silently returning all-unmatched
        # (probe batch 9)
        raise PuffbirdSparkError(
            f"tolerance must be >= 0, got {tolerance!r}")
    for k in on:
        if k not in left.columns or k not in right.columns:
            raise PuffbirdSparkError(f"as-of key {k!r} missing from a side")
    overlap = (set(right.columns) - set(on)) & set(left.columns)
    if overlap:
        raise PuffbirdSparkError(
            f"right columns {sorted(overlap)} collide with left; rename first"
        )

    # SQL equi-join key semantics (the DuckDB ``ASOF LEFT JOIN ON l.k =
    # r.k`` this operator's oracles declare): a NULL key matches
    # NOTHING. The union+window plan would otherwise group NULL keys
    # together and match them (window partitioning treats NULL as a
    # value), silently diverging from the join formulation on NULL-keyed
    # rows — so NULL-keyed right rows leave the carry stream (they can
    # be nobody's match) and NULL-keyed left rows emit unmatched, the
    # left-join convention.
    if on:
        null_key = None
        for k in on:
            c = F.col(k).isNull()
            null_key = c if null_key is None else (null_key | c)
        right = right.filter(~null_key)

    rval_cols = [c for c in right.columns if c not in on]
    rstruct = T.StructType([right.schema[c] for c in rval_cols])

    # Tiebreak keeps its NATIVE type — a silent cast-to-long would turn a
    # string id into NULL everywhere, degrading same-ts resolution to
    # nondeterminism. Non-orderable types fail loudly instead.
    if tiebreak is not None:
        if tiebreak not in right.columns:
            raise PuffbirdSparkError(f"tiebreak {tiebreak!r} not in right")
        tb_type = right.schema[tiebreak].dataType
        orderable = (T.NumericType, T.StringType, T.DateType,
                     T.TimestampType, T.TimestampNTZType, T.BooleanType)
        if not isinstance(tb_type, orderable):
            raise PuffbirdSparkError(
                f"tiebreak {tiebreak!r} has non-orderable type {tb_type}; "
                "use a numeric/string/temporal column"
            )
        tb = F.col(tiebreak)
    else:
        tb_type = T.LongType()
        tb = F.lit(0).cast("long")

    lhs = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.struct(*[F.col(c) for c in left.columns if c not in on]).alias("__lrow"),
        F.lit(None).cast(rstruct).alias("__rrow"),
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        tb.alias("__tb"),
        F.lit(None).cast(
            T.StructType([left.schema[c] for c in left.columns if c not in on])
        ).alias("__lrow"),
        F.struct(*[F.col(c) for c in rval_cols]).alias("__rrow"),
    )

    # strict (<): left rows must sort BEFORE right rows at equal ts so the
    # carried value excludes same-instant rights; inclusive (<=): after.
    left_tag, right_tag = (0, 1) if strict else (1, 0)
    union = lhs.withColumn("__tag", F.lit(left_tag)).unionByName(
        rhs.withColumn("__tag", F.lit(right_tag))
    )

    def carry(ascending: bool):
        # ascending=True: carry the latest right_ts <= left_ts (backward).
        # ascending=False: reversed stream — rights with larger ts come
        # first, so last-nonnull at a left row is the SMALLEST right_ts
        # >= left_ts (forward); tb stays ASC so at equal ts the largest
        # tiebreak is nearest to the left row in stream order and wins,
        # same rule as backward.
        # __tag stays ASC in both streams: with inclusive tags
        # (left=1, right=0) rights at equal ts precede the left row in
        # either direction's stream (visible); with strict tags
        # (left=0, right=1) the left row precedes them (hidden).
        order = (
            [F.col("__ts").asc(), F.col("__tag").asc(), F.col("__tb").asc()]
            if ascending else
            [F.col("__ts").desc(), F.col("__tag").asc(), F.col("__tb").asc()]
        )
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__rrow", ignorenulls=True).over(w)

    is_ts = isinstance(
        left.schema[left_ts].dataType,
        (T.TimestampType, T.TimestampNTZType, T.DateType))

    def gap(match_col):
        rts = match_col.getField(right_ts)
        if is_ts:
            return F.abs(
                F.unix_micros(F.col("__ts").cast("timestamp"))
                - F.unix_micros(rts.cast("timestamp"))) / 1_000_000.0
        return F.abs(F.col("__ts") - rts)

    def tol_filter(match_col):
        if tolerance is None:
            return match_col
        return F.when(gap(match_col) <= F.lit(tolerance), match_col)

    if direction == "backward":
        matched = union.withColumn("__m", carry(True))
    elif direction == "forward":
        matched = union.withColumn("__m", carry(False))
    else:  # nearest: both passes share the partition exchange
        matched = (
            union.withColumn("__mb", carry(True))
            .withColumn("__mf", carry(False))
            .withColumn(
                "__m",
                F.when(F.col("__mb").isNull(), F.col("__mf"))
                .when(F.col("__mf").isNull(), F.col("__mb"))
                # ties go backward (pandas' nearest rule)
                .when(gap(F.col("__mf")) < gap(F.col("__mb")), F.col("__mf"))
                .otherwise(F.col("__mb")),
            )
        )
    matched = matched.withColumn("__m", tol_filter(F.col("__m"))).filter(
        F.col("__tag") == F.lit(left_tag))
    out_cols = (
        [F.col(k) for k in on]
        + [F.col("__lrow").getField(c).alias(c)
           for c in left.columns if c not in on]
        + [F.col("__m").getField(c).alias(c) for c in rval_cols]
    )
    return matched.select(*out_cols)


def scd2_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) temporal join: each fact row
    picks the dimension VERSION whose validity interval
    ``[valid_from, valid_to)`` contains the fact's event time — how a
    warehouse enriches events with the attributes as they were THEN,
    not as they are now (the as-of join's explicit-interval sibling:
    as-of carries the latest-before version forward; SCD2 dimensions
    publish closed intervals and admit gaps).

    Scale shape: ONE equi-join on the dimension key with the interval
    predicate as a join-time filter — version count per key is
    dimension-history-sized (a few rows), so the join fans out by that
    small factor before filtering and never becomes a range/theta join.
    With half-open intervals and no overlaps (the SCD2 contract —
    violations surface as duplicated facts, which the gate's row count
    catches), each fact matches at most one version.
    """
    d = dim.select(
        F.col(key).alias("__k"),
        F.col(valid_from).alias("__vf"),
        F.col(valid_to).alias("__vt"),
        *[c for c in dim.columns if c not in (key, valid_from, valid_to)],
    )
    cond = (
        (fact[key] == d["__k"])
        & (fact[fact_ts] >= d["__vf"])
        & (fact[fact_ts] < d["__vt"])
    )
    return fact.join(d, cond, how).drop("__k", "__vf", "__vt")
