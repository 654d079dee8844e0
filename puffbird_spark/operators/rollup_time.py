"""Hypertable-style time rollups: one pass producing aggregates at several
time granularities (the continuous-aggregate pattern of time-series stores,
re-expressed declaratively).

Plan shape: the input is scanned ONCE; a generator explodes each row into
its (granularity, bucket_start) memberships, then a single hash aggregation
groups by (granularity, bucket, keys...). At scale this beats running one
groupBy per granularity — N rollups cost one scan + one shuffle instead of
N of each, and partial aggregation still applies map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import PuffbirdSparkError

#: supported granularities -> date_trunc unit
GRANULARITIES = {
    "minute": "minute",
    "hour": "hour",
    "day": "day",
    "week": "week",
    "month": "month",
}


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    aggs: dict[str, Column],
    granularities: list[str] = ("hour", "day"),
) -> DataFrame:
    """Aggregate ``df`` at each granularity in one scan + one shuffle.

    Output columns: ``granularity`` (string), ``bucket_start`` (timestamp),
    ``keys...``, one column per ``aggs`` entry (name -> aggregate Column).
    """
    bad = [g for g in granularities if g not in GRANULARITIES]
    if bad:
        raise PuffbirdSparkError(
            f"unsupported granularities {bad}; supported: {sorted(GRANULARITIES)}"
        )
    memberships = F.array(*[
        F.struct(
            F.lit(g).alias("granularity"),
            F.date_trunc(GRANULARITIES[g], F.col(ts_col)).alias("bucket_start"),
        )
        for g in granularities
    ])
    exploded = df.withColumn("__g", F.explode(memberships)).select(
        F.col("__g.granularity").alias("granularity"),
        F.col("__g.bucket_start").alias("bucket_start"),
        *df.columns,
    )
    return (
        exploded.groupBy("granularity", "bucket_start", *keys)
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )


def incremental_rollup(
    existing: DataFrame,
    delta: DataFrame,
    ts_col: str,
    keys: list[str],
    partials: dict[str, tuple],
    granularities: list[str] = ("hour", "day"),
) -> DataFrame:
    """Continuous-aggregate refresh: fold a new batch of raw events into an
    already-materialized rollup WITHOUT rescanning history.

    ``partials`` maps output name -> (partial_expr, merge_expr) exactly as
    :func:`puffbird_spark.operators.skew.salted_agg`: ``partial_expr()``
    aggregates raw delta rows; ``merge_expr(col)`` combines a partial with
    the existing rollup's stored value. Only ALGEBRAIC aggregates merge
    this way (sum/count/min/max; avg = stored sum + count, derived at read
    time).

    Scale shape: the delta is rolled up in one scan + one shuffle
    (:func:`hypertable_rollup`), then the union with the EXISTING rollup
    shuffles rollup-sized data only — a 100 TB event history never moves;
    each refresh costs O(delta) + O(touched rollup rows).

    Caller contract (probe batch 10): folding is NOT idempotent — the
    same delta folded twice double-counts every algebraic partial.
    At-least-once upstreams must dedup deltas by epoch before folding
    (the ``snapshot_epoch_sink`` manifest ledger is the shipped way).
    Out-of-order deltas are fine: buckets merge by key regardless of
    arrival order.
    """
    delta_rollup = hypertable_rollup(
        delta, ts_col, keys,
        {name: p() for name, (p, _) in partials.items()},
        granularities,
    )
    return (
        existing.unionByName(delta_rollup)
        .groupBy("granularity", "bucket_start", *keys)
        .agg(*[m(name).alias(name) for name, (_, m) in partials.items()])
    )
