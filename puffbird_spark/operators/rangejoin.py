"""Binned range join: a pure interval join (NO equi key) as an equi-join
on bin ids.

Without an equality conjunct Spark plans a range join as
BroadcastNestedLoopJoin — O(|points| x |intervals|) comparisons, the
canonical scale-killer. Binning converts it: every interval replicates to
the bins it overlaps, every point hashes to its single bin, and the join
becomes one shuffle on the bin id plus an exact post-filter. Each matching
(point, interval) pair meets in EXACTLY one bin (the point's), so no
dedup pass is needed. Replication factor = interval_width / bin_width + 1,
so pick ``bin_width`` near the typical interval width: total cost is
O(points + intervals * avg_bins + matches) — linear, shuffle-partitioned,
AQE-skew-splittable, instead of a nested loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Inner join of ``points`` to ``intervals`` where
    ``lo_col <= point_col <= hi_col``, with no equality key.

    Returns all columns of both inputs. Intervals with ``lo > hi`` or
    NULL bounds match nothing (as in the naive formulation).
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")

    def to_bin(c: Column) -> Column:
        return F.floor(c.cast("double") / F.lit(float(bin_width)))

    p = points.withColumn("__bin", to_bin(F.col(point_col)))
    i = (
        intervals.filter(
            F.col(lo_col).isNotNull()
            & F.col(hi_col).isNotNull()
            & (F.col(lo_col) <= F.col(hi_col))
        )
        .withColumn(
            "__bin",
            F.explode(F.sequence(to_bin(F.col(lo_col)), to_bin(F.col(hi_col)))),
        )
    )
    return (
        p.join(i, "__bin")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bin")
    )


def binned_interval_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bin_width: float,
) -> DataFrame:
    """Interval-OVERLAP join (``l_lo <= r_hi AND r_lo <= l_hi``) with
    no equality key — the two-sided sibling of :func:`binned_range_join`
    (downtime windows x sessions, promotions x visits). Spark would plan
    the bare inequality as BroadcastNestedLoopJoin; both sides bin
    instead, and each overlapping pair is emitted in EXACTLY ONE bin —
    the bin of ``greatest(l_lo, r_lo)`` (the overlap start), which both
    intervals provably cover — so the equi-join on the bin id needs an
    exact post-filter but never a dedup pass. Cost is
    O(|L|·bins_L + |R|·bins_R + matches), one shuffle on the bin id,
    AQE-skew-splittable. Rows with NULL or inverted bounds match
    nothing. Returns all columns of both inputs."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")

    def to_bin(c):
        return F.floor(c.cast("double") / F.lit(float(bin_width)))

    def valid(lo, hi):
        return (F.col(lo).isNotNull() & F.col(hi).isNotNull()
                & (F.col(lo) <= F.col(hi)))

    l = left.filter(valid(l_lo, l_hi)).withColumn(
        "__bin", F.explode(
            F.sequence(to_bin(F.col(l_lo)), to_bin(F.col(l_hi)))))
    r = right.filter(valid(r_lo, r_hi)).withColumn(
        "__bin", F.explode(
            F.sequence(to_bin(F.col(r_lo)), to_bin(F.col(r_hi)))))
    return (
        l.join(r, "__bin")
        .filter(
            (F.col(l_lo) <= F.col(r_hi)) & (F.col(r_lo) <= F.col(l_hi))
            # exactly-one-bin fence: only the overlap-start bin emits
            & (F.col("__bin")
               == to_bin(F.greatest(F.col(l_lo), F.col(r_lo))))
        )
        .drop("__bin")
    )
