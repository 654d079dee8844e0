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
