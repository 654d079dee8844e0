"""Native Count-Min Sketch as a DataFrame (SURVEY north star: sketches for
100 TB cardinalities; Spark 4 removed the JVM stat.countMinSketch from the
Python API, so this builds one declaratively).

The sketch IS a small DataFrame — (row, bucket, cnt) with depth*width cells
— produced by one explode + one aggregation over the data. Estimation joins
query values against it with the same hash family; the classic CMS
guarantee holds: estimates never undercount, and overcount by at most
eps*N with probability 1-delta for width=ceil(e/eps), depth=ceil(ln(1/delta)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, row: int, width: int, seed: int) -> Column:
    return F.pmod(F.xxhash64(col, F.lit(seed + row)), F.lit(width))


def count_min_sketch(
    df: DataFrame,
    col: str,
    width: int = 2048,
    depth: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Build the sketch: one scan, one shuffle of depth*width counters."""
    cells = F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            _bucket(F.col(col), i, width, seed).alias("bucket"),
        )
        for i in range(depth)
    ])
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy("c.row", "c.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    col: str,
    width: int = 2048,
    depth: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Estimate the frequency of every value in ``queries[col]``:
    min over rows of the matching bucket counter (0 if the bucket is
    empty). The sketch side is broadcast — it is depth*width rows."""
    probes = queries.select(col).distinct().select(
        col,
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("row"),
                _bucket(F.col(col), i, width, seed).alias("bucket"),
            )
            for i in range(depth)
        ])).alias("p"),
    ).select(col, "p.row", "p.bucket")
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left").select(
        col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy(col).agg(F.min("cnt").alias("estimate"))
