"""Data-layout operators: z-order (Morton) clustering for multi-column
data skipping.

A range-partitioned, sorted write clusters on ONE leading column; filters
on any other column read everything. Interleaving the bits of several
columns into one z-value and range-partitioning on THAT gives every
interleaved column locality, so parquet min/max stats prune row groups for
filters on any of them — the standard lakehouse OPTIMIZE ZORDER BY.

Everything is closed-form bit arithmetic in Column expressions (unrolled
shifts/masks, whole-stage codegen); no UDFs, no driver work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of each column into one long.

    Columns must be non-negative integers (clip/normalize first — e.g.
    ``pmod(xxhash64(c), 2**bits)`` for arbitrary types). With k columns,
    bit i of column j lands at position ``i*k + j``; total bits ``k*bits``
    must fit in a signed long (``k*bits <= 62``).
    """
    k = len(cols)
    if k < 2:
        raise ValueError("z_value needs at least 2 columns")
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed long")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long")
          for c in cols]
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            out = out + (bit * F.lit(1 << (i * k + j)).cast("long"))
    return out


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
    z_col: str = "__z",
) -> DataFrame:
    """Cluster ``df`` for multi-column skipping: compute the z-value,
    range-partition + sort on it, drop the helper column. Writing the
    result to parquet yields files whose min/max stats are selective on
    EVERY interleaved column."""
    with_z = df.withColumn(z_col, z_value(cols, bits))
    if num_partitions:
        parted = with_z.repartitionByRange(num_partitions, F.col(z_col))
    else:
        parted = with_z.repartitionByRange(F.col(z_col))
    return parted.sortWithinPartitions(z_col).drop(z_col)


def bucketed_table(
    spark,
    df: DataFrame,
    name: str,
    key: str,
    buckets: int = 16,
    path: str | None = None,
) -> str:
    """Write ``df`` as a bucketed, bucket-sorted table and return its name
    (idempotent: an existing table is reused).

    Bucketing is the co-located-join primitive: both sides of a join
    pre-hashed into the same number of buckets on the join key read
    bucket-aligned splits, so the sort-merge join runs with ZERO Exchange
    — at 100 TB this removes the largest shuffle of a fact-fact join and
    is the difference between an hours-long stage and none. The write
    itself pays one shuffle ONCE; every subsequent join on the key is
    shuffle-free (plan-asserted in tests/test_plans.py).
    """
    if spark.catalog.tableExists(name):
        return name
    # the in-memory catalog dies with the session but the warehouse dir
    # survives: a stale managed-table location fails saveAsTable
    # (LOCATION_ALREADY_EXISTS) — remove it and rebuild deterministically
    if path is None:
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        if wh.startswith("file:"):
            wh = wh[len("file:"):]
        if wh:
            shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
    writer = (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)
    return name
