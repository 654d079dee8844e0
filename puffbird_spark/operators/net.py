"""IPv4 / CIDR network operators: parse, format, longest-prefix match.

The reference engine ships no network surface; this is EXT
training-pipeline coverage — web-scale curation buckets crawl records by
origin network (per-block rate stats, blocklist joins, CGNAT/private
range filtering a la CCNet's per-host grouping).

Scale design (100 TB): the block table is small (thousands of CIDRs) and
the fact side is huge, so the longest-prefix match is NOT a nested-loop
``ip BETWEEN lo AND hi`` theta join (that's #blocks comparisons per row).
Instead the match decomposes by prefix length: for each DISTINCT prefix
length ``n`` present in the block table (at most 33), the candidate
block is found by an EQUI-join on ``ip >> (32-n)`` against a broadcast
dictionary of that length's networks — a map-side hash probe inside
whole-stage codegen, zero shuffles. The longest match wins via a single
``coalesce`` over the per-length join results ordered longest-first, so
no window, no groupBy, no re-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ipv4_to_long",
    "long_to_ipv4",
    "parse_cidr_blocks",
    "cidr_lpm_match",
]


def ipv4_to_long(col: Column | str) -> Column:
    """Dotted-quad text -> uint32 as BIGINT (pure Column arithmetic:
    one split + four casts, whole-stage codegen)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.")
    return (
        parts.getItem(0).cast("long") * F.lit(16777216)
        + parts.getItem(1).cast("long") * F.lit(65536)
        + parts.getItem(2).cast("long") * F.lit(256)
        + parts.getItem(3).cast("long")
    )


def long_to_ipv4(col: Column | str) -> Column:
    """uint32 BIGINT -> dotted-quad text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(
        ".",
        (c / F.lit(16777216)).cast("long") % 256,
        (c / F.lit(65536)).cast("long") % 256,
        (c / F.lit(256)).cast("long") % 256,
        c % 256,
    )


def parse_cidr_blocks(blocks: DataFrame, cidr_col: str = "cidr") -> DataFrame:
    """Parse ``a.b.c.d/n`` text into the match-ready block dictionary:
    ``cidr, prefix_len, net, net_sh`` where ``net_sh = net >> (32-n)``
    is the equi-join key for that prefix length. Pure Column ops; the
    per-row shift amount uses the SQL ``shiftright`` form (the Python
    wrapper only takes literal shift counts)."""
    halves = F.split(F.col(cidr_col), "/")
    out = blocks.withColumn("prefix_len", halves.getItem(1).cast("int"))
    out = out.withColumn("net", ipv4_to_long(halves.getItem(0)))
    return out.withColumn(
        "net_sh", F.expr("shiftright(net, 32 - prefix_len)")
    )


def cidr_lpm_match(
    df: DataFrame,
    ip_col: str,
    blocks: DataFrame,
    cidr_col: str = "cidr",
    how: str = "inner",
) -> DataFrame:
    """Longest-prefix-match each row's IPv4 (dotted-quad text column
    ``ip_col``) against ``blocks`` (one CIDR string per row).

    Returns ``df`` + ``ip_long`` + the winning ``cidr`` / ``prefix_len``
    (NULL when no block covers the address and ``how='left'``; such rows
    are dropped under the default ``how='inner'``).

    Plan shape: one broadcast hash equi-join per DISTINCT prefix length
    (longest first), then one ``coalesce`` picks the longest hit — no
    shuffle, no window, no nested loop. The only driver-side step is
    collecting the (bounded, <=33-entry) distinct-length list and
    validating network uniqueness per length.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    dic = parse_cidr_blocks(blocks, cidr_col)
    # bounded collect: one row per distinct prefix length, with a
    # uniqueness check (duplicate networks at one length would fan out
    # the equi-join and silently duplicate fact rows)
    stats = (
        dic.groupBy("prefix_len")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("net_sh").alias("n_distinct"),
        )
        .collect()
    )
    dup = [r for r in stats if r["n"] != r["n_distinct"]]
    if dup:
        raise ValueError(
            f"duplicate networks at prefix length(s) "
            f"{[r['prefix_len'] for r in dup]}"
        )
    plens = sorted((r["prefix_len"] for r in stats), reverse=True)

    out = df.withColumn("ip_long", ipv4_to_long(ip_col))
    for n in plens:
        side = dic.filter(F.col("prefix_len") == n).select(
            F.col("net_sh").alias(f"__sh_{n}"),
            F.struct(
                F.col(cidr_col).alias("cidr"),
                F.col("prefix_len"),
            ).alias(f"__m_{n}"),
        )
        out = out.join(
            F.broadcast(side),
            F.shiftright(F.col("ip_long"), 32 - n) == F.col(f"__sh_{n}"),
            "left",
        ).drop(f"__sh_{n}")
    best = F.coalesce(*[F.col(f"__m_{n}") for n in plens])
    out = (
        out.withColumn("cidr", best.getField("cidr"))
        .withColumn("prefix_len", best.getField("prefix_len"))
        .drop(*[f"__m_{n}" for n in plens])
    )
    if how == "inner":
        out = out.filter(F.col("cidr").isNotNull())
    return out
