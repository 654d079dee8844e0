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
    one rlike + one split + four casts, whole-stage codegen).

    Malformed text (non-numeric octets, wrong arity, whitespace) and
    out-of-range octets (> 255) read NULL — real web logs carry them,
    and the unguarded octet cast was an ANSI CAST_INVALID_INPUT that
    killed the whole job on one bad row (probe batch 5). The casts sit
    INSIDE the regexp guard, so ANSI never sees a non-digit octet."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.")
    octs = [parts.getItem(i).cast("long") for i in range(4)]
    in_range = (
        (octs[0] <= 255) & (octs[1] <= 255)
        & (octs[2] <= 255) & (octs[3] <= 255))
    return F.when(
        c.rlike(r"^\d{1,3}(\.\d{1,3}){3}$"),
        F.when(
            in_range,
            octs[0] * F.lit(16777216) + octs[1] * F.lit(65536)
            + octs[2] * F.lit(256) + octs[3]),
    )


def long_to_ipv4(col: Column | str) -> Column:
    """uint32 BIGINT -> dotted-quad text. Values outside [0, 2^32-1]
    and NULL read NULL (probe batch 5: concat_ws SKIPS null args, so a
    NULL input previously rendered as '' and a negative produced
    '0.0.0.-1')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.between(0, 4294967295),
        F.concat_ws(
            ".",
            (c / F.lit(16777216)).cast("long") % 256,
            (c / F.lit(65536)).cast("long") % 256,
            (c / F.lit(256)).cast("long") % 256,
            c % 256,
        ),
    )


def parse_cidr_blocks(blocks: DataFrame, cidr_col: str = "cidr") -> DataFrame:
    """Parse ``a.b.c.d/n`` text into the match-ready block dictionary:
    ``cidr, prefix_len, net, net_sh`` where ``net_sh = net >> (32-n)``
    is the equi-join key for that prefix length. Pure Column ops; the
    per-row shift amount uses the SQL ``shiftright`` form (the Python
    wrapper only takes literal shift counts)."""
    c = F.col(cidr_col)
    # the whole-string guard keeps getItem/cast from ever touching a
    # slash-less or non-numeric block — under ANSI those were
    # INVALID_ARRAY_INDEX / CAST errors killing the job on one bad row
    # (probe batch 5); the <=32 guard keeps /33+ from a sign-masked
    # negative shift. Malformed blocks parse to NULL fields and then
    # match nothing (NULL never equi-joins) — garbage text, NULL out.
    valid = c.rlike(r"^\d{1,3}(\.\d{1,3}){3}/\d{1,2}$")
    halves = F.split(c, "/")
    plen_raw = F.when(valid, halves.getItem(1).cast("int"))
    out = blocks.withColumn(
        "prefix_len", F.when(plen_raw <= 32, plen_raw))
    out = out.withColumn(
        "net", F.when(valid, ipv4_to_long(halves.getItem(0))))
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
