"""Similarity search over embedding columns (BASELINE.json north star).

Two paths:
- :func:`cosine_topk` — brute-force exact top-k. The query side is
  broadcast; the corpus is scanned once, cosine folded JVM-side, and top-k
  selected with a per-query window. Exact, oracle-checkable, and the right
  baseline up to ~10⁵ queries x corpus partitions.
- :func:`lsh_bucket_topk` — sign-random-projection LSH: corpus and queries
  are hashed into 2^planes buckets by deterministic hyperplanes (seeded
  numpy, shipped as literals); search only joins matching buckets, cutting
  the scanned fraction to ~1/2^planes per probe (multi-probe widens recall).
  Approximate: declared rows-only for the oracle; recall is asserted against
  brute force in tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import as_double, cosine_rounded


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, cand_id, cosine).

    Ranking uses the ROUNDED cosine with id tie-break, so results are
    deterministic and engine-portable.
    """
    c = corpus.select(
        F.col(id_col).alias("cand_id"), as_double(vec_col).alias("cvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qvec")
    )
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("cand_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", "cand_id",
        cosine_rounded(F.col("qvec"), F.col("cvec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _hyperplanes(dim: int, planes: int, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).normal(size=(planes, dim))


def _plane_dots(vec_col, dim: int, planes: int, seed: int):
    """Per-hyperplane signed distances as one array column."""
    h = _hyperplanes(dim, planes, seed)
    dots = []
    for p in range(planes):
        plane = F.array(*[F.lit(float(w)) for w in h[p]])
        dots.append(F.aggregate(
            F.zip_with(vec_col, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ))
    return F.array(*dots)


def _dots_to_bucket(dots, planes: int):
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        bucket = bucket + F.when(
            dots[p] > 0, F.lit(2 ** p).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def srp_bucket(vec_col, dim: int, planes: int = 8, seed: int = 42):
    """Sign-random-projection bucket id (0..2^planes-1) as a Column."""
    return _dots_to_bucket(_plane_dots(vec_col, dim, planes, seed), planes)


def _directed_probe_masks(dots, planes: int, n_probes: int):
    """Query-directed probe sequence: XOR masks of the ``n_probes`` flip
    sets (size 1 or 2) with the smallest summed |signed distance| — the
    planes the query sits closest to are the likeliest to be on the wrong
    side of for a true neighbor, so flip those first. Returns an array
    column of bucket XOR masks ordered best-first."""
    flips = [
        F.struct(
            F.abs(dots[p]).alias("s"), F.lit(1 << p).cast("long").alias("m")
        )
        for p in range(planes)
    ] + [
        F.struct(
            (F.abs(dots[p]) + F.abs(dots[q])).alias("s"),
            F.lit((1 << p) | (1 << q)).cast("long").alias("m"),
        )
        for p in range(planes) for q in range(p + 1, planes)
    ]
    ranked = F.array_sort(F.array(*flips))  # lexicographic: score first
    return F.slice(
        F.transform(ranked, lambda x: x.getField("m")), 1, n_probes
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 8,
    seed: int = 42,
    exclude_self: bool = True,
    probes: int = 1,
    directed_probes: int | None = None,
) -> DataFrame:
    """Approximate top-k: join only within matching SRP buckets.

    One equi-join on bucket id replaces the cross join — the 100 TB path.
    ``probes``: multi-probe radius in Hamming distance over the bucket code
    (probes=1 also searches every bucket one bit-flip away, trading
    (planes+1)x more query-side rows — cheap, queries are the small side —
    for much better recall). ``directed_probes``: query-directed probing —
    search the primary bucket plus exactly that many extra buckets, chosen
    by flipping the planes with the smallest |signed distance| (1- and
    2-bit flip sets ranked by summed margin). Equal recall to Hamming-1 at
    the same probe count is typical at FAR fewer probes than the full
    radius sweep — the knob to turn at 100 TB. Overrides ``probes`` when
    set. Recall < 1 by design; tests assert recall against
    :func:`cosine_topk`.
    """
    c = corpus.select(
        F.col(id_col).alias("cand_id"), as_double(vec_col).alias("cvec")
    ).withColumn("bucket", srp_bucket(F.col("cvec"), dim, planes, seed))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qvec")
    ).withColumn("_dots", _plane_dots(F.col("qvec"), dim, planes, seed))
    q = q.withColumn("bucket", _dots_to_bucket(F.col("_dots"), planes))
    if directed_probes is not None and directed_probes > 0:
        masks = _directed_probe_masks(F.col("_dots"), planes, directed_probes)
        q = q.withColumn(
            "bucket",
            F.explode(F.concat(
                F.array(F.col("bucket")),
                F.transform(masks, lambda m: F.col("bucket").bitwiseXOR(m)),
            )),
        )
    elif probes >= 1:
        flips = [F.col("bucket")] + [
            F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(planes)
        ]
        q = q.withColumn("bucket", F.explode(F.array(*flips)))
    q = q.drop("_dots")
    pairs = c.join(F.broadcast(q), on="bucket").dropDuplicates(
        ["query_id", "cand_id"]
    )
    if exclude_self:
        pairs = pairs.filter(F.col("cand_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", "cand_id",
        cosine_rounded(F.col("qvec"), F.col("cvec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
