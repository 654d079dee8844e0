"""Deterministic corpus partitioning for training pipelines: train/eval
splits, per-domain quota (mixture-weight) sampling, hash sampling, and
global shuffle order.

Every operator here is *content-deterministic*: membership depends only on
``md5(seed || key)``, never on partition layout, executor count, or Spark's
per-partition RNG. That property is what a 100 TB pipeline actually needs —

- re-running the job (after failure, after adding a stage) yields the SAME
  split, so train/eval contamination can't creep in between runs;
- new documents can be appended and existing documents never migrate
  between splits (assignment is per-key, not positional);
- the decision is a scan-local projection — zero shuffles, no sampling
  pass, pushes down past column pruning like any other filter.

Contrast ``DataFrame.sample``: Bernoulli per partition-split RNG —
fast but irreproducible across layouts (kept as the quick-look twin in
``queries/sources_q.py``).

The uniformity claim: the first 16 hex chars of md5 are uniform on
[0, 2^64); comparing the FIXED-LENGTH lowercase hex prefix against a
threshold string is identical to the numeric comparison (byte-wise ASCII
order == numeric order for same-length lowercase hex), and every engine
with md5() reproduces it bit-for-bit — which is what makes these operators
oracle-checkable end to end.

Reference parity note: neuralsignal/puffbird has no sampling surface at
all (frame.py covers transform only); this module is part of the EXT
training-pipeline surface (SURVEY §2.2).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hex digits of md5 prefix used for the uniform draw; 16 nibbles = 64 bits
_PREFIX_LEN = 16


def hash_hex_threshold(fraction: float) -> str:
    """The ``_PREFIX_LEN``-char lowercase hex string h such that a uniform
    md5 prefix compares ``< h`` with probability ``fraction``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(int(round(fraction * (16 ** _PREFIX_LEN))), f"0{_PREFIX_LEN + 1}x")[-_PREFIX_LEN - 1:][:_PREFIX_LEN] \
        if fraction >= 1.0 else format(int(round(fraction * (16 ** _PREFIX_LEN))), f"0{_PREFIX_LEN}x")


def hash_draw(key: Column, seed: str) -> Column:
    """Uniform [0,1) draw as a fixed-length hex string: the first
    ``_PREFIX_LEN`` chars of ``md5(seed || ':' || key)``."""
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(seed), key.cast("string"))), 1, _PREFIX_LEN
    )


def hash_sample(
    df: DataFrame, key: str, fraction: float, seed: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample keyed on ``key``.

    A pure filter — no shuffle, no sampling pass; survives re-runs and
    repartitioning unchanged (unlike ``DataFrame.sample``)."""
    return df.filter(
        hash_draw(F.col(key), seed) < F.lit(hash_hex_threshold(fraction))
    )


def hash_split(
    df: DataFrame,
    key: str,
    weights: Mapping[str, float],
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split with the given weights.

    ``weights`` maps split name -> weight (need not sum to 1; normalized).
    Assignment is a seeded hash of ``key`` only — append-stable and
    layout-independent, the property a train/val/test split must have so
    eval rows can never drift into training between pipeline runs.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    draw = hash_draw(F.col(key), seed)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += float(weights[name]) / total
        cond = draw < F.lit(hash_hex_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def quota_sample(
    df: DataFrame,
    key: str,
    domain: str,
    rates: Mapping[str, float],
    seed: str = "quota",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-domain mixture sampling: keep each row of domain d with
    probability ``rates[d]`` (``default_rate`` for unlisted domains).

    This is the data-mixing primitive of a pretraining pipeline ("keep 100%
    of wiki, 30% of web, 5% of crawl dregs"): one deterministic filter,
    no shuffle, no per-domain passes — at 100 TB the alternative
    (groupBy domain + sampleBy) costs a full shuffle and is irreproducible.
    """
    draw = hash_draw(F.col(key), seed)
    expr: Column | None = None
    for name, rate in rates.items():
        cond = F.col(domain) == F.lit(name)
        thr = F.lit(hash_hex_threshold(float(rate)))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    default_thr = F.lit(hash_hex_threshold(float(default_rate)))
    thresholds = default_thr if expr is None else expr.otherwise(default_thr)
    return df.filter(draw < thresholds)


def shuffle_order(
    df: DataFrame, key: str, seed: str = "shuffle", rank_col: str = "shuffle_rank"
) -> DataFrame:
    """Global deterministic shuffle: a total order that is uniform-random
    with respect to content but reproducible across runs.

    Emits ``rank_col`` = position in the shuffled order (1-based). The sort
    is a range-partitioned exchange — Spark's orderBy samples range bounds,
    so at scale this is the standard 2-pass total sort, no driver funnel.
    Training consumers usually only need the ORDER, not the rank: use
    ``df.orderBy(hash_draw(...))``'s write path and skip the window. The
    rank column exists so the order itself is oracle-checkable.
    """
    from pyspark.sql import Window

    draw = hash_draw(F.col(key), seed)
    w = Window.orderBy(draw, F.col(key))
    return df.withColumn(rank_col, F.row_number().over(w))


def stratified_quota(
    df: DataFrame,
    key: str,
    strata: Sequence[str],
    fraction: float,
    seed: str = "strata",
) -> DataFrame:
    """Equal-rate deterministic sample within every stratum (the
    deterministic twin of ``sampleBy`` with a shared fraction): the seed is
    salted with the stratum so the draw is independent across strata even
    for the same key."""
    strata_salt = F.concat_ws("|", *[F.col(s).cast("string") for s in strata])
    draw = F.substring(
        F.md5(
            F.concat_ws(
                ":", F.lit(seed), strata_salt, F.col(key).cast("string")
            )
        ),
        1,
        _PREFIX_LEN,
    )
    return df.filter(draw < F.lit(hash_hex_threshold(fraction)))
