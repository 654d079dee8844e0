"""Skew mitigation: salted aggregation and salted broadcast-join.

AQE's skew-join splitting handles sort-merge joins automatically; these
helpers cover the two cases AQE does not:

- :func:`salted_agg` — a groupBy whose hot key overwhelms one reducer.
  Two-phase: aggregate on (key, salt) first (spreads the hot key over
  ``salt_buckets`` reducers, map-side partials still apply), then merge the
  partials per key. Only ALGEBRAIC aggregates (sum/count/min/max) can be
  merged this way — the helper takes (partial, merge) expression pairs.
- :func:`replicated_join` — joining a skewed fact against a small-but-not-
  tiny dimension: explode the dimension ``salt_buckets`` ways and salt the
  fact side, turning one hot hash partition into ``salt_buckets`` even ones.

Salting costs a second shuffle / replicated build side — use when a key
histogram (``key_histogram``) shows real skew, not by default.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, col_name: str = "__salt") -> DataFrame:
    """Uniform random salt in [0, salt_buckets) — deterministic per row is
    NOT required for aggregation correctness, only for replay; use
    ``pmod(xxhash64(unique_col), n)`` when determinism matters."""
    return df.withColumn(
        col_name, (F.rand(seed=42) * salt_buckets).cast("int")
    )


def key_histogram(df: DataFrame, keys: list[str], top: int = 20) -> DataFrame:
    """Per-key row counts, heaviest first — the decision input for salting."""
    return (
        df.groupBy(*keys).count().orderBy(F.desc("count")).limit(top)
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partials: dict[str, tuple[Callable[[], Column], Callable[[str], Column]]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    ``partials`` maps output column name -> (partial_expr, merge_expr):
    ``partial_expr()`` aggregates raw rows (phase 1, per (key, salt));
    ``merge_expr(col)`` combines phase-1 partials (phase 2, per key).
    Example::

        salted_agg(df, ["k"], {
            "n":     (lambda: F.count(F.lit(1)),    lambda c: F.sum(c)),
            "total": (lambda: F.sum(F.col("v")),    lambda c: F.sum(c)),
            "mx":    (lambda: F.max(F.col("v")),    lambda c: F.max(c)),
        })
    """
    salted = with_salt(df, salt_buckets)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[p().alias(name) for name, (p, _) in partials.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[m(name).alias(name) for name, (_, m) in partials.items()]
    )


def replicated_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: the dimension is replicated ``salt_buckets``
    times (explode), the fact is salted, and the join key becomes
    (keys..., salt) — each hot key now spreads over ``salt_buckets``
    partitions. Dimension must tolerate replication (small side).

    Only ``inner`` and ``left`` are sound: under right/full outer joins an
    unmatched dimension row would surface once per replica (each salted
    copy fails the join independently), duplicating output rows."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"replicated_join supports how='inner'/'left' only, got {how!r}: "
            "replicated unmatched dim rows would duplicate under outer joins"
        )
    salted_fact = with_salt(fact, salt_buckets)
    replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_fact.join(replicated, [*on, "__salt"], how)
    return out.drop("__salt")


def key_skew_stats(df: DataFrame, key: str) -> DataFrame:
    """Shuffle-key skew diagnostics — the measurement that should
    precede every salting/replication decision (`salted_agg` /
    `replicated_join` fix skew; this tells you whether you HAVE it and
    how bad): one row with

    - ``n_rows`` / ``n_keys`` — totals;
    - ``max_key_rows`` and ``top_key`` — the heaviest key (ties break
      on the smallest key string, deterministic);
    - ``p50_key_rows`` / ``p99_key_rows`` — the per-key count
      distribution (exact interpolated percentiles);
    - ``heavy_ratio`` — max over mean: ~1 means uniform, >> 1 means
      the biggest reducer partition is that many times the average —
      the number that predicts a straggler task at 100 TB.

    Cost: ONE keyed count (the same shuffle the diagnosed operation
    would pay) + key-count-sized aggregates. No sort, no collect.
    """
    counts = df.groupBy(F.col(key).cast("string").alias("__k")).agg(
        F.count(F.lit(1)).alias("__n"))
    stats = counts.agg(
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("__n").cast("long").alias("max_key_rows"),
        F.round(F.percentile(F.col("__n"), F.lit(0.5)), 6)
        .alias("p50_key_rows"),
        F.round(F.percentile(F.col("__n"), F.lit(0.99)), 6)
        .alias("p99_key_rows"),
    )
    top = (
        counts.join(
            F.broadcast(stats.select("max_key_rows")),
            counts["__n"] == F.col("max_key_rows"))
        .agg(F.min("__k").alias("top_key"))
    )
    return stats.crossJoin(F.broadcast(top)).select(
        "n_rows", "n_keys", "max_key_rows", "top_key",
        "p50_key_rows", "p99_key_rows",
        F.round(
            F.col("max_key_rows")
            / (F.col("n_rows") / F.col("n_keys")), 6).alias("heavy_ratio"),
    )


def join_cardinality(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Predict an equi-join's output size WITHOUT running the join — the
    pre-flight check before committing a 100 TB shuffle: for key k with
    ``a_k`` left rows and ``b_k`` right rows, the join emits exactly
    ``sum(a_k * b_k)`` rows, computable from the two per-key COUNT
    histograms (each keyed-count shuffles only (key, count) pairs —
    orders of magnitude smaller than the join's row movement).

    One row out:

    - ``n_pairs_predicted`` — exact output rows of the inner join;
    - ``n_keys_joint`` — keys present on both sides;
    - ``max_key_pairs`` + ``top_key`` — the heaviest key's contribution
      (ties break to the smallest key string): the number that says
      "salt this key" (`replicated_join`) before the join straggles;
    - ``blowup_ratio`` — predicted pairs over the larger input: > 1
      means the join AMPLIFIES data (many-to-many) and downstream
      operators see more rows than were scanned.

    The companion of :func:`key_skew_stats` (is one table skewed?) —
    this one prices the JOIN of two.
    """
    lc = left.groupBy(F.col(left_key).cast("string").alias("__k")).agg(
        F.count(F.lit(1)).alias("__a"))
    rc = right.groupBy(F.col(right_key).cast("string").alias("__k")).agg(
        F.count(F.lit(1)).alias("__b"))
    joint = lc.join(rc, "__k").select(
        "__k", (F.col("__a") * F.col("__b")).alias("__pairs"))
    # disjoint key sets leave the joint frame empty: SUM/MAX would read
    # NULL, which is falsy-ambiguous for a pre-flight consumed
    # programmatically — coalesce so the prediction reads an honest 0
    totals = joint.agg(
        F.coalesce(F.sum("__pairs"), F.lit(0))
        .cast("long").alias("n_pairs_predicted"),
        F.count(F.lit(1)).cast("long").alias("n_keys_joint"),
        F.coalesce(F.max("__pairs"), F.lit(0))
        .cast("long").alias("max_key_pairs"),
    )
    top = joint.join(
        F.broadcast(totals.select("max_key_pairs")),
        joint["__pairs"] == F.col("max_key_pairs"),
    ).agg(F.min("__k").alias("top_key"))
    n_left = left.count()
    n_right = right.count()
    return totals.crossJoin(F.broadcast(top)).select(
        "n_pairs_predicted", "n_keys_joint", "max_key_pairs", "top_key",
        F.round(
            F.col("n_pairs_predicted") / F.lit(float(max(n_left, n_right, 1))),
            6,
        ).alias("blowup_ratio"),
    )
