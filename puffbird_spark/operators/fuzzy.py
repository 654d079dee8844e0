"""Edit-distance fuzzy self-join via deletion neighborhoods — the
SymSpell candidate rule (Garbe's symmetric delete algorithm; same
family as FastSS, Bocek et al. 2007): two strings are within
Levenshtein distance ``d`` only if they share a member of their
``<= d``-deletion neighborhoods (the string itself plus every way of
deleting up to ``d`` characters) — a substitution shares the
same-position deletion, and insert/delete edits share the shorter
string's deeper variants.

Reference parity: the reference engine has no approximate-string
surface; this is EXT scope (entity resolution on near-identical keys —
user handles, product codes, file paths — without an all-pairs
Levenshtein pass).

Scale shape: each string explodes into its deletion neighborhood
(``L+1`` variants at d=1, ``O(L^2)`` at d=2 — the classic SymSpell
index-size trade), variants shrink to 16-byte digests BEFORE the
shuffle (text never shuffles — the MinHash-LSH convention), candidates
pair within digest buckets (never a cross join), and a final exact
``levenshtein`` verifies every candidate, so md5 collisions and the
neighborhood rule's false positives both die before the output. Hot
buckets (mass-duplicated keys) are quadratic per bucket by nature;
``max_bucket`` caps them loudly, the document-frequency-guard
convention of ``containment_pairs``."""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: deletion-neighborhood SQL: the string itself plus every 1-deletion
_DEL1_EXPR = (
    "array_union(array(__key), "
    "transform(sequence(1, length(__key)), "
    "i -> concat(substring(__key, 1, i - 1), "
    "substring(__key, i + 1, length(__key)))))"
)

#: every 2-deletion (positions i < j), NULL-padded then filtered —
#: sequence() is used ascending-only (a descending sequence from an
#: empty i<j range would fabricate variants)
_DEL2_EXPR = (
    "filter(flatten(transform(sequence(1, length(__key)), i -> "
    "transform(sequence(1, length(__key)), j -> "
    "CASE WHEN j > i THEN concat(substring(__key, 1, i - 1), "
    "substring(__key, i + 1, j - i - 1), "
    "substring(__key, j + 1, length(__key))) END))), "
    "x -> x IS NOT NULL)"
)


def fuzzy_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_dist: int = 1,
    include_exact: bool = True,
    max_bucket: int | None = None,
) -> DataFrame:
    """All pairs ``(id_a, id_b, dist)`` with ``id_a < id_b`` and
    ``levenshtein(key_a, key_b) <= max_dist`` — exact recall by the
    deletion-neighborhood theorem, never an all-pairs comparison.
    ``max_dist`` of 1 or 2 (the distances symmetric-delete indexes are
    built for; beyond 2 the neighborhood explodes combinatorially).
    ``include_exact=False`` drops distance-0 (identical-key) pairs.
    ``max_bucket`` drops digest buckets larger than the cap (with a
    warning) — a skew valve for corpora with mass-duplicated keys;
    ``None`` keeps exactness."""
    if max_dist not in (1, 2):
        raise ValueError(f"max_dist must be 1 or 2, got {max_dist}")
    base = df.select(
        F.col(id_col).alias("__id"), F.col(key_col).alias("__key")
    ).filter(F.col("__key").isNotNull())
    neighborhood = F.expr(_DEL1_EXPR)
    if max_dist == 2:
        neighborhood = F.array_union(neighborhood, F.expr(_DEL2_EXPR))
    variants = base.select(
        "__id", "__key", F.explode(neighborhood).alias("__v"),
    ).select("__id", "__key", F.md5("__v").alias("__d"))
    # one row per (string, digest): duplicate variants of ONE string
    # (repeated chars) must not multiply its bucket membership
    variants = variants.dropDuplicates(["__id", "__d"])
    if max_bucket is not None:
        if max_bucket < 2:
            raise ValueError("max_bucket must be >= 2")
        warnings.warn(
            f"fuzzy_pairs: buckets over {max_bucket} members are "
            "dropped — recall is no longer exact on mass-duplicated keys")
        sized = variants.groupBy("__d").agg(
            F.count(F.lit(1)).alias("__n"))
        variants = variants.join(
            sized.filter(F.col("__n") <= max_bucket).select("__d"), "__d")
    a = variants.select(
        F.col("__d"), F.col("__id").alias("id_a"),
        F.col("__key").alias("__ka"))
    b = variants.select(
        F.col("__d"), F.col("__id").alias("id_b"),
        F.col("__key").alias("__kb"))
    pairs = (
        a.join(b, "__d")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__ka", "__kb")
        .dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a", "id_b",
            F.levenshtein("__ka", "__kb").alias("dist"))
        .filter(F.col("dist") <= max_dist)
    )
    if not include_exact:
        pairs = pairs.filter(F.col("dist") > 0)
    return pairs


def fuzzy_pairs_del1(
    df: DataFrame,
    key_col: str,
    id_col: str,
    include_exact: bool = True,
    max_bucket: int | None = None,
) -> DataFrame:
    """Distance-1 convenience wrapper over :func:`fuzzy_pairs` (the
    original surface; the gate `join_fuzzy_del1` pins it)."""
    return fuzzy_pairs(
        df, key_col, id_col, max_dist=1,
        include_exact=include_exact, max_bucket=max_bucket)
