"""Train/eval decontamination: flag training documents that share word
n-grams with an evaluation corpus.

The standard pre-training hygiene pass (the reference engine has no
equivalent; semantics follow the n-gram-overlap method used across
published LLM data pipelines): any training document containing an
n-gram that also occurs in the eval set is contaminated to the degree
measured by the fraction of its distinct n-grams that overlap.

Scale shape: the eval side (benchmarks) is tiny relative to the corpus —
its distinct-gram set is aggregated once and **broadcast**, so the 100 TB
train side is a single map-side semi-join plus one groupBy on the doc id;
the train corpus is never shuffled by gram. If the eval set outgrows the
broadcast threshold Spark's AQE falls back to a shuffle join on the gram
key — still one shuffle of (id, gram-hash) pairs, never documents. At
real scale the join key would be ``xxhash64(gram)`` (8 bytes instead of
the gram string); the plain gram here keeps the DuckDB oracle exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens


def contamination(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per contaminated train doc: the number of distinct n-grams shared
    with ``eval_df`` and the contaminated fraction of its n-grams.

    Returns ``id_col, n_grams, n_contaminated, contamination`` — only
    docs with at least one shared gram (the clean corpus majority never
    leaves the map side).
    """
    from ..plans import fence

    # shingle arrays staged behind a fence: InferFiltersFromGenerate would
    # otherwise push a size()/isnotnull() predicate below the explode that
    # re-inlines the whole shingle expression 2-3x per row — tripling the
    # scan-stage CPU of the big side at scale (plan-asserted in tests).
    ev = fence(
        eval_df, [], sh=shingles(tokens(text_col), n)
    ).select(F.explode("sh").alias("gram")).distinct()
    tr = fence(
        train.select(F.col(id_col), F.col(text_col)),
        [id_col], sh=shingles(tokens(text_col), n),
    ).select(
        id_col, F.size("sh").alias("n_grams"), F.explode("sh").alias("gram")
    )
    hits = tr.join(F.broadcast(ev), "gram")
    return (
        hits.groupBy(id_col)
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.count("*").alias("n_contaminated"),
        )
        .select(
            id_col,
            "n_grams",
            "n_contaminated",
            F.round(
                F.col("n_contaminated") / F.col("n_grams"), 6
            ).alias("contamination"),
        )
    )


# --------------------------------------------------------------------- #
# Bloom-filter variant: the scale path when the eval gram set outgrows
# what a broadcast hash join comfortably holds (a big reference corpus,
# a multi-benchmark eval union). The filter is m bits regardless of gram
# count; the train side becomes a SCAN-LOCAL membership test — no join
# at all, not even map-side.
# --------------------------------------------------------------------- #


def bloom_filter_words(
    grams: DataFrame,
    gram_col: str = "gram",
    m_bits: int = 1 << 17,
    k: int = 5,
) -> list[int]:
    """Build an m-bit Bloom filter over a gram column as a list of
    ``m_bits/64`` long words.

    The k bit positions per gram are ``pmod(xxhash64(seed_s, gram), m)``
    computed IN Spark (so the probe side — also Spark — uses the exact
    same hash); only the DISTINCT SET POSITIONS come back to the driver,
    bounded by ``min(k * n_grams, m_bits)`` — at the default 2^17 bits
    that is at most 131k longs (~1 MB) no matter how many grams went in.
    This is the deliberate trade: the collect is bounded by the filter
    size, not the data."""
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    pos_cols = [
        F.pmod(F.xxhash64(F.lit(s), F.col(gram_col)), F.lit(m_bits))
        for s in range(k)
    ]
    rows = (
        grams.select(F.explode(F.array(*pos_cols)).alias("pos"))
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        p = int(r["pos"])
        words[p >> 6] |= 1 << (p & 63)
    # two's-complement: JVM longs are signed; bit 63 set => negative value
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_contaminated(
    train: DataFrame,
    words: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 5,
    flag_col: str = "bloom_hit",
) -> DataFrame:
    """Flag training docs where ANY distinct n-gram tests positive in the
    Bloom filter. One scan-local projection over the corpus: the filter
    words ship as a literal array (m/64 longs inside the plan), the k bit
    tests are native Column bit arithmetic inside an ``exists`` HOF —
    zero joins, zero shuffles, zero Python. Bloom guarantees NO false
    negatives (every truly contaminated doc is flagged); false positives
    are bounded by (1 - e^{-kn/m})^k and verified by the gate."""
    from ..functions.text import shingles, tokens
    from ..plans import fence

    m_bits = len(words) * 64
    lit_words = F.array(*[F.lit(w).cast("long") for w in words])
    # shiftleft() takes only a literal shift amount, so the 64 possible
    # single-bit masks ship as one literal array indexed by pos % 64
    lit_masks = F.array(*[
        F.lit((1 << j) - (1 << 64 if j == 63 else 0)).cast("long")
        for j in range(64)
    ])

    def bit_set(pos):
        word = F.element_at(lit_words, (pos / 64).cast("int") + 1)
        mask = F.element_at(lit_masks, (pos % 64).cast("int") + 1)
        return word.bitwiseAND(mask) != 0

    def gram_hits(g):
        hit = None
        for s in range(k):
            pos = F.pmod(F.xxhash64(F.lit(s), g), F.lit(m_bits))
            b = bit_set(pos)
            hit = b if hit is None else (hit & b)
        return hit

    staged = fence(
        train.select(F.col(id_col), F.col(text_col)),
        [id_col], sh=shingles(tokens(text_col), n),
    )
    return staged.select(
        id_col, F.exists("sh", gram_hits).alias(flag_col)
    )
