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
