"""Declared query surface (SURVEY.md §2): importing this package populates
the QUERIES/ORACLES registries consumed by ``__spark_entry__`` and
``bench.py``."""

from .base import ORACLES, QUERIES, load  # noqa: F401
from . import (  # noqa: F401,E402
    engine_q,
    explode_q,
    functions_q,
    llm_q,
    relational,
    sources_q,
    sql_q,
    streaming_q,
    udf_q,
    windows_q,
)

# The driver's correctness gate consumes the first 50 registry entries in
# order. Queries that have never received a driver correctness row (round-1
# gate stopped at 50) plus queries new this round go FIRST so every declared
# operator accumulates oracle evidence; long-green round-1 queries fill the
# remaining window and the tail.
_VERIFY_FIRST = [
    # never driver-checked (positions 50+ in rounds 1-2) — six are the
    # REF-surface engine gates R6/R7/R8/R13/R14/R18 (VERDICT r2 #2)
    "engine_col_apply", "engine_apply_rowwise", "engine_project_ops",
    "engine_puffy_to_long_shortcut", "engine_sanitize",
    "engine_aggfunc_dispatch",
    "agg_percentiles_exact", "sample_fraction", "sample_stratified",
    "text_repetition", "text_shingle_hash",
    # round-2 canonicalizer errs, now flattened to hashable scalars
    "fn_struct", "fn_array_hof",
    # r1 `no_oracle` rows-only — re-presented so they register rows>0
    # instead of stale errs (VERDICT r2 #3); each has a hash-matched
    # exact twin already green (md5 banding, jaccard, ivf_exact, ...)
    "dedup_minhash_lsh", "dedup_simhash", "knn_lsh", "knn_ivf",
    "agg_approx_distinct",
    # new gates this round
    "engine_to_long_structs",   # R5-inside-R2 array<struct> flatten
    "multimodal_decode",        # real PNG header decode, stub gone
    "text_decontaminate",       # train/eval n-gram overlap (broadcast)
    "pack_spanning",            # concat-then-cut packing (prefix-sum)
    "pack_greedy",              # no-split greedy packing vs recursive CTE
    "text_chunk_windows",       # token-window chunking (RAG split)
    "stream_stateful_count",    # applyInPandasWithState cross-batch state
    "join_bucketed",            # co-located bucketed join, zero Exchange
    "stream_stream_join",       # watermarked interval join, true 2-stream replay
    "join_range_binned",        # pure range join as binned equi-join
    # backfill: long-green queries last checked in round 1
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "engine_to_long_roundtrip", "engine_to_long_shared_axes",
    "engine_to_puffy", "engine_expand_col", "engine_zip_explode",
    "explode_tokens", "pivot_returnflag",
    "multid_pivot_acctbal",
    "fn_string", "fn_date", "fn_math", "fn_cond", "fn_array",
    "fn_json",
    "text_tokens_bpe", "dedup_exact", "dedup_jaccard", "knn_cosine",
    "text_stats",
    # (join_semi/join_anti/join_asof/text_langid rotated to the tail —
    # all r1-green — to keep the window at 50 with the new gates in)
]


def _reorder() -> None:
    snapshot = dict(QUERIES)
    QUERIES.clear()
    for name in _VERIFY_FIRST:
        if name in snapshot:
            QUERIES[name] = snapshot.pop(name)
    QUERIES.update(snapshot)


_reorder()

__all__ = ["QUERIES", "ORACLES", "load"]
