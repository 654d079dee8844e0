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
# order. Round-4 rotation policy (VERDICT r3 #6): (a) queries NEW or
# CHANGED this round go first — they need fresh evidence; (b) the rest of
# the window backfills the queries longest without a driver row (all 22
# last checked in round 1, plus round-2 entries as slots allow).
#
# ROUND-5 TODO: lead the window with the 40 queries covered by neither
# the r03 nor the r04 window (all r2-green, computed 2026-08-13):
#   udf_grouped_agg udf_apply_in_pandas udf_udtf variant_props
#   engine_to_long_fused multimodal_meta dedup_minhash_md5
#   explode_inline_stack explode_inline fn_url_mask dedup_ngram_jaccard
#   knn_ivf_exact text_quality text_tfidf text_top_ngrams
#   embedding_centroids dedup_clusters agg_grouping_sets join_right_full
#   agg_skew_salted set_union_by_name mem_rows_table
#   merge_upsert_customers to_xarray_guarded scan_parquet_partitioned
#   sort_zorder sql_tpch_q6 sql_grouping_sets fn_map_json dedup_embedding
#   stream_tumbling stream_sliding stream_session stream_dedup_watermark
#   hypertable_rollup stream_static_join sessionize_events
#   stream_late_data stream_foreach_batch rollup_incremental
# then any round-5 new/changed gates, then rotate the rest.
_VERIFY_FIRST = [
    # -- new gates this round: deterministic corpus splits (md5 draw
    #    replayed bit-for-bit in DuckDB; splits.py round-3 bugs fixed)
    "split_hash_membership", "split_quota_mixture", "split_stratified",
    "split_shuffle_order",
    # -- new gates: token-budget mixture + length-bucketed batching, both
    #    on the two-exchange grouped prefix-sum (no single-task windows)
    "split_token_budget", "split_length_batches",
    # -- new gate: Bloom-filter decontamination (scan-local probe, no
    #    join; self-checking no-false-negative + fp-rate booleans)
    "text_decontaminate_bloom",
    # -- new gate: embedding near-dup pairs -> connected components
    "dedup_embedding_clusters",
    # -- new gate: skew-proof replicated join == plain join bit-for-bit
    "join_skew_replicated",
    # -- new gates: ORC scan round-trip; scan-local text normalization
    "scan_orc", "text_normalize",
    # -- changed this round: r3 err -> flattened scalar output
    "agg_percentiles_exact",
    # -- changed this round: rows-only -> self-checking assertion gates
    #    (VERDICT r3 #5 — each emits its tolerance/recall/bound booleans
    #    next to oracle-verifiable exact values)
    "sample_fraction", "sample_stratified", "agg_approx_distinct",
    "dedup_minhash_lsh", "dedup_simhash", "knn_lsh", "knn_ivf",
    # -- changed this round: batch-size-gated scoring kernel (HOF path at
    #    gate SF must stay hash-identical to the Arrow path)
    "knn_cosine",
    # -- longest unchecked: every query last driver-checked in ROUND 1
    "unpivot_part", "fn_map", "fn_to_json", "text_fingerprint",
    "text_langid", "join_semi", "join_anti", "join_range", "join_cross",
    "join_asof", "agg_stats", "agg_rollup", "agg_cube", "agg_collect",
    "sort_topk", "set_union_all", "set_intersect", "set_except",
    "distinct_segments", "dedup_first_per_key", "scan_csv", "scan_json",
    # -- round-2-checked backfill (15 of 48; the other 33 lead round 5)
    "window_rank", "window_rank_kinds", "window_running",
    "window_lag_lead", "window_moving_avg", "window_range_frame",
    "window_ntile_cume",
    "udf_pandas_scalar", "udf_grouped_agg", "udf_apply_in_pandas",
    "udf_udtf",
    "variant_props", "engine_to_long_fused", "multimodal_meta",
    "dedup_minhash_md5",
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
