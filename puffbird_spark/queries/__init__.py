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
# order. Round-5 rotation (VERDICT r4 #1): lead with the 40 queries whose
# latest driver row is round 2 (covered by neither the r03 nor the r04
# window) so r3∪r4∪r5 covers all 131 declared queries; then the gates NEW
# or CHANGED this round.
#
# ROUND-6 TODO: lead the r6 window with (a) `text_heavy_hitters`,
# `dedup_incremental`, `sketch_count_min`, and `split_cap_per_group` —
# the four r5 gates that landed after the 50-slot window filled (all
# locally hash-green via tools/check_oracle.py, each needs its first
# driver row) — then
# (b) the 41 queries whose only evidence is round-3 (computed
# 2026-08-14 as registry − r4 window − r5 window), plus any r6
# new/changed gates:
#   engine_col_apply engine_apply_rowwise engine_project_ops
#   engine_puffy_to_long_shortcut engine_sanitize engine_aggfunc_dispatch
#   engine_to_long_structs explode_tokens engine_to_long_roundtrip
#   engine_to_long_shared_axes pivot_returnflag multid_pivot_acctbal
#   fn_string fn_date fn_math fn_cond fn_array fn_json text_tokens_bpe
#   fn_struct fn_array_hof dedup_exact dedup_jaccard text_shingle_hash
#   text_stats text_repetition text_decontaminate pack_spanning
#   pack_greedy text_chunk_windows q1_pricing_summary
#   q3_shipping_priority q5_region_revenue join_range_binned
#   engine_to_puffy engine_expand_col engine_zip_explode multimodal_decode
#   join_bucketed stream_stateful_count stream_stream_join
_VERIFY_FIRST = [
    # -- 40 queries last driver-checked in ROUND 2 (staleness backfill;
    #    all r2-green, all pass tools/check_oracle.py locally)
    "udf_grouped_agg", "udf_apply_in_pandas", "udf_udtf", "variant_props",
    "engine_to_long_fused", "multimodal_meta", "dedup_minhash_md5",
    "explode_inline_stack", "explode_inline", "fn_url_mask",
    "dedup_ngram_jaccard", "knn_ivf_exact", "text_quality", "text_tfidf",
    "text_top_ngrams", "embedding_centroids", "dedup_clusters",
    "agg_grouping_sets", "join_right_full", "agg_skew_salted",
    "set_union_by_name", "mem_rows_table", "merge_upsert_customers",
    "to_xarray_guarded", "scan_parquet_partitioned", "sort_zorder",
    "sql_tpch_q6", "sql_grouping_sets", "fn_map_json", "dedup_embedding",
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_dedup_watermark", "hypertable_rollup", "stream_static_join",
    "sessionize_events", "stream_late_data", "stream_foreach_batch",
    "rollup_incremental",
    # -- CHANGED round 5: Bloom filter words ship as ONE ndarray literal
    #    (the r4 cost was per-element F.lit construction) + an explode
    #    probe twin, bit-equal to the default hof path — re-gate
    "text_decontaminate_bloom",
    # -- CHANGED round 5: oracle fraction arithmetic cast to DOUBLE
    #    (ADVICE r4) — re-gate
    "sample_fraction",
    # -- CHANGED round 5: grouped_prefix_sum grew a checkpoint=False
    #    hash-bucket path (both paths bit-equal) — re-gate its consumers
    "split_shuffle_order", "split_token_budget", "split_length_batches",
    # -- CHANGED round 5: every split draw now length-prefixes its key
    #    salt (structural NULL token, round-4 ADVICE) — re-gate all six
    "split_hash_membership", "split_stratified", "split_quota_mixture",
    # -- CHANGED round 5: SRP hyperplanes now ship as single ndarray
    #    literals (same values; construction-only) — re-gate knn_lsh,
    #    which exercises _plane_dots. (_centroid_dots also changed but
    #    the knn_ivf gate path uses _top_cells_udf, not it — covered by
    #    tests, no driver slot spent.)
    "knn_lsh",
    # -- NEW round 5: fused token-budget mixture + spanning packing on
    #    one grouped prefix-sum
    "pack_token_budget",
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
