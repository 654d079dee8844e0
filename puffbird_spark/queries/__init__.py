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
# order. Round-6 rotation (VERDICT r5 #1): lead with the four gates that
# landed after the r5 window filled and have never had a driver row, then
# the gates changed this round, then the 41 queries whose only driver
# evidence is round-3 — after this window no registry query's latest
# evidence is older than round 4.
_VERIFY_FIRST = [
    # -- the 4 never-driver-checked gates (landed late in r5; all locally
    #    hash-green via tools/check_oracle.py and judge-verified r5)
    "split_cap_per_group",
    # CHANGED r6: both dedup joins now null-safe on the digest (one
    # NULL-text survivor under replay; ADVICE r5 medium)
    "dedup_incremental",
    # CHANGED r6: output order pinned by a re-applied sort after the
    # total crossJoin (ADVICE r5)
    "text_heavy_hitters",
    # CHANGED r6: eps bound gets 3x headroom so the boolean is stable on
    # any corpus/SF, not pinned to the current fixture (ADVICE r5)
    "sketch_count_min",
    # -- CHANGED r6: SRP-LSH defaults to query-directed multi-probe
    #    (3*planes smallest-margin flips); recall floor 0.2 -> 0.5
    "knn_lsh",
    # -- 41 queries whose latest driver row is ROUND 3 (staleness
    #    backfill; engine_col_apply/engine_apply_rowwise also pick up the
    #    r6 Arrow-default dispatch change)
    "engine_to_long_roundtrip", "engine_col_apply", "engine_apply_rowwise",
    "engine_project_ops", "engine_puffy_to_long_shortcut",
    "engine_sanitize", "engine_aggfunc_dispatch", "engine_to_long_structs",
    "explode_tokens", "engine_to_long_shared_axes", "pivot_returnflag",
    "multid_pivot_acctbal", "fn_string", "fn_date", "fn_math", "fn_cond",
    "fn_array", "fn_json", "text_tokens_bpe", "fn_struct", "fn_array_hof",
    "dedup_exact", "dedup_jaccard", "text_shingle_hash", "text_stats",
    "text_repetition", "text_decontaminate", "pack_spanning",
    "pack_greedy", "text_chunk_windows", "q1_pricing_summary",
    "q3_shipping_priority", "q5_region_revenue", "join_range_binned",
    "engine_to_puffy", "engine_expand_col", "engine_zip_explode",
    "multimodal_decode", "join_bucketed", "stream_stateful_count",
    "stream_stream_join",
    # -- NEW round 6 gates fill the remaining slots (appended as they
    #    land; see llm_q.py / sources_q.py)
    "split_weighted_sample",
    "agg_hll_rollup",
    "knn_sq_int8",
    "scan_schema_evolution",
]
# ROUND-7 TODO: ten r6 gates landed after the 50-slot window filled
# (all locally hash-green via tools/check_oracle.py; each needs its first
# driver row — put them at the r7 window head): `agg_hll_incremental`,
# `stream_incremental_dedup`, `sink_compact_small_files`, `knn_pq`,
# `split_token_budget_weighted`, `sketch_quantile_kmv`,
# `join_bloom_pruned`, `dedup_substring_spans`, `scan_time_travel`,
# `embedding_kmeans`, `dedup_semantic`, `dedup_lines`,
# `text_perplexity_bigram`, `text_quality_classifier`,
# `scan_data_skipping`, `snapshot_diff_cdc`, `timeseries_gap_fill`,
# `filter_pipeline_audit`, `text_winnowing`,
# `stream_stream_outer_join`, `sketch_hll_overlap`,
# `dedup_containment`, `split_leakage_safe`, `embedding_standardize`,
# `fn_luhn_mask`, `split_curriculum_phases`, `embedding_outliers`,
# `text_bpe_pairs`, `embedding_random_projection`, `knn_rp_rerank`,
# `multimodal_framesample`, `diag_key_skew`, `eval_ir_metrics`,
# `sink_training_shards`, `dedup_incremental_minhash`,
# `sql_exists_subquery`, `sql_scalar_subquery`, `multimodal_resize`,
# `agg_group_ols`, `funnel_conversion`, `pipeline_end_to_end`,
# `timeseries_cusum`, `agg_group_corr`, `scan_xml`, `join_scd2`,
# `dedup_soft_weights`, `text_decontaminate_report`,
# `interval_coverage`, `agg_distribution_stats`, `scan_json_corrupt`,
# `stream_sessionize`. Then rotate the r4-stale queries (compute as
# registry − r5 window − r6 window).


def _reorder() -> None:
    snapshot = dict(QUERIES)
    QUERIES.clear()
    for name in _VERIFY_FIRST:
        if name in snapshot:
            QUERIES[name] = snapshot.pop(name)
    QUERIES.update(snapshot)


_reorder()

__all__ = ["QUERIES", "ORACLES", "load"]
