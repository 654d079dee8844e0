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
    # window surface (no round-1 driver row)
    "window_rank", "window_rank_kinds", "window_running",
    "window_lag_lead", "window_moving_avg", "window_range_frame",
    # streaming batch-twin surface
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_dedup_watermark", "hypertable_rollup", "stream_static_join",
    # UDF + variant surface
    "udf_pandas_scalar", "udf_grouped_agg", "udf_apply_in_pandas",
    "variant_props",
    # SQL front-end + tail of round-1 registration order
    "sql_tpch_q6", "sql_grouping_sets", "fn_map_json", "dedup_embedding",
    "engine_to_long_fused",
    # upgraded / new this round
    "text_quality", "dedup_minhash_md5", "dedup_ngram_jaccard",
    "knn_ivf_exact", "agg_grouping_sets", "window_ntile_cume",
    "fn_struct", "fn_url_mask", "join_right_full", "agg_skew_salted",
    "sessionize_events", "fn_array_hof",
    "stream_late_data", "multimodal_meta", "to_xarray_guarded",
    "explode_inline_stack", "explode_inline", "set_union_by_name",
    "mem_rows_table", "scan_parquet_partitioned", "udf_udtf",
    "text_tfidf", "text_top_ngrams", "embedding_centroids",
    "stream_foreach_batch", "dedup_clusters", "merge_upsert_customers",
    "rollup_incremental", "sort_zorder", "text_repetition",
    "agg_percentiles_exact",
    "sample_fraction", "text_shingle_hash", "sample_stratified",
    "engine_aggfunc_dispatch",
    "engine_col_apply",
    "engine_apply_rowwise",
    "engine_project_ops", "engine_puffy_to_long_shortcut", "engine_sanitize",
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
