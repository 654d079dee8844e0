"""Structured Streaming surface (SURVEY §2.2 streaming rows).

The batch query twins live in ``queries/streaming_q.py`` (same expressions,
oracle-checked); this module provides the stream-native plumbing: source
construction, watermarked windowed aggregation, streaming dedup,
stream-static joins, and foreachBatch sinks.
"""

from .ops import (
    read_parquet_stream,
    snapshot_epoch_sink,
    session_agg,
    sliding_agg,
    stream_static_join,
    streaming_dedup,
    tumbling_agg,
    write_foreach_batch,
)

__all__ = [
    "read_parquet_stream",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "streaming_dedup",
    "stream_static_join",
    "snapshot_epoch_sink",
    "write_foreach_batch",
]
