"""Streaming operators over ``readStream`` sources.

Design notes (100 TB / always-on):
- Every aggregation takes a watermark — unbounded state is a production
  outage, not a default. Watermark delay is a caller decision.
- Sinks go through ``foreachBatch`` so each micro-batch can reuse the whole
  batch writer surface (parquet partitionBy, merge-style upserts).
- State-heavy ops (session windows, dedup) key their state by the same
  columns as the shuffle, so state lives where the data lands.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.types import StructType


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream (schema must be explicit for streaming reads)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    keys = keys or []
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(*aggs)
    )
    agg_cols = [c for c in out.columns if c != "w" and c not in keys]
    return out.select(
        F.col("w.start").alias("win_start"),
        F.col("w.end").alias("win_end"),
        *keys,
        *agg_cols,
    )


def sliding_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    keys = keys or []
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"), *keys)
        .agg(*aggs)
    )


def session_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "15 minutes",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    keys = keys or []
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, F.session_window(ts_col, gap).alias("w"))
        .agg(*aggs)
    )


def streaming_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stateful dedup bounded by the watermark — state is purged once the
    watermark passes, so memory stays proportional to the window, not the
    stream history."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_static_join(
    stream: DataFrame,
    static: DataFrame,
    on,
    how: str = "inner",
) -> DataFrame:
    """Stream-static enrichment: the static side is broadcast per
    micro-batch (dimension tables)."""
    return stream.join(F.broadcast(static), on, how)


def write_foreach_batch(
    stream: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    trigger_once: bool = True,
    output_mode: str = "update",
) -> DataStreamWriter:
    """foreachBatch sink: each micro-batch DataFrame hits ``fn`` with the
    full batch-writer surface available.

    Default ``update`` mode: aggregates are emitted as they change, so
    windows still open when the stream drains are not lost (append mode
    would hold them until the watermark passes — forever, on a finite
    replay). Downstream ``fn`` must upsert by key when a stream spans
    multiple micro-batches."""
    writer = (
        stream.writeStream.foreachBatch(fn)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer


def snapshot_epoch_sink(table_path: str):
    """EXACTLY-ONCE streaming sink on the snapshot-manifest table
    (round 8): a ``foreachBatch`` function committing each micro-batch
    as one snapshot version whose manifest records the epoch id.

    Structured Streaming's recovery contract is at-least-once delivery
    to foreachBatch — after a crash the LAST epoch replays with the
    same ``epoch_id``. Idempotence comes from the manifest ledger:

    - a replayed epoch already in :func:`~..operators.layout
      .committed_epochs` is SKIPPED (its rows are already in the
      table, atomically, because the manifest rename is the commit
      point);
    - an epoch that died between shard write and manifest rename left
      an orphan shard that ``write_snapshot`` deletes and rewrites on
      the retry.

    Together: every micro-batch lands in the table exactly once, and
    readers only ever see manifest-committed data. The ledger check is
    metadata-only (one JSON per version), so sink overhead is
    independent of data size. Single-writer per table, like every
    snapshot primitive here."""
    from ..operators.layout import committed_epochs, write_snapshot

    def sink(df, epoch_id: int) -> None:
        spark = df.sparkSession
        if int(epoch_id) in committed_epochs(spark, table_path):
            return  # duplicate delivery after recovery — already durable
        write_snapshot(spark, df, table_path, mode="append",
                       extra={"epoch": int(epoch_id)})

    return sink
