"""Multimodal column conventions: image/audio/video as opaque ``binary``
columns plus a typed metadata struct (BASELINE.json north star).

The Spark-side plumbing is real and tested — schema, binaryFile source,
Arrow-batched decode pipeline via mapInPandas, partition sizing. The decode
kernels themselves are deterministic STUBS (the image/audio libraries are
not in this container); swap ``_decode_image_stub`` for a PIL/ffmpeg call
and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried next to every media blob
MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType()),     # image|audio|video
    T.StructField("format", T.StringType()),         # png|jpeg|wav|mp4|...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("size_bytes", T.LongType()),
])

#: decoded-feature output schema of the decode stage
DECODED_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("size_bytes", T.LongType()),
    T.StructField("digest", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """binaryFile source: (path, modificationTime, length, content). The
    standard ingest for media blobs; partition sizing is driven by
    spark.sql.files.maxPartitionBytes, so huge blob dirs parallelize."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def with_media_meta(
    df: DataFrame, content_col: str = "content", media_type: str = "image",
    fmt: str = "bin",
) -> DataFrame:
    """Attach the typed metadata struct (decode-free fields only)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(content_col)).cast("long").alias("size_bytes"),
        ),
    )


def _decode_image_stub(blob: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decode+feature-extract': byte histogram folded
    to ``dim`` buckets, normalized. Replace with a real decoder; the
    Spark plumbing (Arrow batches, schema, partitioning) stays identical."""
    if blob is None or len(blob) == 0:
        return [0.0] * dim
    buckets = [0] * dim
    for i, byte in enumerate(blob[:4096]):
        buckets[byte % dim] += 1
    total = sum(buckets) or 1
    return [round(b / total, 6) for b in buckets]


def decode_features(
    df: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    dim: int = 8,
    batch_size: int = 64,
) -> DataFrame:
    """mapInPandas decode stage: Arrow-batched, one Python worker per
    partition, bounded batch size so a partition of large blobs doesn't
    blow worker memory. This is the real 100 TB shape: decode is
    embarrassingly parallel and never shuffles."""
    import hashlib

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start:start + batch_size]
                yield pd.DataFrame({
                    "path": chunk[path_col].astype(str),
                    "size_bytes": chunk[content_col].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "digest": chunk[content_col].map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "feature": chunk[content_col].map(
                        lambda b: _decode_image_stub(b, dim)
                    ),
                })

    return df.select(path_col, content_col).mapInPandas(decode, DECODED_SCHEMA)
