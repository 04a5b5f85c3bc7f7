"""Streaming multimodal ingest: REAL codec kernels under readStream.

`mapInPandas` kernels compose with Structured Streaming unchanged —
the same Arrow-batched PNG decoder that serves the batch
`image_features` query runs here over a parquet drop stream (binary
payload column), checkpoint-tracked so every media file is decoded
exactly once. This is the shape of a production media-ingest leg:
crawlers land payload parquet continuously; the decode stream turns
them into typed feature rows for the curation pipeline, and the
binary column never enters a shuffle (features extracted inside the
scan-side kernel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_STREAM = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_format", StringType()),
        StructField("payload", BinaryType()),
        StructField("payload_len", LongType()),
    ]
)


def read_media_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    from ..session import configure_runtime

    configure_runtime(spark)
    reader = spark.readStream.format("parquet").schema(MEDIA_STREAM)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(source_dir)


def start_image_decode_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Decode streamed PNG payloads with the REAL codec and append
    feature rows — the streaming twin of the `image_features` query."""
    from ..operators.multimodal import decode_png_features

    feats = decode_png_features(read_media_stream(spark, source_dir))
    writer = (
        feats.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
