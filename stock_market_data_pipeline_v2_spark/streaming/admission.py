"""Streaming corpus admission: the incremental-dedup operator run
continuously over a document drop stream.

The batch twin (``operators/dedup.py:incremental_dedup_decisions``,
oracle-gated) admits one crawl against the established corpus; a
pipeline that ingests continuously wants the same contract per
micro-batch: every arriving document gets a verdict (``drop_exact`` /
``drop_neardup`` / ``keep``) against the corpus, exactly once, with
restart safety. This wrapper adds ONLY streaming mechanics — the
admission semantics are the tested batch operator applied inside
``foreachBatch`` (the same layering as the signals stream: streaming
handles delivery, a batch-gated operator handles logic, so the
correctness gate carries over instead of being re-proven).

Delivery: the file source reads each dropped file once (checkpoint-
tracked); ``foreachBatch`` output is appended partitioned by verdict,
so downstream training ingest tails ``verdict=keep`` and the drop
partitions stay audit-readable. At 100 TB the corpus argument is the
persisted hash/shingle index tables (see the operator's docstring),
not a re-scanned corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import LongType, StringType, StructField, StructType

DOC_STREAM = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def read_document_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-drop document source (Kafka-equivalent contract, like
    read_tick_stream)."""
    from ..session import configure_runtime

    configure_runtime(spark)
    reader = spark.readStream.format("json").schema(DOC_STREAM)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(source_dir)


def start_admission_stream(
    spark: SparkSession,
    source_dir: str,
    corpus: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    max_shingle_freq: int | None = 1000,
    available_now: bool = True,
) -> StreamingQuery:
    """Admit streamed documents against ``corpus``; append verdict
    rows (doc_id, verdict, match_doc_id, jaccard, text) to ``out_dir``
    partitioned by verdict."""
    from ..operators.dedup import (
        incremental_dedup_decisions,
        release_cached_inputs,
    )

    docs = read_document_stream(spark, source_dir)

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        decisions = incremental_dedup_decisions(
            corpus,
            batch_df,
            threshold=threshold,
            max_shingle_freq=max_shingle_freq,
        )
        out = decisions.join(batch_df.select("doc_id", "text"), "doc_id")
        out.write.mode("append").partitionBy("verdict").parquet(out_dir)
        release_cached_inputs(decisions)

    writer = (
        docs.writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
