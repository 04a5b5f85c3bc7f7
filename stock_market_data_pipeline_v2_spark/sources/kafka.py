"""Kafka boundary (SURVEY.md §2.1 S4/S5).

The reference moves records through Kafka as JSON keyed by symbol
(producers ``stream_data_producer.py:47-62`` /
``batch_data_producer.py:47-64``; consumers poll-loop and regroup by
key, ``batch_data_consumer.py:43-72``). Spark-native, the whole
producer/consumer layer is two plan fragments:

- sink: ``serialize_for_kafka`` → ``writeStream.format("kafka")``
- source: ``spark.readStream.format("kafka")`` → ``parse_kafka_json``

The JSON ser/de transforms are plain batch-testable expressions; the
broker binding needs the spark-sql-kafka package and a broker, neither
present in this environment, so :func:`read_kafka_stream` /
:func:`write_kafka_stream` raise a clear error if the package is
missing rather than failing deep inside Spark. The file-drop source in
streaming/jobs.py carries the same contract without a broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def serialize_for_kafka(df: DataFrame, key_col: str = "symbol") -> DataFrame:
    """S4: rows → (key, value) JSON pairs, key = partition key so a
    symbol's ticks land in one Kafka partition (ordering per key)."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )


def parse_kafka_json(raw: DataFrame, schema: StructType) -> DataFrame:
    """S5: Kafka (key, value-bytes) → typed columns via from_json."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r")
    ).select("r.*")


def _require_kafka(spark: SparkSession) -> None:
    try:
        spark._jvm.org.apache.spark.sql.kafka010.KafkaSourceProvider  # noqa: SLF001
    except Exception as exc:  # noqa: BLE001
        raise RuntimeError(
            "spark-sql-kafka package not on the classpath; submit with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "or use the file-drop source (streaming/jobs.py)"
        ) from exc


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    schema: StructType,
    starting_offsets: str = "latest",
) -> DataFrame:
    _require_kafka(spark)
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_kafka_json(raw, schema)


def write_kafka_stream(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str = "symbol",
):
    _require_kafka(df.sparkSession)
    return (
        serialize_for_kafka(df, key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
