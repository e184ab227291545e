"""Kafka stream source: the reference's Kafka adapter re-expressed on
Structured Streaming.

Reference design (kafka/src/main/java/org/apache/calcite/adapter/kafka/):
``KafkaStreamTable.java`` exposes a topic as a streamable table whose row
shape is decided by a pluggable ``KafkaRowConverter`` (KafkaRowConverter
.java:41-50 — ``rowDataType(topic)`` + ``toRow(ConsumerRecord)``); the
default ``KafkaRowConverterImpl`` emits
MSG_PARTITION / MSG_TIMESTAMP / MSG_OFFSET / MSG_KEY_BYTES /
MSG_VALUE_BYTES (KafkaRowConverterImpl.java:37-67).

Spark-first mapping: ``spark.readStream.format("kafka")`` already yields
the consumer-record shape (key/value binary + topic/partition/offset/
timestamp/timestampType); a *row converter* is therefore just a
DataFrame→DataFrame function over that fixed schema — declarative column
algebra instead of a per-record ``toRow`` callback, so conversion runs
JVM-side in whole-stage codegen, not in a Python loop.

Container caveat: the kafka-sql connector jars and a broker are NOT
available here, so ``kafka_stream`` raises ``KafkaConnectorUnavailable``
with the exact spark-submit coordinates when the format is missing. The
converter surface — the part the reference actually defines — is fully
exercised against ``kafka_shaped_*`` stand-ins: any DataFrame (batch or
readStream) in the consumer-record schema, which is byte-for-byte what
the real source produces. Swapping the stand-in for
``format("kafka")`` changes nothing downstream.

Scale notes: conversion is map-only (no shuffle); at 100 TB/day the
topic's partition count bounds read parallelism exactly as in any Kafka
deployment, and ``minPartitions`` can oversplit hot partitions. Offsets/
checkpoints are the sink's concern (streaming/core.run_available_now or
a checkpointed writeStream), not the converter's.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# The row shape spark's kafka source yields (and KafkaMessageEnumerator
# consumes reference-side): one row per ConsumerRecord.
KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int"
)

RowConverter = Callable[[DataFrame], DataFrame]


class KafkaConnectorUnavailable(RuntimeError):
    """The spark-sql-kafka connector is not on the classpath (this
    container ships no broker or connector jars)."""


def default_row_converter(records: DataFrame) -> DataFrame:
    """KafkaRowConverterImpl parity (KafkaRowConverterImpl.java:37-67):
    raw bytes through, consumer metadata typed. MSG_TIMESTAMP is epoch
    millis BIGINT — the unit ``ConsumerRecord.timestamp()`` carries."""
    return records.select(
        F.col("partition").alias("MSG_PARTITION"),
        F.unix_millis(F.col("timestamp")).alias("MSG_TIMESTAMP"),
        F.col("offset").alias("MSG_OFFSET"),
        F.col("key").alias("MSG_KEY_BYTES"),
        F.col("value").alias("MSG_VALUE_BYTES"),
    )


def json_value_converter(value_schema: str,
                         *, keep_key: bool = False) -> RowConverter:
    """A typed converter (the pluggable half of KafkaRowConverter.java):
    decode UTF-8 JSON value bytes into columns of ``value_schema``.
    Decode is `from_json` — JVM Jackson, not a Python UDF."""
    def convert(records: DataFrame) -> DataFrame:
        cols: list[Column] = [
            F.col("partition").alias("MSG_PARTITION"),
            F.unix_millis(F.col("timestamp")).alias("MSG_TIMESTAMP"),
            F.col("offset").alias("MSG_OFFSET"),
        ]
        if keep_key:
            cols.append(F.col("key").cast("string").alias("MSG_KEY"))
        parsed = F.from_json(F.col("value").cast("string"), value_schema)
        return records.select(*cols, parsed.alias("v")).select("*", "v.*") \
            .drop("v")
    return convert


def kafka_stream(spark: SparkSession, bootstrap_servers: str, topic: str,
                 *, converter: RowConverter = default_row_converter,
                 starting_offsets: str = "earliest",
                 **options: str) -> DataFrame:
    """KafkaStreamTable.stream(): a streaming DataFrame over a topic,
    shaped by ``converter``. Raises KafkaConnectorUnavailable when the
    connector jars are absent (this container)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        records = reader.load()
    except Exception as e:  # DATA_SOURCE_NOT_FOUND: kafka
        raise KafkaConnectorUnavailable(
            "spark-sql-kafka connector not on the classpath; launch with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark "
            "version> against a reachable broker"
        ) from e
    return converter(records)


def kafka_shaped_records(df: DataFrame, *, topic: str, key: Column,
                         value: Column, partition: Column, offset: Column,
                         timestamp: Column) -> DataFrame:
    """Encode arbitrary rows into the consumer-record shape — the
    test-harness producer (what KafkaTableFactory's mock consumer does
    reference-side). ``key``/``value`` are string columns, encoded UTF-8;
    the result's schema is exactly KAFKA_SOURCE_SCHEMA, so converters and
    every downstream stage run unmodified against it."""
    return df.select(
        F.encode(key, "UTF-8").alias("key"),
        F.encode(value, "UTF-8").alias("value"),
        F.lit(topic).alias("topic"),
        partition.cast("int").alias("partition"),
        offset.cast("bigint").alias("offset"),
        timestamp.cast("timestamp").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def kafka_shaped_stream(spark: SparkSession, path: str,
                        *, converter: RowConverter = default_row_converter,
                        ) -> DataFrame:
    """A REAL readStream in the consumer-record schema, backed by parquet
    files at ``path`` (written via kafka_shaped_records): the live-stream
    stand-in for broker-less environments. Everything after ``load()`` is
    identical to ``kafka_stream``."""
    records = (
        spark.readStream.schema(KAFKA_SOURCE_SCHEMA).parquet(path)
    )
    return converter(records)
