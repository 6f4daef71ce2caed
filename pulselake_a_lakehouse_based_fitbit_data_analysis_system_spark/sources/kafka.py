"""Kafka source/archiver configuration (reference S3/S10).

The reference consumes a SASL_SSL Kafka topic into a landing zone
(``Ingestion/11-Kafka-Consumer.py:41-56``) so the lakehouse never
depends on broker availability, then bronze re-reads the JSON files.
This module builds the equivalent OSS reader; the container has no
Kafka broker or spark-sql-kafka jar, so construction is gated — the
plan/options logic is unit-testable, ``.load()`` is not.

No credentials are ever embedded here (the reference hard-codes theirs
at ``Ingestion/11-Kafka-Consumer.py:27-30``); pass them via options.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 1_000_000,
    fail_on_data_loss: bool = False,
    sasl_jaas: str | None = None,
) -> dict[str, str]:
    """Option dict mirroring reference ``11-Kafka-Consumer.py:41-56``."""
    opts: dict[str, Any] = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if sasl_jaas:
        opts.update(
            {
                "kafka.security.protocol": "SASL_SSL",
                "kafka.sasl.mechanism": "PLAIN",
                "kafka.sasl.jaas.config": sasl_jaas,
            }
        )
    return {k: str(v) for k, v in opts.items()}


def read_kafka_stream(spark: SparkSession, **options: str) -> DataFrame:
    """Streaming Kafka envelope scan: (key,value,topic,partition,offset,
    timestamp) — same columns the reference's multiplex bronze table
    stores (``Bronze/04-bronze.py:76``). Requires the
    spark-sql-kafka package on the classpath (not in this container)."""
    reader = spark.readStream.format("kafka")
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load()
    return df.select(
        F.col("key").cast("string"),
        F.col("value").cast("string"),
        "topic",
        "partition",
        "offset",
        (F.col("timestamp").cast("double") * 1000).cast("long").alias("timestamp"),
    )
