"""A/B state-partition counts and store providers for the bench's
streaming_interval_join drain (guide §5). Min-of-2 drains per variant,
one session, output count asserted identical."""

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = sys.argv[2] if len(sys.argv) > 2 else "32"

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("ab-interval-join")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.streaming import (  # noqa: E402
    ops as stream_ops,
)


def build():
    starts = (
        stream_ops.stream_table(spark, SF_DIR, "events", n_files=8)
        .filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("event_id").alias("start_id"),
            F.col("ts").alias("start_ts"),
        )
    )
    stops = (
        stream_ops.stream_table(spark, SF_DIR, "events", n_files=8)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("end_id"),
            F.col("ts").alias("end_ts"),
        )
    )
    return stream_ops.streaming_interval_join(
        starts,
        stops,
        ["user_id"],
        start_time="start_ts",
        end_time="end_ts",
        max_interval="interval 3 hours",
        watermark="365 days",
        closed="open",
    ).select(
        F.col("s.user_id").alias("user_id"),
        "start_id",
        "end_id",
        "start_ts",
        "end_ts",
    )


def calibrate() -> float:
    t0 = time.perf_counter()
    spark.range(50_000_000).selectExpr("sum(id)").collect()
    return time.perf_counter() - t0


def drain(parts: int | None, provider: str | None) -> tuple[float, int, float]:
    saved_prov = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    if provider:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    best = None
    n = -1
    for _ in range(2):
        stats: dict = {}
        t0 = time.perf_counter()
        sink = stream_ops.run_stream_to_memory(
            build(), stats_out=stats, state_partitions=parts
        )
        n = sink.count()
        w = time.perf_counter() - t0
        sm = sum(stats.get("state_ms") or [0])
        if best is None or w < best[0]:
            best = (w, n, sm)
    if provider:
        if saved_prov:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", saved_prov
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    return best


ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
variants = [
    ("p10-hdfs (auto today)", 10, None),
    ("p6-hdfs", 6, None),
    ("p4-hdfs", 4, None),
    ("p3-hdfs", 3, None),
    ("p16-hdfs", 16, None),
    ("p10-rocksdb", 10, ROCKS),
    ("p4-rocksdb", 4, ROCKS),
]
print(f"cal={calibrate():.3f}")
for label, parts, prov in variants:
    w, n, sm = drain(parts, prov)
    print(f"{label:24s} wall={w:6.2f}s out={n} state_ms_sum={sm}")
print(f"cal={calibrate():.3f}")
spark.stop()
