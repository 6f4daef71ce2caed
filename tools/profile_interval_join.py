"""Profile the bench's streaming_interval_join drain: full per-batch
durationMs + stateOperators breakdown, so the slow component is
attributed instead of guessed (guide §1). Run:

    python tools/profile_interval_join.py [sf_dir] [cpus]
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = sys.argv[2] if len(sys.argv) > 2 else "32"

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("profile-interval-join")
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


stats: dict = {}
t0 = time.perf_counter()
sink = stream_ops.run_stream_to_memory(build(), stats_out=stats, timeout_sec=300)
n = sink.count()
wall = time.perf_counter() - t0
print(f"wall={wall:.2f}s out={n} state_partitions={stats.get('state_partitions')}")

# full progress dump from the LAST drained query
q = None
for query in spark.streams.active:
    q = query
last = spark.sparkContext  # placeholder
# recentProgress of the finished query is not reachable here; re-drain
# with a direct handle instead:
name = f"prof_{int(time.time())}"
df = build()
sp = stats.get("state_partitions")
if sp:
    spark.conf.set("spark.sql.shuffle.partitions", str(sp))
t0 = time.perf_counter()
q = (
    df.writeStream.format("memory")
    .queryName(name)
    .outputMode("append")
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination(300)
wall2 = time.perf_counter() - t0
print(f"second drain wall={wall2:.2f}s out={spark.table(name).count()}")
for p in q.recentProgress:
    if p["numInputRows"] == 0:
        continue
    dur = p["durationMs"]
    ops = p.get("stateOperators") or []
    so = {
        "rowsTotal": sum(o.get("numRowsTotal", 0) for o in ops),
        "updated": sum(o.get("numRowsUpdated", 0) for o in ops),
        "upd_ms": sum(o.get("allUpdatesTimeMs", 0) for o in ops),
        "rm_ms": sum(o.get("allRemovalsTimeMs", 0) for o in ops),
        "commit_ms": sum(o.get("commitTimeMs", 0) for o in ops),
        "mem_used": sum(o.get("memoryUsedBytes", 0) for o in ops),
    }
    custom = {}
    for o in ops:
        for k, v in (o.get("customMetrics") or {}).items():
            custom[k] = custom.get(k, 0) + v
    print(json.dumps({"in": p["numInputRows"], "dur": dur, "state": so}))
    print("  custom:", json.dumps(custom))
spark.stop()
