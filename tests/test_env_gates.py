"""Environmental-gate probes (round-3 verdict, "Next round" #8).

Three capabilities are import/classpath-gated because this container
lacks their dependencies: delta-spark (real Delta MERGE + CDF),
google.protobuf (Spark 4 transformWithStateInPandas state server), and
the spark-sql-kafka jar (Kafka source ``.load()``). Each probe below
skips with an explicit reason today and FLIPS ON AUTOMATICALLY the
moment the container gains the dependency — no code change needed for
the gated path to get its first real execution.

Cost when skipped: one import / one classloader lookup per probe.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import Row


def _delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def _protobuf_available() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _kafka_jar_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not _delta_available(),
    reason="delta-spark absent from container — TableStore carries the "
    "MERGE/CDF semantics meanwhile (operators/merge.py); this probe "
    "runs a real DeltaTable.merge the moment `import delta` works",
)
def test_probe_delta_merge_round_trip(spark, tmp_path):
    """First real execution of operators.merge.delta_merge: create a
    Delta table, upsert via the gated MERGE path, check SCD-1 result."""
    from delta.tables import DeltaTable

    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators.merge import (
        delta_merge,
    )

    path = str(tmp_path / f"delta_{uuid.uuid4().hex[:8]}")
    spark.createDataFrame(
        [Row(k=1, v="old"), Row(k=2, v="keep")]
    ).write.format("delta").save(path)
    name = f"probe_delta_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE TABLE {name} USING delta LOCATION '{path}'")
    try:
        src = spark.createDataFrame([Row(k=1, v="new"), Row(k=3, v="ins")])
        delta_merge(
            spark,
            name,
            src,
            "a.k = b.k",
            matched_update={"v": "b.v"},
        )
        got = {
            r["k"]: r["v"] for r in DeltaTable.forName(spark, name).toDF().collect()
        }
        assert got == {1: "new", 2: "keep", 3: "ins"}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="google.protobuf absent — Spark's transformWithStateInPandas "
    "state server can't start; the applyInPandasWithState twin carries "
    "the semantics meanwhile. Flips on with protobuf installed "
    "(the state-v2 catalog query also self-registers then)",
)
def test_probe_state_v2_catalog_query(spark):
    """First real run of the transformWithStateInPandas twin: the
    catalog registers `stateful_running_totals_tws` only when protobuf
    exists; its output must match the state-v1 query's."""
    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.plans import (
        QUERIES,
    )

    sf_dir = os.environ.get("PULSELAKE_TEST_SF_DIR", "/root/testdata/sf0.001")
    assert "stateful_running_totals_tws" in QUERIES
    v2 = QUERIES["stateful_running_totals_tws"].spark(spark, sf_dir).collect()
    v1 = QUERIES["stateful_running_totals"].spark(spark, sf_dir).collect()
    assert sorted(map(tuple, v2)) == sorted(map(tuple, v1))


def test_probe_kafka_source_load(spark):
    """First real `.load()` of the Kafka source builder. Needs BOTH the
    spark-sql-kafka jar on the classpath and a reachable broker
    (PULSELAKE_KAFKA_BOOTSTRAP env); skips with the missing piece named."""
    if not _kafka_jar_available(spark):
        pytest.skip(
            "spark-sql-kafka jar not on classpath — kafka_stream builds "
            "options only (sources/kafka.py); flips on with the jar"
        )
    bootstrap = os.environ.get("PULSELAKE_KAFKA_BOOTSTRAP")
    if not bootstrap:
        pytest.skip(
            "jar present but no broker: set PULSELAKE_KAFKA_BOOTSTRAP to "
            "run a real .load() against a topic"
        )
    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.sources.kafka import (
        kafka_source_options,
        read_kafka_stream,
    )

    df = read_kafka_stream(spark, **kafka_source_options(bootstrap, "probe"))
    assert df.isStreaming
    assert {"key", "value", "topic", "partition", "offset"} <= set(df.columns)
