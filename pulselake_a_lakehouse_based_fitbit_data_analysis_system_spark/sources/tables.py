"""Batch table loading for the driver testdata and engine tables.

The reference's batch scans are ``spark.read.table`` / ``spark.table``
(``Silver/05-silver.py:325,431``; ``Gold/06-gold.py:84``) plus raw-path
reads (``Setup/03-history-loader.py:16-18``). Here tables live as
parquet files under a directory; loading is a plain columnar scan so
Catalyst's pushdown/pruning applies end to end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one table; filters/projections push down.

    Arrow-written TIMESTAMP(NANOS) columns surface as long under
    ``spark.sql.legacy.parquet.nanosAsLong`` — convert them back to
    timestamps (truncating to micros, matching DuckDB's read) right at
    the source so the rest of the engine sees proper event-time types.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        meta_ts = name == "events" and field.name == "ts"
        if meta_ts and isinstance(field.dataType, T.LongType):
            # integer division: truncate nanos→micros exactly like
            # DuckDB's reader (double division would round half the rows
            # one micro off and break value-hash parity)
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"`{field.name}` div 1000")),
            )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register each table as a temp view so the SQL API works too."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def ensure_min_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Guarded repartition for CPU-heavy map stages: a small table can
    arrive as ONE input split (a single parquet file under
    maxPartitionBytes), which serializes every downstream per-row
    computation onto one core — measured on the MinHash pipeline: 5M
    md5 calls in one task while 31 cores idle. If the frame's planned
    partition count is below the session's default parallelism,
    repartition up to it; otherwise (the 100 TB case — inputs arrive
    as thousands of splits) this is a no-op, so the extra exchange is
    only ever paid where it buys a multiple of the cores back. The
    partition-count probe converts the plan, not the data.
    """
    sc = df.sparkSession.sparkContext
    t = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < t:
        return df.repartition(t)
    return df
