"""Bucketed ingest — the zero-shuffle co-located join path.

SCALE.md's standing prescription for the orders⋈lineitem spine at
100 TB is "bucket both fact tables by orderkey at ingest and the join
shuffles disappear". This module is that prescription as code: ingest
writes a managed table with ``bucketBy(n, keys)`` (hive-compatible
bucket files + bucket spec in the catalog), and a later join between
two tables bucketed the same way on the join keys plans a sort-merge
join with NO Exchange on either side — the rows are already
co-located by bucket file. ``sortBy`` additionally pre-sorts within
buckets so single-file buckets skip the Sort too.

The reference's equivalent knob is Delta's OPTIMIZE/ZORDER +
partitioning (reference ``Setup/02-setup.py:71`` week_part); classic
Spark bucketing is the OSS mechanism for *join* co-location, which
partitioning alone does not give (partition pruning prunes scans, but
a partition-dir layout does not align shuffle hash buckets).

Plan-shape tested: ``tests/test_plan_shapes.py::
test_bucketed_join_has_no_exchange`` asserts the co-bucketed join
plans zero Exchange while the identical plain-parquet join plans two.

At 100 TB: pick n_buckets so one bucket of the LARGER table is a few
hundred MB (e.g. 100 TB lineitem → ~256k buckets); every incremental
ingest into the same table must use the same spec (Spark enforces
this for saveAsTable appends).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def ingest_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a managed parquet table bucketed (and by default
    sorted) on ``bucket_cols`` — the ingest-side half of a zero-shuffle
    join. Joins between tables bucketed with the SAME column set and
    bucket count need no Exchange."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table WITH its bucket spec (a raw parquet path
    read would lose it and re-shuffle on join)."""
    return spark.table(table_name)
