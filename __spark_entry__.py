"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the engine package; this module only adapts
the catalog (``plans.catalog.QUERIES``) to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.plans import (
    QUERIES,
)


def _prepare(spark: SparkSession) -> None:
    """Confs the engine needs that the driver's session may not carry.

    nanosAsLong lets Spark read the testdata's TIMESTAMP(NANOS) parquet
    columns (converted back to timestamps in sources.tables).
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # correctness runs are sf<=0.01: 200 default shuffle partitions
        # means 200 near-empty tasks per streaming stage (no AQE
        # coalescing in streaming); 32 matches the engine session
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    except Exception:
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-user event stats +
    broadcast customer-dimension join (the reference's gold
    workout_bpm_summary shape)."""
    _prepare(spark)
    return QUERIES["session_stats_dim"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators.cache import (
        release_pinned,
    )

    def bind(name: str) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            # release the PREVIOUS query's tracked persists (the driver
            # materializes each result before building the next query)
            release_pinned()
            return QUERIES[name].spark(spark, sf_dir)

        run.__name__ = f"q_{name}"
        run.__doc__ = QUERIES[name].doc
        return run

    return {name: bind(name) for name in QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: q.oracle for name, q in QUERIES.items() if q.oracle is not None
    }
