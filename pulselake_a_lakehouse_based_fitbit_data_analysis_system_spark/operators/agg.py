"""Grouped aggregation, multi-dimensional rollups, sessionization.

- ``session_stats`` — the gold-layer aggregation (A1,
  ``Gold/06-gold.py:93-95``): min/avg/max/count per session key.
  Catalyst plans it as partial (map-side) + final hash aggregation, so
  the shuffle carries one row per (key, partition).
- ``rollup_stats`` / ``cube_stats`` — the dashboards' "by age × by
  state × by gender" slices (SURVEY §2.4 note) as one pass instead of
  N separate groupBys.
- ``sessionize`` — gaps-and-islands sessionization (lag + cumulative
  sum), the batch analog of ``session_window``; the reference instead
  *declares* sessions via start/stop events (J3), which we also keep.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def session_stats(
    df: DataFrame, keys: Sequence[str], value: str = "heartrate"
) -> DataFrame:
    """min/avg/max/count of ``value`` per key — reference A1
    (``Gold/06-gold.py:93-95``)."""
    return df.groupBy(*keys).agg(
        F.min(value).alias(f"min_{value}"),
        F.avg(value).alias(f"avg_{value}"),
        F.max(value).alias(f"max_{value}"),
        F.count(value).alias("num_recordings"),
    )


def rollup_stats(
    df: DataFrame, dims: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """GROUP BY ROLLUP(dims) — hierarchical subtotals in one shuffle."""
    return df.rollup(*dims).agg(*aggs)


def cube_stats(df: DataFrame, dims: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """GROUP BY CUBE(dims) — all dimension subsets in one pass."""
    return df.cube(*dims).agg(*aggs)


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    gap: str = "interval 30 minutes",
) -> DataFrame:
    """Gap-based sessionization: events closer than ``gap`` within a key
    chain into one session. Two window passes over the same (keys, time)
    partitioning — one shuffle total:

        new_session = ts - lag(ts) > gap          (per key, time order)
        session_no  = running sum of new_session
        → groupBy(keys, session_no): start/end/count

    Emits session_start, session_end (last event time), n_events.
    The streaming analog is ``F.session_window`` (``streaming.pipeline``).
    """
    w = Window.partitionBy(*keys).orderBy(time_col)
    t = F.col(time_col)
    is_new = F.when(
        t > F.lag(t).over(w) + F.expr(gap), F.lit(1)
    ).otherwise(F.lit(0))
    # first row per key: lag is NULL → comparison NULL → otherwise(0);
    # the cumulative sum still starts a session at 0 for it.
    with_session = df.withColumn(
        "__session_no",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_session.groupBy(*keys, "__session_no")
        .agg(
            F.min(time_col).alias("session_start"),
            F.max(time_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumnRenamed("__session_no", "session_no")
    )
