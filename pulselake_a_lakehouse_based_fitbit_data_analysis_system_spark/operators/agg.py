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


def flag_above_quantile(
    df: DataFrame,
    value_col: str,
    q_bp: int = 9900,
    flag_col: str = "is_outlier",
    threshold_col: str = "threshold",
) -> DataFrame:
    """Exact distributed quantile flagging — the outlier-length gate of
    a corpus pipeline (drop/route docs past the p99 length) WITHOUT
    ``approx_percentile`` (engine-specific estimates) and WITHOUT a
    global sort (single-partition window over the data).

    The q-quantile of a bounded-domain column is computed from its
    VALUE HISTOGRAM: one hash agg to (value, count) — |distinct
    values| rows, metadata-scale for lengths/scores/ratings — then a
    cumulative sum over that tiny frame (the only ordered window, over
    the histogram, never the data), and the threshold is the smallest
    value whose cumulative count reaches ``q_bp`` basis points of the
    total (integer cross-multiplication — no float rounding to drift
    across engines). The threshold broadcasts back; the flag is
    map-side.

    ``q_bp`` is the quantile in basis points (9900 = p99). NULL values
    are excluded from the histogram and flagged false. Rows with
    ``value > threshold`` are flagged — at most ``1 - q_bp/10^4`` of
    the corpus by construction.
    """
    if not 0 < q_bp <= 10_000:
        raise ValueError(f"q_bp must be in (0, 10000], got {q_bp}")
    v = F.col(value_col)
    hist = (
        df.filter(v.isNotNull())
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("__cum", F.sum("__n").over(w))
    total = hist.agg(F.sum("__n").alias("__total"))
    threshold = (
        cum.crossJoin(F.broadcast(total))
        .filter(F.col("__cum") * 10_000 >= F.lit(q_bp) * F.col("__total"))
        .agg(F.min(value_col).alias(threshold_col))
    )
    return df.crossJoin(F.broadcast(threshold)).withColumn(
        flag_col, F.coalesce(v > F.col(threshold_col), F.lit(False))
    )
