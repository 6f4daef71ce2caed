"""Behavioral / product analytics over event streams.

The reference's gold layer answers "what did each session do"
(``Gold/06-gold.py``); these operators answer the next questions a
warehouse gets asked of the same events table — funnel conversion,
cohort retention, and transition graphs — each shaped for a
partitioned 100 TB event log:

- ``funnel_conversion`` — STRICT ordered funnels (each step must
  happen after the previous step's first occurrence), computed as a
  cascade of per-step min-aggregations + equi-joins on the user key.
  Each step filters to one event type BEFORE its shuffle, so stage N
  shuffles only step-N events of users who survived step N-1 — the
  input shrinks monotonically, never a sort of the whole log.
- ``cohort_retention`` — users bucketed by first-seen week, activity
  counted per (cohort, week offset): one agg for first-seen, one
  shuffle join back on user_id (both sides keyed and data-sized — the
  one genuinely big join here), one count-distinct rollup.
- ``event_transitions`` — Markov transition counts (prev type → next
  type): a lag window partitioned per user. Per-user partitions keep
  every window tiny; the deterministic (ts, event_id) tie-break makes
  the result exact under any physical row order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_conversion(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
) -> DataFrame:
    """Strict ordered funnel: a user converts step i only with an
    event of type ``steps[i]`` strictly after their first qualifying
    step-(i-1) event. Emits (step_no, step, n_users) with step_no
    1-based; n_users is non-increasing by construction.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, step in enumerate(steps):
        ev = df.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("__u"), F.col(time_col).alias("__ts")
        )
        if prev is None:
            cur = ev.groupBy("__u").agg(F.min("__ts").alias("__t"))
        else:
            cur = (
                ev.join(prev, "__u")
                .filter(F.col("__ts") > F.col("__t"))
                .groupBy("__u")
                .agg(F.min("__ts").alias("__t"))
            )
        reached.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("step_no"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
        prev = cur
    out = reached[0]
    for r in reached[1:]:
        out = out.unionByName(r)
    return out


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    max_weeks: int = 4,
) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event; for each (cohort_week, week offset 0..max_weeks-1)
    the number of distinct users active that week. Week = floor
    days-since-epoch / 7 (engine-neutral integer arithmetic — no
    date_trunc semantics to disagree on).
    """
    # F.floor, not a bare cast: cast("long") truncates toward zero,
    # diverging from the oracle's floor() for pre-1970 timestamps
    # (negative day counts) — ADVICE r4
    week = F.floor(
        F.datediff(F.col(time_col).cast("date"), F.lit("1970-01-01")) / 7
    ).cast("long")
    ev = df.select(F.col(user_col).alias("__u"), week.alias("__w"))
    first = ev.groupBy("__u").agg(F.min("__w").alias("cohort_week"))
    return (
        ev.join(first, "__u")
        .withColumn("week_offset", F.col("__w") - F.col("cohort_week"))
        .filter(F.col("week_offset") < max_weeks)
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("__u").alias("n_active"))
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Markov transition counts: for each user's event sequence in
    (time, id) order, count (prev_type, next_type) adjacencies across
    the whole log. One window shuffle partitioned by user (per-user
    frames stay small at any scale), one hash-agg rollup.
    """
    w = Window.partitionBy(user_col).orderBy(time_col, id_col)
    return (
        df.withColumn("__prev", F.lag(type_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(F.col("__prev").alias("prev_type"), F.col(type_col).alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
