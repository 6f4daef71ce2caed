"""Time-series operators: bucketed series, sliding-window aggregation,
and similarity search against a reference series.

The similarity shape follows the distributed time-series
similarity-search literature (e.g. "Time Series Similarity Search for
Streaming Data in Distributed Systems", EDBT 2019 — public paper):
align series on time buckets, compare against a *reference* series
broadcast to the data — a linear scan, never an all-pairs self-join.
Pearson correlation is computed from explicitly-accumulated moment
sums (n, Σx, Σy, Σx², Σy², Σxy) so the Spark plan and the DuckDB
oracle evaluate the *identical* closed-form expression — engine
built-in ``corr()`` implementations differ in update order and are
not bit-comparable.

All pure Column expressions; no UDFs, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_series(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Regularize an event stream into a per-key time series: one row
    per (key, time bucket) with the bucket-mean value, rounded to 6 so
    downstream moment sums start from oracle-identical inputs."""
    return (
        events.groupBy(
            F.col(key_col).alias("series_key"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        )
        .agg(F.round(F.avg(value_col), 6).alias("v"))
    )


def sliding_window_stats(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    width: str = "1 hour",
    slide: str = "30 minutes",
    mean: str | bool = "avg",
) -> DataFrame:
    """Overlapping (sliding) window aggregation via ``F.window`` — the
    hopping-window shape from the Structured Streaming paper (SIGMOD
    2018). Each event lands in ``width/slide`` windows; windows are
    epoch-aligned, so the result is deterministic and the identical
    expression runs under a streaming read with a watermark. One
    shuffle on (window, group); the window expansion is map-side.

    ``mean`` picks the mean semantics (``"avg"`` / ``"micro_truncated"``;
    the legacy spellings ``"true"`` and boolean ``True`` are accepted as
    ``"avg"`` so callers passing a real bool don't trip a stringly-typed
    comparison):

    - ``"avg"`` (default): the standard ``F.avg``, rounded to 5
      decimals — what a user means by "average". 5 decimals absorbs
      the last-ulp aggregation-order wobble of an IEEE double sum for
      cross-engine comparison (at 6 decimals, 2/7205 windows flipped
      between Spark's partial-agg order and DuckDB's at sf0.1).
    - ``"micro_truncated"``: values floored to integer micro-units
      before summing (an integer sum is associative, so the value is
      bit-identical on any partitioning/engine/retry), mean floored
      back to micro-units. Emitted as ``avg_value_micro_truncated`` —
      the name says it is NOT the standard mean (biased low by up to
      1e-6): use it where byte-stable replay comparison matters more
      than the last decimal, e.g. golden-file regression gates.
    """
    win = F.window(F.col(ts_col), width, slide)
    if mean is True or mean in ("true", "avg"):
        mean_agg = F.round(F.avg(value_col), 5).alias("avg_value")
    elif mean == "micro_truncated":
        mean_agg = None  # computed from the micro sum below
    else:
        raise ValueError(
            f"unknown mean={mean!r}; expected 'avg' or 'micro_truncated'"
        )
    micro = F.floor(F.col(value_col) * F.lit(1_000_000.0)).cast("long")
    grouped = events.groupBy(win.alias("win"), F.col(group_col))
    if mean_agg is not None:
        agged = grouped.agg(
            F.count(F.lit(1)).alias("n_events"), mean_agg
        )
        value_cols = ["n_events", "avg_value"]
    else:
        agged = grouped.agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(micro).alias("__sum_micro"),
        ).withColumn(
            "avg_value_micro_truncated",
            F.floor(F.col("__sum_micro") / F.col("n_events"))
            / F.lit(1_000_000.0),
        )
        value_cols = ["n_events", "avg_value_micro_truncated"]
    return agged.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        group_col,
        *value_cols,
    )


def corr_to_reference(
    events: DataFrame,
    reference_key,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
    min_common: int = 5,
) -> DataFrame:
    """Similarity search: Pearson correlation of every key's bucketed
    series against the ``reference_key`` series.

    Scale shape: the reference series is a few-hundred-row DataFrame —
    broadcast it and equi-join on the time bucket, so the cost is one
    linear pass over the bucketed series (never an all-pairs series
    self-join; pairwise-all-users is quadratic in keys and belongs
    behind a cohort cap if ever needed). Moment sums accumulate in one
    grouped agg; the correlation is the textbook closed form
    ``(nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))`` evaluated
    identically by the oracle. Degenerate series (zero variance on the
    common support) are filtered on both sides before the division.

    Returns (series_key, n_common, corr) for keys sharing at least
    ``min_common`` buckets with the reference.
    """
    from .joins import maybe_broadcast

    series = bucketed_series(events, key_col, ts_col, value_col, bucket)
    ref = series.filter(F.col("series_key") == F.lit(reference_key)).select(
        "bucket", F.col("v").alias("ref_v")
    )
    sums = (
        series.filter(F.col("series_key") != F.lit(reference_key))
        # one row per bucket of ONE key — ordinarily tiny, but the hint
        # is size-guarded like every dim hint (a decade of 1 s buckets
        # would be ~10^8 rows; past the guard AQE decides)
        .join(maybe_broadcast(ref), "bucket")
        .groupBy("series_key")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum("v").alias("sx"),
            F.sum("ref_v").alias("sy"),
            F.sum(F.col("v") * F.col("v")).alias("sxx"),
            F.sum(F.col("ref_v") * F.col("ref_v")).alias("syy"),
            F.sum(F.col("v") * F.col("ref_v")).alias("sxy"),
        )
    )
    varx = F.col("n_common") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n_common") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n_common") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        sums.filter(
            (F.col("n_common") >= min_common)
            & (varx > F.lit(1e-9))
            & (vary > F.lit(1e-9))
        )
        .withColumn("corr", F.round(cov / (F.sqrt(varx) * F.sqrt(vary)), 6))
        .select("series_key", "n_common", "corr")
    )


def locf_fill(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    filled_col: str | None = None,
) -> DataFrame:
    """Last-observation-carried-forward gap filling: NULLs in
    ``value_col`` take the most recent non-NULL value within the same
    key, in ``order_cols`` order (include a unique id as the final
    order column for a total order — exactness under any physical row
    layout depends on it). Leading NULLs (no prior observation) stay
    NULL.

    One window shuffle partitioned by key — frames stay key-sized at
    any scale, the same skew posture as any per-entity window. The fill
    itself is ``last(value, ignorenulls=true)`` over the running frame,
    a single pass with O(1) state per row.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = filled_col or f"{value_col}_filled"
    return df.withColumn(out, F.last(value_col, ignorenulls=True).over(w))


def merge_intervals(
    df: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Flatten overlapping/touching intervals per key into maximal
    disjoint episodes (the warehouse 'coverage' problem: contract
    validity, sensor uptime, session stitching).

    Gaps-and-islands with a RUNNING MAX instead of a lag: an interval
    starts a new episode iff its start exceeds the max end seen so far
    (handles nested intervals that a plain lag-based rule gets wrong).
    Two window passes over one (keys, start) partitioning — a single
    shuffle; per-key frames, no global sort. Emits one row per episode
    with its span and member count.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        F.col(start_col) > prev_max_end, F.lit(1)
    ).otherwise(F.lit(0))  # first row: NULL comparison → 0, episode 0
    episodes = df.withColumn(
        "__ep",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        episodes.groupBy(*keys, "__ep")
        .agg(
            F.min(start_col).alias("episode_start"),
            F.max(end_col).alias("episode_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .withColumnRenamed("__ep", "episode_no")
    )


def densify_periods(
    df: DataFrame,
    group_col: str,
    period_col: str,
    agg_col: str = "n",
) -> DataFrame:
    """Dimension densification: a (group, period, count) series gains
    explicit ZERO rows for every period in the global [min, max] range
    that a group has no data for — what every dashboard/forecasting
    consumer needs before resampling or windowing.

    The grid is |groups| × |periods| — metadata-scale however big the
    underlying data was (the inputs here are already aggregated). The
    period spine is ``sequence(min, max)`` from a 1-row bounds
    aggregate (exploded — a few thousand rows at most), cross-joined
    with the distinct groups (broadcast — both sides tiny), then the
    real counts left-join in. No data-sized operation anywhere.
    """
    from pyspark.sql.window import Window  # noqa: F401  (kept for symmetry)

    bounds = df.agg(
        F.min(period_col).alias("__lo"), F.max(period_col).alias("__hi")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias(period_col)
    )
    groups = df.select(group_col).distinct()
    grid = groups.crossJoin(F.broadcast(spine))
    return grid.join(df, [group_col, period_col], "left").withColumn(
        agg_col, F.coalesce(F.col(agg_col), F.lit(0))
    )


def interpolate_series(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    step: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Resample an irregular series onto a regular grid with LINEAR
    interpolation — the feature-prep step before windowing/correlating
    sensor data. ``time_col`` must be an integer axis (epoch seconds);
    grid points are the multiples of ``step`` inside each key's
    observed range.

    Shape: per-key bounds agg → grid explode (``sequence`` — grid
    density is caller-bounded) → ONE union with the observations →
    two window passes over the same (key, time) partitioning (forward
    pass carries the previous observation, backward pass the next) —
    a single shuffle; frames stay key-sized. Grid points landing
    exactly on an observation take its value (observations sort before
    grid points at equal time). Grid points outside the observed range
    of a key do not exist by construction.

    Duplicate timestamps make ROWS-frame windows order-dependent:
    pass ``tiebreak_col`` (a unique id) so which same-second
    observation the interpolation anchors on is deterministic — and
    identical in the SQL oracle.
    """
    from pyspark.sql.window import Window

    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    t, v = F.col(time_col), F.col(value_col)
    tb = (
        F.col(tiebreak_col).cast("long")
        if tiebreak_col is not None
        else F.lit(0).cast("long")
    )
    obs = df.filter(t.isNotNull() & v.isNotNull()).select(
        F.col(key_col).alias("__k"), t.alias("__t"), v.alias("__v"),
        F.lit(1).alias("__is_obs"), tb.alias("__tb"),
    )
    bounds = obs.groupBy("__k").agg(
        F.min("__t").alias("__lo"), F.max("__t").alias("__hi")
    )
    grid_start = (F.floor((F.col("__lo") + step - 1) / step) * step).cast("long")
    grid = bounds.select(
        "__k",
        F.explode(
            F.when(
                grid_start <= F.col("__hi"),
                F.sequence(grid_start, F.col("__hi"), F.lit(step)),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("__t"),
    ).select("__k", "__t", F.lit(None).cast("double").alias("__v"),
             F.lit(0).alias("__is_obs"), F.lit(-1).cast("long").alias("__tb"))
    u = obs.unionByName(grid)
    wf = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_obs").desc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wb = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_obs").desc(), F.col("__tb").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    masked_t = F.when(F.col("__is_obs") == 1, F.col("__t"))
    with_bounds = (
        u.withColumn("__pv", F.last("__v", ignorenulls=True).over(wf))
        .withColumn("__pt", F.last(masked_t, ignorenulls=True).over(wf))
        .withColumn("__nv", F.first("__v", ignorenulls=True).over(wb))
        .withColumn("__nt", F.first(masked_t, ignorenulls=True).over(wb))
    )
    # exact hit (grid point on an observation — including the key's
    # LAST observation, where no forward neighbour exists) takes the
    # observed value; interior grid points always have both neighbours
    interp = F.when(F.col("__pt") == F.col("__t"), F.col("__pv")).otherwise(
        F.col("__pv")
        + (F.col("__nv") - F.col("__pv"))
        * (F.col("__t") - F.col("__pt"))
        / (F.col("__nt") - F.col("__pt"))
    )
    return (
        with_bounds.filter(F.col("__is_obs") == 0)
        .select(
            F.col("__k").alias(key_col),
            F.col("__t").alias("grid_t"),
            F.round(interp, 6).alias("v_interp"),
        )
    )
