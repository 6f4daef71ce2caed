"""Deterministic sampling & dataset splitting for training pipelines.

Every assignment derives from the portable md5 hash of the row's id
(``functions.expressions.portable_hash64``) — no RNG state, stable
under repartition/replay/retry (``rand()`` is none of those), identical
in any ANSI engine, so splits are oracle-checkable and reproducible
across runs. This is the standard trick for train/val/test assignment
at corpus scale: the split travels with the KEY, not with the run.

All map-side column expressions — zero shuffle; a split/sample never
costs more than the scan.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.expressions import portable_hash64

# granularity of hash partitioning for fractions (1 bp = 0.01%)
_BUCKETS = 10_000


def _hash_bucket(id_col: Column | str, seed: int) -> Column:
    return F.pmod(portable_hash64(id_col, seed=seed), F.lit(_BUCKETS))


def split_column(
    id_col: Column | str,
    weights: Mapping[str, float],
    seed: int = 7,
) -> Column:
    """Split-name Column from id hash: buckets [0, w1·B) → first split,
    [w1·B, (w1+w2)·B) → second, … Weights must sum to ~1."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = _hash_bucket(id_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < F.lit(int(round(acc * _BUCKETS)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, float] | None = None,
    seed: int = 7,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (default 80/10/10
    train/val/test) deterministically by id hash."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(split_col, split_column(id_col, weights, seed))


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 7
) -> DataFrame:
    """Deterministic ~``fraction`` subsample by id hash — replay-stable
    where ``df.sample`` is not (a retry re-draws)."""
    if not 0 < fraction <= 1:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    return df.filter(
        _hash_bucket(id_col, seed) < F.lit(int(round(fraction * _BUCKETS)))
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    seed: int = 7,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    'click' events to 5% while keeping all 'purchase'): the keep
    threshold is a when-chain on the stratum, the keep decision is the
    id hash — map-side, no shuffle, no RNG."""
    bucket = _hash_bucket(id_col, seed)
    thresh = None
    for value, frac in fractions.items():
        cond = F.col(strata_col) == value
        lim = F.lit(int(round(frac * _BUCKETS)))
        thresh = F.when(cond, lim) if thresh is None else thresh.when(cond, lim)
    thresh = (
        F.lit(int(round(default_fraction * _BUCKETS)))
        if thresh is None
        else thresh.otherwise(F.lit(int(round(default_fraction * _BUCKETS))))
    )
    return df.filter(bucket < thresh)


def group_cap_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    cap: int,
    seed: int = 7,
    est_group_sizes: Mapping | None = None,
    oversample: float = 4.0,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically by
    id-hash order — the class-balance primitive (cap an over-
    represented source/domain/language at N docs) where a *fraction*
    per stratum (``stratified_sample``) can't express "absolute budget
    per group".

    row_number over (group, hash(id), id) — the id tiebreak makes the
    selection total-ordered and replay-stable. One shuffle on the
    group key; the output is bounded by cap per group.

    **Hot-group pre-filter** (``est_group_sizes``): without it, a
    group with 10⁹ rows funnels all 10⁹ through ONE window reducer
    before the cap truncates. Passing estimated sizes for the known-
    hot groups (from table stats / a prior count — they need only be
    roughly right) pre-filters each such group to hash buckets below
    ``oversample·cap/est`` BEFORE the shuffle, so the reducer sees
    ~``oversample × cap`` rows instead of the full group. The final
    selection is IDENTICAL to the unfiltered one by construction:
    the selection keeps the ``cap`` hash-smallest rows, and any row
    the pre-filter drops hashes above at least ``cap`` surviving
    rows — provided the pre-filter kept ≥ cap rows. That proviso is
    enforced, not assumed: after capping, the (few, driver-listed)
    pre-filtered groups are counted, and any that came up short —
    a wildly overestimated size — are recomputed without the filter
    (one extra metadata-scale job that fires only on estimate
    failure). Groups not listed are untouched.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window

    def _cap(frame: DataFrame) -> DataFrame:
        w = Window.partitionBy(group_col).orderBy(
            _hash_bucket(id_col, seed).asc(), F.col(id_col).asc()
        )
        return (
            frame.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cap)
            .drop("__rn")
        )

    if not est_group_sizes:
        return _cap(df)
    import math

    thresholds = {}
    for g, n in est_group_sizes.items():
        if n and n > 0:
            t = min(
                _BUCKETS, int(math.ceil(_BUCKETS * oversample * cap / float(n)))
            )
            if t < _BUCKETS:
                thresholds[g] = t
    if not thresholds:
        return _cap(df)
    thresh_expr = None
    for g, t in thresholds.items():
        cond = F.col(group_col) == F.lit(g)
        thresh_expr = (
            F.when(cond, F.lit(t))
            if thresh_expr is None
            else thresh_expr.when(cond, F.lit(t))
        )
    thresh_expr = thresh_expr.otherwise(F.lit(_BUCKETS))
    capped = _cap(df.filter(_hash_bucket(id_col, seed) < thresh_expr))
    hot = list(thresholds)
    # exactness guard: hot groups whose pre-filter survivors fell below
    # cap might have lost selectable rows — recompute those (and only
    # those) from the unfiltered frame. len(hot) is driver-provided and
    # small, so this count is metadata-scale.
    short = [
        r[0]
        for r in capped.filter(F.col(group_col).isin(hot))
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") < cap)
        .select(group_col)
        .collect()
    ]
    # a hot group with NO surviving rows never shows up in the count —
    # it is short too unless the group is absent from df entirely;
    # recomputing absent groups is a no-op, so just include them
    seen = {
        r[0]
        for r in capped.filter(F.col(group_col).isin(hot))
        .select(group_col)
        .distinct()
        .collect()
    }
    short += [g for g in hot if g not in seen]
    if not short:
        return capped
    exact = _cap(df.filter(F.col(group_col).isin(short)))
    # NOT isin(short) is NULL (not true) for NULL group values — without
    # the isNull() branch every NULL-group row would be silently dropped
    # whenever any hot group came up short, breaking the "selection is
    # IDENTICAL" guarantee (NULL groups are never in `hot`, so they are
    # never recomputed and must pass through untouched).
    return capped.filter(
        (~F.col(group_col).isin(short)) | F.col(group_col).isNull()
    ).unionByName(exact)


def temperature_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    seed: int = 7,
) -> DataFrame:
    """Temperature-flattened source mixture (the multilingual /
    data-mixing standard: sample sources ∝ n_s^alpha, alpha < 1
    up-weights small sources): keep-rate for source s is

        rate_s = min(1, target_fraction · N · n_s^(alpha-1) / Σ n^alpha)

    so the kept corpus has ≈ ``target_fraction·N`` rows distributed
    ∝ n_s^alpha. Source counts are one metadata-scale agg; the keep
    decision is the usual deterministic id-hash threshold (replay-
    stable, zero shuffle on the data path). Thresholds use half-up
    ``floor(x·10⁴ + 0.5)`` — portable across engines, unlike
    banker's-rounding ``round``. For ``alpha=0.5`` the power is
    computed via IEEE-exact ``sqrt`` so an ANSI oracle reproduces the
    thresholds bit-for-bit (a generic ``pow`` is not correctly
    rounded).

    Rows with a NULL source are treated as their OWN source bucket
    (counted, weighted, and sampled like any other) rather than being
    silently dropped — an unlabeled corpus slice loses rows only at
    its own temperature-flattened rate.
    """
    import math

    counts: dict = {}
    null_count = 0
    for r in df.groupBy(source_col).count().collect():
        if r[0] is None:
            null_count = r[1]
        else:
            counts[r[0]] = r[1]
    if not counts and not null_count:
        return df.filter(F.lit(False))

    def _pow_alpha(n: int) -> float:
        return math.sqrt(float(n)) if alpha == 0.5 else float(n) ** alpha

    n_total = sum(counts.values()) + null_count
    denom = sum(_pow_alpha(counts[s]) for s in sorted(counts))
    if null_count:
        denom += _pow_alpha(null_count)

    def _thresh(n: int) -> int:
        rate = min(1.0, target_fraction * n_total * _pow_alpha(n) / (n * denom))
        return int(math.floor(rate * _BUCKETS + 0.5))

    bucket = _hash_bucket(id_col, seed)
    thresh = None
    for s in sorted(counts):
        cond = F.col(source_col) == F.lit(s)
        th = _thresh(counts[s])
        thresh = (
            F.when(cond, F.lit(th)) if thresh is None else thresh.when(cond, F.lit(th))
        )
    if null_count:
        cond = F.col(source_col).isNull()
        th = _thresh(null_count)
        thresh = (
            F.when(cond, F.lit(th)) if thresh is None else thresh.when(cond, F.lit(th))
        )
    return df.filter(bucket < thresh.otherwise(F.lit(0)))


def systematic_weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    step: int,
) -> DataFrame:
    """EXACT weighted sampling without randomness: systematic (grid)
    sampling over the cumulative weight line. Concatenate every row's
    weight along the deterministic (portable_hash64(id), id) order —
    the ``pack_sequences`` two-level distributed prefix sum, never a
    single-partition window — and select the rows whose weight span
    covers a multiple of ``step``. Selection probability is
    proportional to weight, expected sample size is
    total_weight / step, replay-stable across runs/engines (the
    property 'random' weighted sampling can't give an oracle), and a
    row heavier than ``step`` is always selected.

    Zero/NULL-weight rows have an empty span and are never selected.
    The mark-count test is pure integer/floor math:
    ``floor((end−1)/step) − floor((start−1)/step) > 0``.
    """
    from .packing import pack_sequences

    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    packed = pack_sequences(df, id_col, weight_col, capacity=step)
    start, end = F.col("start_offset"), F.col("end_offset")
    marks = F.floor((end - 1) / F.lit(step)) - F.floor((start - 1) / F.lit(step))
    return packed.filter(marks > 0).select(
        *df.columns, "start_offset", "end_offset"
    )


def mixture_allocation(
    df: DataFrame,
    source_col: str,
    tokens_expr: Column,
    budget_tokens: int,
    temperature: float = 0.5,
) -> DataFrame:
    """Temperature-smoothed domain-mixture allocation — the corpus-
    assembly step that decides how many tokens each source contributes
    to a training mix (the public multilingual-sampling recipe:
    share_i ∝ avail_i^τ, τ=0.5 → sqrt smoothing, upweighting small
    domains without letting the largest dominate).

    Per source: available tokens, smoothed share in basis points, the
    token allocation out of ``budget_tokens``, and epochs_bp =
    allocation/available in basis points (>10000 → the source repeats).

    One hash-agg shuffle collapses the corpus to |sources| rows; the
    share normalization is a window over that metadata-scale frame.
    Exactness: the smoothed weight is quantized to an INTEGER
    (floor(sqrt(avail)·10⁶ + 0.5)) before normalizing, so the
    normalizer is an order-free integer sum — a raw double Σsqrt
    would depend on row order — and sqrt is correctly-rounded IEEE in
    every engine (the reason only τ=0.5 is offered).
    """
    if temperature != 0.5:
        raise ValueError(
            "only temperature=0.5 (sqrt smoothing) is supported — other "
            "powers via pow() are not bit-reproducible across engines"
        )
    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    from pyspark.sql.window import Window

    avail = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(tokens_expr).alias("avail_tokens")
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    si = F.floor(
        F.sqrt(F.col("avail_tokens").cast("double")) * 1_000_000 + F.lit(0.5)
    ).cast("long")
    tot = F.sum(si).over(w)  # exact long sum: order-free
    # products go through double (one multiply, one divide, one floor —
    # a fixed op sequence, deterministic across engines at any scale)
    alloc = F.floor(
        F.lit(float(budget_tokens)) * si.cast("double") / tot.cast("double")
    ).cast("long")
    return avail.select(
        "source",
        "avail_tokens",
        F.floor(F.lit(10_000.0) * si.cast("double") / tot.cast("double"))
        .cast("long")
        .alias("share_bp"),
        alloc.alias("alloc_tokens"),
        F.floor(alloc * 10_000 / F.col("avail_tokens"))
        .cast("long")
        .alias("epochs_bp"),
    )


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int = 50,
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup, JACM'07): a weighted
    without-replacement sample of size k whose subset-sum estimator is
    unbiased — the right primitive for "sample 1M docs proportional to
    token count and still estimate corpus totals".

    priority = w / u with u a deterministic hash-uniform in (0, 1]
    derived from the row's id (same portable md5 the split/sample
    family uses — reproducible under retry/repartition, identical in
    any ANSI engine). Keep the k highest priorities; the threshold
    τ = (k+1)-th priority turns the sample into the estimator
    ŵ = max(w, τ) per kept row, Σŵ unbiased for Σw. Everything is
    IEEE add/divide on hash-derived inputs — bit-identical in Spark
    and the SQL oracle, so even the estimator column is value-checked.

    Scale shape: the top-(k+1) is ``TakeOrderedAndProject``
    (per-partition heaps, k·P rows to the driver-side merge — the
    distributed reservoir); the τ window then runs over ≤ k+1 rows.
    No full sort, no shuffle of the data."""
    from pyspark.sql.window import Window

    h = portable_hash64(F.col(id_col), seed=seed)
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**60))
    w = F.col(weight_col).cast("double")
    top = (
        df.select(
            id_col,
            F.col(weight_col).alias("weight"),
            (w / u).alias("priority"),
        )
        .orderBy(F.col("priority").desc(), F.col(id_col).asc())
        .limit(k + 1)
    )
    wnd = Window.orderBy(F.col("priority").desc(), F.col(id_col).asc())
    ranked = top.withColumn("__rn", F.row_number().over(wnd))
    tau = F.max(
        F.when(F.col("__rn") == k + 1, F.col("priority"))
    ).over(Window.partitionBy())
    return (
        ranked.withColumn(
            "est_weight",
            F.greatest(
                F.col("weight").cast("double"),
                F.coalesce(tau, F.lit(0.0)),
            ),
        )
        .filter(F.col("__rn") <= k)
        .select(id_col, "weight", "priority", "est_weight")
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    shard_size: int,
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic per-epoch training order + shard manifest: every
    row gets a global 1-based ``pos`` along the (hash64(id, seed =
    epoch), id) total order — a different but REPRODUCIBLE permutation
    per epoch, the 'reshuffle each epoch without a seed file' step of
    a training pipeline — and ``shard = (pos-1) div shard_size``.

    The global rank is computed WITHOUT a single-task global sort:
    rows bucket by the hash's HIGH bits (``n_buckets`` a power of
    two, so bucket order == hash order — integer ``div`` by
    2^(60-log2 n_buckets), never a float divide), per-bucket counts
    build prefix offsets (metadata-scale, broadcast back), and each
    row's pos = its bucket's offset + its rank WITHIN the bucket —
    the within-bucket window is partitioned, so every task sorts
    ~|rows|/n_buckets: the TeraSort-shaped distributed total-order
    rank. At 100 TB raise n_buckets to keep per-task sorts bounded."""
    if shard_size < 1:
        raise ValueError(f"shard_size must be >= 1, got {shard_size}")
    if n_buckets < 1 or (n_buckets & (n_buckets - 1)) != 0:
        raise ValueError(
            f"n_buckets must be a power of two >= 1, got {n_buckets}"
        )
    step = (1 << 60) // n_buckets  # hash64 is 60-bit (15 hex chars)
    h = portable_hash64(F.col(id_col), seed=epoch)
    hashed = df.select(F.col(id_col), h.alias("__h")).select(
        id_col, "__h", F.expr(f"__h div {step}L").alias("__b")
    )
    counts = hashed.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    offs = counts.select(
        "__b",
        F.coalesce(
            F.sum("__c").over(
                Window.orderBy("__b").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("__off"),
    )
    wb = Window.partitionBy("__b").orderBy("__h", id_col)
    return (
        hashed.join(F.broadcast(offs), "__b")
        .select(
            id_col,
            (F.col("__off") + F.row_number().over(wb)).alias("pos"),
        )
        .withColumn("shard", F.expr(f"(pos - 1L) div {shard_size}L"))
    )
