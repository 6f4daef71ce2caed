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
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically by
    id-hash order — the class-balance primitive (cap an over-
    represented source/domain/language at N docs) where a *fraction*
    per stratum (``stratified_sample``) can't express "absolute budget
    per group".

    row_number over (group, hash(id), id) — the id tiebreak makes the
    selection total-ordered and replay-stable. One shuffle on the
    group key; a pathologically hot group concentrates its rows on one
    reducer, but only until the window emits — the output is bounded
    by cap per group. For extreme skew, pre-filter with
    ``_hash_bucket(id) < ~2*cap/|group|`` estimates before windowing.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(_hash_bucket(id_col, seed).asc(), F.col(id_col).asc())
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )
