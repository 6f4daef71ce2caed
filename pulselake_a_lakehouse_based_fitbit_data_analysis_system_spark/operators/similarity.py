"""Similarity search over embedding columns (array<float>).

- ``knn_brute_force`` — exact cosine top-k against a query vector.
  The scan is embarrassingly parallel; the top-k is
  ``TakeOrderedAndProject`` (per-partition heaps, driver merges k·P
  rows) — the correct baseline at any scale where scanning is
  affordable.
- ``signed_random_projection_buckets`` — sign-LSH bucketing: b
  deterministic pseudo-random hyperplanes (hash-derived coefficients,
  no RNG state to ship) → b-bit bucket key. ANN = probe the query's
  bucket (optionally multi-probe neighbors at Hamming distance 1).
  This is the 100 TB path: candidate set shrinks ~2^b×.
- ``ann_lsh`` — bucket + exact re-rank within candidates, with brute
  force as the documented recall baseline (see tests).

No pyspark.ml dependency; everything is higher-order array functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .neardup import cosine_similarity


def _query_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def knn_brute_force(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine; deterministic ordering (cosine desc, id
    asc) so results are reproducible under ties."""
    scored = df.withColumn(
        "cosine", F.round(cosine_similarity(F.col(vec_col), _query_lit(query_vec)), 6)
    )
    return (
        scored.select(id_col, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _plane_coefficient(plane: int, dim: int, seed: int = 31) -> float:
    """Deterministic pseudo-random coefficient in [-1, 1) derived from
    (seed, plane, dim) via md5 — reproducible across languages/runs,
    no RNG object to serialize to executors."""
    import hashlib

    h = hashlib.md5(f"{seed}:{plane}:{dim}".encode()).hexdigest()
    return (int(h[:15], 16) % 2_000_000) / 1_000_000.0 - 1.0


def hyperplanes(num_planes: int, dim: int, seed: int = 31) -> list[list[float]]:
    return [
        [_plane_coefficient(p, d, seed) for d in range(dim)]
        for p in range(num_planes)
    ]


def srp_bucket_expr(
    vec_col: Column | str, planes: list[list[float]]
) -> Column:
    """Signed-random-projection bucket id: bit p = [dot(vec, plane_p) ≥ 0].
    Pure expression — the dot products are zip_with/aggregate over a
    literal plane array, evaluated in codegen."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(c) for c in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def signed_random_projection_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 31,
) -> DataFrame:
    planes = hyperplanes(num_planes, dim, seed)
    return df.withColumn("srp_bucket", srp_bucket_expr(vec_col, planes))


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """IVF-flat cell assignment: cell = argmax cosine(vec, centroid_c)
    (ties → lowest cell id). Centroids are a driver-side list (metadata
    scale — nlist ≪ data); each row computes nlist dot products as
    column expressions, map-side only, no shuffle.

    At 100 TB: assign at ingest, partition/bucket the table by cell,
    and probes become partition-pruned scans. Centroid quality (k-means
    vs the deterministic sample used in the catalog query) affects
    recall, not the execution shape.
    """
    v = F.col(vec_col)
    sims = [cosine_similarity(v, _query_lit(c)) for c in centroids]
    best = F.greatest(*sims) if len(sims) > 1 else sims[0]
    cell = F.when(sims[0] == best, F.lit(0))
    for i in range(1, len(sims)):
        cell = cell.when(sims[i] == best, F.lit(i))
    return df.withColumn(cell_col, cell)


def ann_ivf(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: restrict to the ``nprobe`` cells whose centroids
    are closest to the query, then exact cosine re-rank. Candidates
    shrink ~nlist/nprobe×; recall grows with nprobe."""
    import math

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    ranked = sorted(
        range(len(centroids)),
        key=lambda c: (-cos(query_vec, centroids[c]), c),
    )
    probes = ranked[:nprobe]
    assigned = ivf_assign(df, centroids, vec_col=vec_col)
    candidates = assigned.filter(F.col("cell").isin(probes))
    scored = candidates.withColumn(
        "cosine", F.round(cosine_similarity(F.col(vec_col), _query_lit(query_vec)), 6)
    )
    return (
        scored.select(id_col, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ann_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 31,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: restrict to the query's SRP bucket (plus all
    Hamming-1 neighbor buckets when ``multiprobe``), then exact cosine
    re-rank. Probing H-1 neighbors trades ~(b+1)× more candidates for
    sharply better recall near bucket boundaries."""
    dim = len(query_vec)
    planes = hyperplanes(num_planes, dim, seed)
    bucketed = df.withColumn("srp_bucket", srp_bucket_expr(vec_col, planes))
    qbits = 0
    for p, plane in enumerate(planes):
        dot = sum(float(x) * c for x, c in zip(query_vec, plane))
        if dot >= 0:
            qbits |= 1 << p
    probes = [qbits]
    if multiprobe:
        probes += [qbits ^ (1 << p) for p in range(num_planes)]
    candidates = bucketed.filter(F.col("srp_bucket").isin(probes))
    scored = candidates.withColumn(
        "cosine", F.round(cosine_similarity(F.col(vec_col), _query_lit(query_vec)), 6)
    )
    return (
        scored.select(id_col, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
