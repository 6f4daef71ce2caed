"""Near-duplicate detection: shingling, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine.

All of it is built from JVM-side Column expressions (higher-order
array functions + md5-based portable hashing) — no Python UDFs, no
pyspark.ml dependency — so every stage is oracle-checkable and stays
inside whole-stage codegen.

Scale shape (the point of MinHash/LSH vs naive pairwise):
- shingling/explode: map-side only.
- signatures: ONE hash-aggregate shuffle on doc_id (k mins computed as
  k aggregate expressions in the same pass).
- LSH banding: explode to (band_id, band_key) → self-join on the band
  key. Only documents sharing a band collide, so the join output is
  ~candidates, not n². Skewed mega-buckets (boilerplate text) can be
  capped by filtering bucket size before the self-join.
- naive ``jaccard_pairs`` (exact, O(shared-shingle pairs)) is kept as
  the small-data oracle and verification path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark import StorageLevel

from ..functions.expressions import minhash_base, minhash_hash, portable_hash64
from .cache import pin
from .text import tokens


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Array of n-word shingles (1-based ``slice`` windows over the
    token array). Documents shorter than n words yield their full text
    as a single shingle, so every document participates."""
    toks = tokens(text)
    windows = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, windows).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct (id, shingle) pairs — the dedup universe.

    Per-doc dedup happens with ``array_distinct`` BEFORE the explode:
    map-side only, no shuffle — a global ``.distinct()`` here would
    shuffle the entire exploded universe for nothing (ids already make
    rows unique across docs).

    The input is bumped to the session's parallelism first: every
    consumer (boilerplate window, decontamination joins, Jaccard
    pairs) shuffles downstream anyway, and a single-file corpus would
    otherwise run the whole shingle/hash map work in one task. No-op
    when the input already has enough splits (the at-scale case)."""
    from ..sources.tables import ensure_min_parallelism

    return ensure_min_parallelism(df).select(
        id_col,
        F.explode(F.array_distinct(word_shingles(text_col, n))).alias("shingle"),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """k-permutation MinHash: sig_i(doc) = min over shingles of
    h_i(shingle), where h_i = (a_i·H + b_i) mod P is a universal-hash
    family over ONE md5 base hash per shingle (k× less hashing than k
    independent md5 calls — the hot-path win at 100 TB).

    ZERO-shuffle shape (round 5): the min of a universal hash over a
    multiset equals the min over its distinct set, so the former
    explode→hash→groupBy pipeline (which shuffled the entire
    |docs|×|shingles| universe) is computed per ROW instead — one md5
    per shingle into an aliased base-hash array (its own projection:
    Spark does no CSE inside higher-order lambdas, the winnowing
    lesson), then k array_min folds, all map-side whole-stage codegen.
    Identical values to the exploded form. Columns: id, h0..h{k-1}.

    The input is bumped to the session's parallelism first
    (``ensure_min_parallelism``): a single-file table otherwise runs
    the whole md5 workload in ONE task — measured 2.3 s → 0.4 s at
    sf0.1 with 32 cores; a no-op at real input-split counts."""
    from ..sources.tables import ensure_min_parallelism

    base_arr = F.transform(
        F.array_distinct(word_shingles(text_col, shingle_size)),
        lambda s: minhash_base(s),
    )
    keyed = ensure_min_parallelism(df).select(
        F.col(id_col).alias(id_col), base_arr.alias("__hs")
    )
    mins = [
        F.array_min(
            F.transform(F.col("__hs"), lambda h: minhash_hash(h, i))
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return keyed.select(id_col, *mins)


def lsh_bands(
    signatures: DataFrame, id_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """Banding: band_key = md5 of the band's signature slice.
    Emits (id, band_id, band_key) — docs agreeing on all rows of any
    band share a bucket."""
    pieces = []
    for b in range(bands):
        cols = [
            F.col(f"h{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        pieces.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws(",", *cols)).alias("band_key"),
            )
        )
    return signatures.select(
        id_col, F.explode(F.array(*pieces)).alias("band")
    ).select(id_col, "band.band_id", "band.band_key")


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
    max_bucket: int | None = None,
    cache_bands: bool = True,
) -> DataFrame:
    """MinHash-LSH candidate pairs (id_a < id_b, distinct).

    ``max_bucket`` drops degenerate mega-buckets (e.g. boilerplate)
    before the self-join — the skew guard that matters at 100 TB.

    ``cache_bands`` persists the banded table before the self-join:
    the two join sides have different output aliases, so Catalyst does
    NOT reuse the exchange, and without the cache the whole
    shingle→hash→aggregate pipeline (the dominant cost) runs twice —
    measured ~1.7× end-to-end at sf0.1. The banded table is tiny
    (docs × bands rows of (id, band, 32-char key)); at cluster scale
    the same cut is made by materializing signatures to a table once
    and joining from that.
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_size)
    bd = lsh_bands(sigs, id_col, bands, rows)
    if cache_bands:
        # slim table (docs x bands rows of (id, band, 32-char key) —
        # no text, no vectors): memory-first is the right level;
        # tracked, callers release via cache.release_pinned()
        bd = pin(bd, StorageLevel.MEMORY_AND_DISK)
    if max_bucket is not None:
        sizes = bd.groupBy("band_id", "band_key").agg(F.count(F.lit(1)).alias("__n"))
        bd = (
            bd.join(sizes, ["band_id", "band_key"])
            .filter(F.col("__n") <= max_bucket)
            .drop("__n")
        )
    a = bd.select(
        F.col(id_col).alias("id_a"), "band_id", "band_key"
    )
    b = bd.select(F.col(id_col).alias("id_b"), "band_id", "band_key")
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    threshold: float = 0.5,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold.

    inter(a,b) via self-join on shared shingles; |a|,|b| joined in from
    per-doc shingle counts; J = inter / (|a| + |b| − inter). Exact but
    O(pairs sharing a shingle) — the verification path for LSH, and
    fine standalone below ~10^6 docs per shingle bucket.

    ``df_cap`` guards the self-join against boilerplate shingles (the
    analog of LSH's ``max_bucket`` skew guard): shingles appearing in
    more than ``df_cap`` documents are dropped from the INTERSECTION
    join only — a shingle shared by 10^5 docs would otherwise emit
    10^10 join rows. Doc sizes |a|,|b| still count every shingle, so
    capped scores are exact-or-under, never inflated; pairs whose
    overlap is purely boilerplate are missed (acceptable: such pairs
    are below any useful threshold).
    """
    sh = exploded_shingles(df, id_col, text_col, shingle_size)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    joinable = sh
    if df_cap is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > df_cap)
            .select("shingle")
        )
        joinable = sh.join(hot, "shingle", "left_anti")
    a = joinable.select(F.col(id_col).alias("id_a"), "shingle")
    b = joinable.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    threshold: float = 0.9,
    df_cap: int | None = None,
) -> DataFrame:
    """Asymmetric containment near-dup pairs (Broder 1997): for each
    unordered pair, C(a in b) = inter/|a| and C(b in a) = inter/|b|;
    a pair qualifies when its LARGER containment >= threshold — i.e.
    the smaller shingle set is (nearly) a subset of the other.

    This is the subset-duplicate detector symmetric Jaccard is blind
    to: a paragraph quoted inside a 100x longer page has J ~ 1% but
    containment ~ 100% — the dominant partial-dup shape in web-scale
    training corpora (quoted posts, syndicated fragments, boilerplate
    wrappers around a shared body). Output: (id_a < id_b,
    containment = the larger direction, contained = which id is the
    subset side — the one a dedup pass would drop).

    Same distributed shape as ``jaccard_pairs`` (one shingle-bucket
    self-join + two size joins), same ``df_cap`` skew guard with the
    same exact-or-under guarantee: capped shingles leave the
    intersection only, sizes keep them, so containment never
    inflates.
    """
    sh = exploded_shingles(df, id_col, text_col, shingle_size)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    joinable = sh
    if df_cap is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > df_cap)
            .select("shingle")
        )
        joinable = sh.join(hot, "shingle", "left_anti")
    a = joinable.select(F.col(id_col).alias("id_a"), "shingle")
    b = joinable.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    c_small = F.round(
        F.col("inter") / F.least(F.col("sz_a"), F.col("sz_b")), 6
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("containment", c_small)
        .filter(F.col("containment") >= threshold)
        .withColumn(
            "contained",
            F.when(F.col("sz_a") <= F.col("sz_b"), F.col("id_a")).otherwise(
                F.col("id_b")
            ),
        )
        .select("id_a", "id_b", "containment", "contained")
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32, seed: int = 997
) -> DataFrame:
    """SimHash fingerprint over term-frequency-weighted tokens.

    Tokens explode (with multiplicity = tf weighting); each token
    hashes once; per bit position the ±1 votes sum in ONE grouped
    aggregation; the fingerprint reassembles as Σ 2^b·[vote_b > 0].
    Columns: id, simhash (bigint).
    """
    toks = df.select(
        id_col, F.explode(tokens(text_col)).alias("tok")
    ).withColumn("h", portable_hash64(F.col("tok"), seed=seed))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select(id_col, fp.cast("long").alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Pairing uses the pigeonhole trick: split the fingerprint into
    ``max_hamming + 1`` chunks — any pair within the Hamming radius
    agrees exactly on at least one chunk — equi-join per chunk, then
    verify with bit_count(xor). No n² stage.
    """
    fps = simhash(df, id_col, text_col, bits=bits)
    chunks = max_hamming + 1
    width = bits // chunks
    pieces = []
    for c in range(chunks):
        chunk = F.shiftright(F.col("simhash"), c * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        pieces.append(
            F.struct(F.lit(c).alias("chunk_id"), chunk.alias("chunk_val"))
        )
    keyed = fps.select(
        id_col, "simhash", F.explode(F.array(*pieces)).alias("c")
    ).select(id_col, "simhash", "c.chunk_id", "c.chunk_val")
    # same self-join economics as lsh_candidate_pairs: differing output
    # aliases defeat exchange reuse, so persist the (tiny) keyed table
    # rather than computing the tf-weighted vote aggregation twice
    keyed = pin(keyed, StorageLevel.MEMORY_AND_DISK)
    a = keyed.select(
        F.col(id_col).alias("id_a"),
        F.col("simhash").alias("sim_a"),
        "chunk_id",
        "chunk_val",
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("sim_b"),
        "chunk_id",
        "chunk_val",
    )
    return (
        a.join(b, ["chunk_id", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("sim_a").bitwiseXOR(F.col("sim_b"))
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash the in-order shingle sequence, slide a window of
    ``window`` hashes, keep each window's minimum, emit the distinct
    minima as the document's fingerprint set. Guarantees any shared
    run of ≥ window+shingle_size−1 tokens produces a shared
    fingerprint — partial-overlap detection, where plain MinHash only
    estimates whole-document similarity.

    Entirely map-side (higher-order array functions per row) until the
    final explode; no shuffle at all — the ideal 100 TB shape. Columns:
    (id, fp).

    The shingle-hash array is computed in its OWN projection: inlined
    into the window-min expression, Spark re-evaluates the whole
    md5-hash transform once per window position (no common
    subexpression elimination inside higher-order lambdas — measured
    104 s → 3.9 s at sf0.1 for this split). The separate select holds
    because CollapseProject declines to duplicate a non-cheap alias
    referenced more than once.
    """
    hashes = F.transform(
        word_shingles(text_col, shingle_size), lambda s: minhash_base(s)
    )
    pre = df.select(F.col(id_col), hashes.alias("__h"))
    h = F.col("__h")
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(h) - F.lit(window - 1), F.lit(1))),
        lambda i: F.array_min(F.slice(h, i, window)),
    )
    return pre.select(
        F.col(id_col), F.explode(F.array_distinct(mins)).alias("fp")
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine over two array<numeric> columns — JVM higher-order
    functions only (zip_with dot product + aggregate norms), computed
    in double.

    The casts run INSIDE the fold lambdas rather than through two
    ``transform(…, cast)`` pre-passes: higher-order functions evaluate
    interpreted per element, and the transform form materialized four
    intermediate double arrays per evaluation (da and db, each
    referenced by two folds) — pure allocation + an extra per-element
    lambda pass for bit-identical doubles (``cast(x)*cast(y)`` is the
    same IEEE op sequence as ``transform`` + ``x*y``; null elements
    and length-mismatch zip padding propagate identically)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    nb = F.sqrt(
        F.aggregate(
            b,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return dot / (na * nb)


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).
    All-pairs — the correctness baseline; the scale path buckets first
    (``similarity.signed_random_projection_buckets``)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", F.round(cosine_similarity(F.col("va"), F.col("vb")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_neardup_pairs_bucketed(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 31,
    multiprobe: bool = True,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via SRP-LSH bucketing — the
    100 TB path (the all-pairs form above is the recall baseline).

    Candidate generation is an EQUI-join, never a cartesian: each
    vector gets a ``num_planes``-bit signed-random-projection bucket;
    side A keys on its own bucket, side B explodes to its bucket plus
    (when ``multiprobe``) every Hamming-1 neighbor, and the join on the
    bucket key pairs exactly the vectors whose buckets differ in ≤ 1
    bit. Each qualifying pair matches on exactly one probe key, so no
    distinct is needed. Survivors are verified with exact cosine ≥
    threshold. Shuffle is on the bucket key; candidate volume shrinks
    ~2^planes/(planes+1)× vs all-pairs. Recall: two vectors at angle θ
    land in Hamming ≤ 1 buckets with probability given by the SRP
    collision bound (1 − θ/π per plane); raise recall with fewer
    planes, more probes, or multiple plane seeds unioned.
    """
    from .similarity import hyperplanes, srp_bucket_expr

    planes = hyperplanes(num_planes, dim, seed)
    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # bucket AND norm are per-ROW quantities: compute them once before
    # the join (the verify stage then pays only a dot product per
    # candidate pair — recomputing ||v|| per pair doubles the dominant
    # cost), and persist so the two join sides don't recompute the SRP
    # projections (aliased self-join sides never get ReusedExchange)
    bucketed = df.select(
        F.col(id_col).alias("__id"),
        dvec.alias("__v"),
        srp_bucket_expr(vec_col, planes).alias("srp_bucket"),
        F.sqrt(
            F.aggregate(dvec, F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("__norm"),
    )
    # full vectors ride this table — DISK_ONLY keeps a data-sized
    # cache out of executor memory; released via cache.release_pinned()
    bucketed = pin(bucketed)
    a = bucketed.select(
        F.col("__id").alias("id_a"),
        F.col("__v").alias("va"),
        F.col("__norm").alias("na"),
        F.col("srp_bucket").alias("bucket"),
    )
    probe_ids = [F.col("srp_bucket")]
    if multiprobe:
        probe_ids += [
            F.col("srp_bucket").bitwiseXOR(F.lit(1 << p))
            for p in range(num_planes)
        ]
    b = bucketed.select(
        F.col("__id").alias("id_b"),
        F.col("__v").alias("vb"),
        F.col("__norm").alias("nb"),
        F.explode(F.array(*probe_ids)).alias("bucket"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Cluster near-dup candidate pairs into components: every node gets
    ``cluster_id`` = the minimum id reachable through the pair graph
    (singletons label themselves). The step LSH stops short of — dedup
    needs *groups*, not pairs, to keep one canonical doc per group.

    Min-label propagation + pointer jumping: each round every node
    takes the min over {its label, neighbors' labels, its LABEL's
    label} — the last term (one extra self-join, "hash-to-min" style;
    cf. Rastogi et al., ICDE'13; large-star/small-star in Kiveris et
    al., SoCC'14 is the heavier-duty relative) doubles the effective
    propagation distance per round, so convergence is O(log diameter)
    rounds instead of O(diameter): a 10⁶-node chain converges in ~20
    rounds, not 10⁶. ``localCheckpoint`` truncates the growing lineage
    (the classic iterative-DataFrame failure mode). Near-dup graphs
    are unions of small cliques (2-3 rounds); the jump term is what
    makes adversarial chains safe.

    Raises ``RuntimeError`` if ``max_iterations`` rounds pass without
    convergence — silently returning partially-propagated labels would
    be wrong clusters, the worst possible failure mode for dedup.

    Convergence check: one cheap agg per round — ``bit_xor`` of
    ``xxhash64(node, label)`` over the label table, which changes when
    any node's label changes (up to astronomically-unlikely 64-bit
    hash/xor-cancellation coincidences), works for *any* id type, and
    cannot overflow under ANSI mode. (A plain ``sum(label)`` would
    return NULL for string ids, making every round look converged
    after round one — wrong clusters for diameter > 1; ``sum`` of
    hashes throws ARITHMETIC_OVERFLOW under Spark 4's ANSI default.)
    """
    edges = pairs.select(
        F.col(pair_a).alias("src"), F.col(pair_b).alias("dst")
    ).union(pairs.select(F.col(pair_b).alias("src"), F.col(pair_a).alias("dst")))
    edges = edges.localCheckpoint(eager=True)
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)

    def _state_digest(lbl: DataFrame):
        return lbl.agg(F.bit_xor(F.xxhash64("node", "label"))).collect()[0][0]

    prev_digest = _state_digest(labels)
    converged = False
    for _ in range(max_iterations):
        neighbor_labels = edges.join(
            labels, edges.src == labels.node, "inner"
        ).select(F.col("dst").alias("node"), "label")
        # pointer jump: node's label's label (label(n) ≤ n, so the
        # grandparent label is always ≤ — min keeps correctness)
        lbl = labels.select(
            F.col("node").alias("j_node"), F.col("label").alias("j_label")
        )
        jumped = (
            labels.join(lbl, labels.label == lbl.j_node, "left")
            .select(
                "node",
                F.coalesce(F.col("j_label"), F.col("label")).alias("label"),
            )
        )
        labels = (
            jumped.union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        cur_digest = _state_digest(labels)
        if cur_digest == prev_digest:
            converged = True
            break
        prev_digest = cur_digest
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds — raise max_iterations (graph diameter exceeds "
            "2^rounds reach)"
        )
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))


def keep_canonical(
    clustered: DataFrame, id_col: str, cluster_col: str = "cluster_id"
) -> DataFrame:
    """The deduplicated corpus: one canonical doc per cluster (the
    cluster's min id — deterministic, no arbitrary-row-per-group)."""
    return clustered.filter(F.col(id_col) == F.col(cluster_col))


class LshIndex:
    """Store-backed MinHash-LSH dedup index — INCREMENTAL corpus dedup,
    the crawl-ingest pattern at 100 TB: index the corpus once, then
    each new batch (a) finds its candidate near-dups against the
    INDEXED corpus without rescanning or re-hashing it — one equi-join
    of the batch's bands against the band table — and (b) upserts its
    own bands so later batches dedup against it too. Every flat dedup
    operator here (``lsh_candidate_pairs`` and friends) re-hashes the
    WHOLE corpus per run; the index makes dedup cost O(batch), which
    is the difference between feasible and not on a continuously-fed
    corpus. The lifecycle sibling of ``similarity.IvfIndex`` — same
    versioned ``TableStore``: time travel, OPTIMIZE, retention, gated
    deletes all apply.

    Layout: ``<name>__bands`` holds (id, band_id, band_key) COLUMN-
    partitioned by ``band_pfx`` = portable_hash64(band_key) %
    ``n_parts``. A probe computes the batch's own prefix set
    (metadata-scale: ≤ n_parts values) and filters the scan on it, so
    a small batch's candidate join reads only the partitions its keys
    can live in (hive partition pruning on the parquet scan); a batch
    covering every prefix degenerates to the full band-table scan —
    the correct worst case. Upserts take the store's pruned merge on
    (id, band_id); re-indexed documents (changed text → new band
    keys) full-upsert in place.

    Within-batch duplicates are intentionally out of scope: dedup the
    batch internally first (``lsh_candidate_pairs``), then
    ``query_pairs`` it against the index — the two-phase shape a
    production ingest runs. Candidates verify downstream exactly as
    LSH candidates always do (``jaccard_pairs`` on the pair set).
    """

    def __init__(
        self,
        store,
        name: str = "lsh",
        id_col: str = "doc_id",
        text_col: str = "text",
        num_hashes: int = 8,
        bands: int = 4,
        shingle_size: int = 3,
        n_parts: int = 16,
    ) -> None:
        if num_hashes % bands:
            raise ValueError("num_hashes must divide evenly into bands")
        self.store = store
        self.name = name
        self.id_col = id_col
        self.text_col = text_col
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_size = shingle_size
        self.n_parts = n_parts

    @property
    def _bands_table(self) -> str:
        return f"{self.name}__bands"

    def _band_rows(self, docs: DataFrame) -> DataFrame:
        sigs = minhash_signatures(
            docs,
            self.id_col,
            self.text_col,
            num_hashes=self.num_hashes,
            shingle_size=self.shingle_size,
        )
        bd = lsh_bands(
            sigs, self.id_col, self.bands, self.num_hashes // self.bands
        )
        return bd.withColumn(
            "band_pfx",
            F.pmod(portable_hash64(F.col("band_key"), 7), F.lit(self.n_parts)),
        )

    def build(self, docs: DataFrame) -> None:
        """Index the corpus: hash once, store the band table column-
        partitioned by the key prefix (version 1; a re-build is a
        re-index — new version, old one retained per the store's
        window)."""
        self.store.write_partitioned(
            self._bands_table,
            self._band_rows(docs),
            keys=[self.id_col, "band_id"],
            partition_column="band_pfx",
        )

    def upsert(self, docs: DataFrame) -> None:
        """Fold a batch into the index: full-upsert on (id, band_id),
        so re-indexed documents replace their old band keys in place
        and the store rewrites only the band_pfx partitions the batch
        lands in."""
        self.store.merge(
            self._bands_table,
            self._band_rows(docs),
            [self.id_col, "band_id"],
            policy="full_upsert",
        )

    def query_pairs(self, docs: DataFrame) -> DataFrame:
        """Candidate near-dup pairs of ``docs`` AGAINST THE INDEX —
        (id, match_id) distinct, where ``id`` is a batch document and
        ``match_id`` an indexed one (a doc already indexed under the
        same id never matches itself). The batch's bands are computed
        fresh (O(batch) hashing) and pinned — they feed both the
        prefix collect and the join; callers release via
        ``cache.release_pinned()``, the tracked-persist contract every
        LSH operator here follows — then equi-joined on
        (band_id, band_key) against the band table pruned to the
        batch's prefix set."""
        probe = pin(self._band_rows(docs))
        pfx = [r[0] for r in probe.select("band_pfx").distinct().collect()]
        indexed = self.store.read(self._bands_table).filter(
            F.col("band_pfx").isin(pfx)
        )
        a = probe.select(
            F.col(self.id_col).alias("id"), "band_id", "band_key"
        )
        b = indexed.select(
            F.col(self.id_col).alias("match_id"), "band_id", "band_key"
        )
        return (
            a.join(b, ["band_id", "band_key"])
            .filter(F.col("id") != F.col("match_id"))
            .select("id", "match_id")
            .distinct()
        )

    def delete(self, ids, max_inline_keys: int = 1_000) -> int:
        """Retire documents from the index (takedowns): the gated
        key-set DELETE — inline IN under ``max_inline_keys``, broadcast
        anti-join above (``TableStore.delete_keys``). Returns band
        rows deleted (bands × docs removed)."""
        if isinstance(ids, DataFrame):
            return self.store.delete_keys(
                self._bands_table,
                self.id_col,
                ids,
                max_inline_keys=max_inline_keys,
            )
        ids = list(ids)
        if len(ids) <= max_inline_keys:
            return self.store.delete(
                self._bands_table, F.col(self.id_col).isin(ids)
            )
        kdf = self.store.spark.createDataFrame(
            [(i,) for i in ids], [self.id_col]
        )
        return self.store.delete_keys(
            self._bands_table, self.id_col, kdf,
            max_inline_keys=max_inline_keys,
        )

    def optimize(self) -> None:
        """Compact the small files trickle upserts leave in each
        band_pfx partition (``TableStore.optimize``)."""
        self.store.optimize(self._bands_table, key=self.id_col)

    def versions(self) -> list[str]:
        return self.store.versions(self._bands_table)
