"""Column-expression factories — the engine's "scalar function" layer.

The reference defines zero UDFs; its one reusable scalar abstraction is
``age_bins``, a function returning a ``when``-chain Column
(``Silver/05-silver.py:291-304``). That is the idiomatic Spark pattern
— build Columns, stay inside whole-stage codegen — and this module
generalizes it. Nothing here leaves the JVM.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds_to_ts(col: Column | str) -> Column:
    """Epoch-seconds (double/long) → timestamp
    (reference ``Silver/05-silver.py:77,125``)."""
    return F.col(col).cast("timestamp") if isinstance(col, str) else col.cast("timestamp")


def epoch_millis_to_ts(col: Column | str) -> Column:
    """Epoch-millis bigint → timestamp (reference ``Bronze/04-bronze.py:88``:
    ``(timestamp/1000).cast("timestamp")``)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c / 1000).cast("timestamp")


def minutes_between(end: Column | str, start: Column | str, scale: int = 2) -> Column:
    """``round((end::long - start::long)/60, 2)`` — the gym_summary
    minutes math (reference ``Setup/02-setup.py:247-248``)."""
    e = F.col(end) if isinstance(end, str) else end
    s = F.col(start) if isinstance(start, str) else start
    return F.round((e.cast("long") - s.cast("long")) / 60, scale)


def validity_flag(col: Column | str, lower_bound: float = 0.0) -> Column:
    """``when(x <= 0, False).otherwise(True)`` — the BPM validity flag
    (reference ``Silver/05-silver.py:271``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c <= F.lit(lower_bound), F.lit(False)).otherwise(F.lit(True))


def bucketize(
    col: Column | str, edges: Sequence[float], labels: Sequence[str] | None = None
) -> Column:
    """Ordered-edge bucketing as a single ``when`` chain.

    Generalizes the reference's 11-way age-bin chain
    (``Silver/05-silver.py:291-304``). ``edges`` are the interior
    boundaries (ascending); a value lands in bucket ``i`` when
    ``value < edges[i]``, else the overflow bucket. Labels default to
    ``"<e0"``, ``"e0-e1"``, …, ``">=eN"`` — same shape as the
    reference's ``"18-25"`` style labels.

    Stays a Column expression (codegen'd, null-safe: NULL → NULL) —
    never a UDF. For purely numeric edges ``F.width_bucket`` is the
    terser built-in; this keeps the labeled-string semantics.
    """
    c = F.col(col) if isinstance(col, str) else col
    if labels is None:
        labels = (
            [f"<{edges[0]:g}"]
            + [f"{lo:g}-{hi:g}" for lo, hi in zip(edges[:-1], edges[1:])]
            + [f">={edges[-1]:g}"]
        )
    if len(labels) != len(edges) + 1:
        raise ValueError("need len(edges)+1 labels")
    expr = F.when(c < F.lit(edges[0]), F.lit(labels[0]))
    for hi, label in zip(edges[1:], labels[1:-1]):
        expr = expr.when(c < F.lit(hi), F.lit(label))
    return expr.when(c.isNotNull(), F.lit(labels[-1]))


def age_bins(dob_col: Column | str) -> Column:
    """Age buckets from date-of-birth — the reference's exact bucket set
    (``Silver/05-silver.py:291-304``): <18, 18-25, 25-35, …, 80-90, 90+."""
    dob = F.col(dob_col) if isinstance(dob_col, str) else dob_col
    age = F.floor(F.months_between(F.current_date(), dob) / 12)
    return bucketize(
        age,
        edges=[18, 25, 35, 45, 55, 65, 75, 80, 90],
        labels=[
            "under 18",
            "18-25",
            "25-35",
            "35-45",
            "45-55",
            "55-65",
            "65-75",
            "75-80",
            "80-90",
            "90+",
        ],
    )


def portable_hash64(col: Column | str, seed: int = 0) -> Column:
    """Deterministic 63-bit hash computable identically in any ANSI-SQL
    engine: ``conv(substr(md5(concat(seed, ':', x)), 1, 15), 16, 10)``.

    Used by the MinHash / SimHash / LSH operators so their outputs are
    oracle-checkable (DuckDB: ``CAST('0x' || substr(md5(...),1,15) AS
    BIGINT)``). md5 is JVM-side (codegen'd) — no Python crossing.
    15 hex chars = 60 bits, always positive, exact in a signed 64-bit
    integer on both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


# Universal-hash family for MinHash: h_i(x) = (a_i * H(x) + b_i) mod P,
# all derived from ONE md5 base hash instead of k independent md5 calls
# (k× less hashing on the hot explode path). P = 2^31 - 1 keeps every
# intermediate product < 2^62 — exact in signed int64 on Spark AND
# DuckDB, so the oracle can mirror the arithmetic verbatim.
MINHASH_P = 2147483647


def minhash_ab(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i) multiplier/offset pair for hash i.
    Knuth-style multiplicative constants keep successive functions
    uncorrelated; a_i is never 0 mod P."""
    a = (0x9E3779B1 * (i + 1)) % MINHASH_P
    b = (0x85EBCA77 * (i + 1) + 1) % MINHASH_P
    return (a or 1, b)


def minhash_base(col: Column | str) -> Column:
    """Base hash H(x) ∈ [0, P): one md5 per value."""
    return portable_hash64(col, seed=0) % MINHASH_P


def minhash_hash(base: Column, i: int) -> Column:
    """i-th universal hash over a precomputed base-hash Column."""
    a, b = minhash_ab(i)
    return (base * F.lit(a) + F.lit(b)) % MINHASH_P


def morton_code(x: Column | str, y: Column | str, bits: int = 10) -> Column:
    """Z-order (Morton) curve code: interleave the low ``bits`` bits of
    two non-negative ints — x in the even positions, y in the odd.

    The multi-dimensional clustering key behind Delta/Iceberg's
    ``OPTIMIZE ZORDER``: sorting or range-partitioning by the code
    keeps rows close in BOTH dimensions physically close, so per-file
    min/max statistics prune scans filtered on either column (a plain
    sort clusters only its leading column). Pure shift/and/or Column
    arithmetic — JVM-side, codegen'd, and evaluable verbatim in any
    engine with bit ops, so the operator is oracle-checkable.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    cx = (F.col(x) if isinstance(x, str) else x).cast("long")
    cy = (F.col(y) if isinstance(y, str) else y).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(cx, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(cy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def sql_morton(xe: str, ye: str, bits: int = 10) -> str:
    """ANSI-SQL twin of :func:`morton_code` for oracle generation."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({xe}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({ye}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def morton_code_n(cols: Sequence[Column | str], bits: int = 10) -> Column:
    """N-dimensional Z-order code: round-robin interleave of the low
    ``bits`` bits of each column — column j owns positions
    ``i * n + j`` (so for two columns this is exactly
    :func:`morton_code`'s layout: first column even, second odd). The
    clustering key behind Delta's multi-column ``OPTIMIZE ZORDER BY
    (a, b, c, ...)``: range-partitioning by the code keeps rows close
    in EVERY listed dimension, so per-file min/max prunes scans on any
    of them (each extra dimension dilutes all of them — 2-4 columns is
    the practical range, the same guidance Delta documents). Pure
    shift/and/or Column arithmetic, codegen'd, oracle-checkable.
    ``bits * n`` must fit a signed 64-bit int (≤ 62)."""
    n = len(cols)
    if n < 2:
        raise ValueError("morton_code_n needs at least two columns")
    if not 1 <= bits * n <= 62:
        raise ValueError(
            f"bits * n_cols must be in [1, 62]; got {bits} x {n}"
        )
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("long") for c in cols
    ]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return z
