"""Sequence packing for LLM training — distributed prefix sums.

Training pipelines concatenate tokenized documents in a deterministic
order and slice the token stream into fixed-capacity sequences
("packing"); each document needs its global token offset to know which
sequence(s) it lands in. The global offset is a PREFIX SUM over a
total order — the textbook anti-pattern is a single-partition window
(``Window.orderBy`` with no partition: one task sees every row). The
scale shape here is the classic two-level distributed scan:

1. order every doc by a deterministic hash key and split the key
   space into ``n_ranges`` ordered RANGES (the bucket is the hash's
   high bits, so bucket order == global order);
2. local prefix sums per bucket — ``n_ranges`` independent windows,
   each a fraction of the data;
3. bucket token totals (``n_ranges`` rows — metadata scale) →
   exclusive bucket prefixes on the driver → broadcast join back;
4. global offset = bucket prefix + local prefix.

Everything is column math + one tiny collect; the same pattern carries
global row numbering, cumulative histograms, and file-offset
assignment at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.expressions import portable_hash64

# portable_hash64 yields 15 hex chars = 60 bits
_HASH_BITS = 60


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    capacity: int = 2048,
    n_ranges: int = 64,
) -> DataFrame:
    """Assign each document its global token span and sequence ids
    under concat-then-chunk packing.

    Order is (portable_hash64(id), id) — deterministic, replay-stable,
    engine-portable (the oracle computes the identical order). Returns
    the input columns plus:

    - ``start_offset`` / ``end_offset``: the doc's half-open global
      token span
    - ``pack_first`` / ``pack_last``: ids of the capacity-sized
      sequences the span touches (equal unless the doc straddles a
      boundary; empty docs get ``pack_first`` for both)

    A NULL ``tokens_col`` is treated as 0 tokens (an empty document):
    NULLs would otherwise poison the prefix sums — ``sum`` skips them
    so ``__cum`` stays finite, but ``start = __cum - tokens`` and the
    bucket totals go NULL, which used to surface as a driver-side
    ``TypeError`` on ``acc += None``. Coalescing at the source keeps
    the scan total and deterministic; callers who want to EXCLUDE
    un-tokenized docs should filter them out before packing.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if n_ranges < 1:
        raise ValueError(f"n_ranges must be >= 1, got {n_ranges}")
    bucket_width = (2**_HASH_BITS) // n_ranges + 1
    h = portable_hash64(F.col(id_col))
    tok = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
    withb = (
        df.withColumn("__h", h)
        .withColumn("__b", F.floor(F.col("__h") / F.lit(bucket_width)).cast("int"))
        .withColumn("__tok", tok)
    )
    w = (
        Window.partitionBy("__b")
        .orderBy(F.col("__h"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = withb.withColumn("__cum", F.sum("__tok").over(w))
    # bucket totals: n_ranges rows — the one deliberate driver collect
    totals = {
        r["__b"]: r["t"]
        for r in withb.groupBy("__b")
        .agg(F.sum("__tok").alias("t"))
        .collect()
    }
    prefix, acc = {}, 0
    for b in sorted(totals):
        prefix[b] = acc
        acc += totals[b]
    spark = df.sparkSession
    prefix_df = spark.createDataFrame(
        [(b, p) for b, p in prefix.items()], "__b int, __prefix long"
    )
    out = local.join(F.broadcast(prefix_df), "__b")
    start = (F.col("__prefix") + F.col("__cum") - F.col("__tok")).cast(
        "long"
    )
    end = (F.col("__prefix") + F.col("__cum")).cast("long")
    pack_first = F.floor(start / F.lit(capacity)).cast("long")
    pack_last = F.when(
        F.col("__tok") > 0, F.floor((end - 1) / F.lit(capacity))
    ).otherwise(pack_first).cast("long")
    return (
        out.withColumn("start_offset", start)
        .withColumn("end_offset", end)
        .withColumn("pack_first", pack_first)
        .withColumn("pack_last", pack_last)
        .drop("__h", "__b", "__cum", "__prefix", "__tok")
    )


def shard_manifest(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    shard_tokens: int = 1 << 20,
    n_ranges: int = 64,
) -> DataFrame:
    """Training-shard manifest: assign every document to the output
    shard its global token offset starts in, and roll each shard up to
    the numbers a shard writer needs (doc count, token load, offset
    span).

    This is ``pack_sequences`` composed with one hash agg: shard id =
    ``floor(start_offset / shard_tokens)`` (a doc belongs to the shard
    where it STARTS; a straddling doc's tokens count toward its home
    shard, so ``n_tokens`` can exceed ``shard_tokens`` by at most one
    doc's tail — exactly how fixed-size shard writers behave). The
    manifest is |shards| rows — metadata scale — but is computed
    distributed: the prefix sums come from the two-level scan, the
    rollup is a single groupBy(shard_id).

    Returns (shard_id, n_docs, n_tokens, start_offset, end_offset),
    one row per non-empty shard.
    """
    if shard_tokens < 1:
        raise ValueError(f"shard_tokens must be >= 1, got {shard_tokens}")
    packed = pack_sequences(
        df, id_col, tokens_col, capacity=shard_tokens, n_ranges=n_ranges
    )
    return (
        packed.withColumn("shard_id", F.col("pack_first"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("end_offset") - F.col("start_offset")).alias(
                "n_tokens"
            ),
            F.min("start_offset").alias("start_offset"),
            F.max("end_offset").alias("end_offset"),
        )
    )
