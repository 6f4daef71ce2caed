"""Count-min sketch: fixed-size frequency summaries built as plain
aggregations, so heavy-hitter estimation over an unbounded item stream
costs O(depth x width) memory regardless of input size.

The sketch IS a DataFrame — (d, bucket, cnt) cells — built with one
map-side explode (depth rows per item) and one hash aggregation whose
result is at most depth*width rows. Estimation joins items back to the
broadcast-sized sketch and takes min(cnt) over the depth rows: the
classic count-min upper bound (Cormode & Muthukrishnan, J.Alg 2005 —
public paper). Every hash is ``portable_hash64``, so both construction
and estimation are bit-reproducible in any ANSI engine: a sketch
operator with a full value-level oracle.

At 100 TB: the input is never shuffled by item — only (d, bucket)
partial counts move (map-side combine reduces each partition to at
most depth*width rows before the exchange), and the finished sketch is
broadcast for estimation. Compare exact top-k via groupBy(token):
correct but shuffles the full token universe; the sketch caps the
exchange at kilobytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import portable_hash64


def _cells(item: F.Column | str, depth: int, width: int) -> F.Column:
    """Array of (d, bucket) structs for one item — exploded map-side."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(portable_hash64(item, seed=d), F.lit(width)).alias(
                    "bucket"
                ),
            )
            for d in range(depth)
        ]
    )


def count_min_sketch(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the (d, bucket, cnt) sketch table — <= depth*width rows."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    return (
        df.select(
            F.explode(_cells(F.col(item_col), depth, width)).alias("cell")
        )
        .groupBy(F.col("cell.d").alias("d"), F.col("cell.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimated count per item: min over d of the item's cell counts.

    Guarantees est >= true count (never under-counts); overshoot is
    bounded by collisions per row of the sketch. The sketch side is
    broadcast (<= depth*width rows by construction).
    """
    cells = items.select(
        F.col(item_col),
        F.explode(_cells(F.col(item_col), depth, width)).alias("cell"),
    ).select(item_col, "cell.d", "cell.bucket")
    return (
        cells.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
