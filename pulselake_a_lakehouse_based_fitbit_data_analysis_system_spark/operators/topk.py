"""Top-k operators (reference O1-O3; dashboards' ranked bar charts).

``global_topk`` relies on Spark's ``TakeOrderedAndProject`` physical
operator: each partition keeps only its local top-k, the driver merges
k·P rows — no global sort, scale-safe for small k.

``topk_per_group`` is the window-function idiom (rank ≤ k after one
shuffle on the group key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_topk(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def topk_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column], k: int
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .withColumnRenamed("__rn", "rank_in_group")
    )
