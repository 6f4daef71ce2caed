"""Incrementally-maintained rollup tables over the versioned TableStore.

The hypertable-rollup / materialized-view-maintenance pattern the
reference's gold layer approximates by re-running its summary MERGE
per batch (``Gold/06-gold.py:31-80`` recomputes the day's aggregates
from silver every trigger): here the aggregate TABLE ITSELF is the
state, and maintenance cost is O(increment + affected partitions),
never O(history).

A rollup row holds MERGEABLE aggregate state per key — count, integer
sum, min, max, and optionally a DataSketches HLL sketch for distinct
counts (sketch bytes union; plain distinct counts don't merge). The
value column is a caller-quantized LONG: integer state is what makes
re-aggregation independent of row and batch order, so an incremental
maintain is bit-identical to a from-scratch rebuild and an ANSI oracle
replays it with one GROUP BY. Derived measures (avg = sum/n) come out
at read time, never stored.

Maintenance step (``apply``):

1. the increment collapses to partials in ONE hash-agg (map-side
   combinable — the only pass over increment rows);
2. existing state for the affected partitions is read back
   partition-pruned (the partition values come from the partials —
   a metadata-scale driver collect, bounded by partition cardinality,
   same as the store's own pruned-merge collect);
3. new and old state combine additively (left join of partials
   against matched state — |increment keys| rows on each side);
4. the store's partition-pruned ``full_upsert`` rewrites only the
   affected partitions into a new version (time travel, changelog and
   OPTIMIZE all apply — same lifecycle as ``similarity.IvfIndex``).

The combine is expressed as a pre-join rather than a merge-policy
update expression, so it composes with the existing store policies
instead of growing a new one; the cost is that affected-partition
state is scanned twice (once for the combine, once inside the pruned
merge) — at 100 TB "affected" is the last few date partitions of an
append-mostly feed, so both scans are O(days in batch).

Increments must be DISJOINT slices of the fact stream (each source row
rolled up exactly once) — pair with the foreachBatch batch-id ledger
(``sources/sinks.py``) when feeding from a stream, exactly like the
reference's exactly-once gold merge.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .merge import TableStore


class MaintainedRollup:
    """An aggregate table maintained through TableStore versions.

    ``keys`` are the rollup grain; ``value_col`` names a LONG column
    of the input frames (pre-quantized by the caller — e.g. cents);
    ``distinct_col`` optionally adds an HLL distinct-count sketch of
    that column to the state; ``partition_column`` (must be one of
    ``keys`` — typically an integer date key like yyyyMMdd) makes both
    the maintain read and the merge write partition-pruned. Without it
    the store's hash-bucket layout is used and the combine read is
    key-join-pruned only.
    """

    def __init__(
        self,
        store: TableStore,
        name: str,
        keys: Sequence[str],
        value_col: str,
        distinct_col: str | None = None,
        partition_column: str | None = None,
    ) -> None:
        if partition_column is not None and partition_column not in keys:
            raise ValueError(
                f"partition_column {partition_column!r} must be one of "
                f"the rollup keys {list(keys)} — a row's partition may "
                "never change across merges"
            )
        self.store = store
        self.name = name
        self.keys = list(keys)
        self.value_col = value_col
        self.distinct_col = distinct_col
        self.partition_column = partition_column

    # --- state construction ----------------------------------------------

    def partials(self, df: DataFrame) -> DataFrame:
        """Collapse raw rows to per-key mergeable state in one
        map-side-combinable hash-agg — the only full pass any rollup
        operation makes over its input rows."""
        v = F.col(self.value_col)
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum(v).alias("sum_v"),
            F.min(v).alias("min_v"),
            F.max(v).alias("max_v"),
        ]
        if self.distinct_col is not None:
            aggs.append(
                F.hll_sketch_agg(F.col(self.distinct_col)).alias("uu_sk")
            )
        return df.groupBy(*self.keys).agg(*aggs)

    def build(self, df: DataFrame) -> None:
        """Create the rollup (version 1) from an initial fact slice,
        laid out so every later ``apply`` is partition-pruned."""
        self.store.write_partitioned(
            self.name,
            self.partials(df),
            keys=self.keys,
            partition_column=self.partition_column,
        )

    # --- incremental maintenance -----------------------------------------

    def _combined(self, inc: DataFrame) -> DataFrame:
        tgt = self.store.read(self.name)
        if self.partition_column is not None:
            pcol = self.partition_column
            # metadata-scale collect: bounded by the increment's
            # partition cardinality (days in the batch), and it makes
            # the isin filter a literal list the scan can prune on
            vals = [r[0] for r in inc.select(pcol).distinct().collect()]
            tgt = tgt.filter(F.col(pcol).isin(vals))
        a, b = inc.alias("a"), tgt.alias("b")
        cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in self.keys]
        joined = a.join(b, cond, "left")
        cols = [F.col(f"a.{k}").alias(k) for k in self.keys]
        for c in ("n", "sum_v"):
            cols.append(
                (
                    F.col(f"a.{c}")
                    + F.coalesce(F.col(f"b.{c}"), F.lit(0).cast("long"))
                ).alias(c)
            )
        # least/greatest skip NULLs, so an unmatched key keeps a's value
        cols.append(F.least(F.col("a.min_v"), F.col("b.min_v")).alias("min_v"))
        cols.append(
            F.greatest(F.col("a.max_v"), F.col("b.max_v")).alias("max_v")
        )
        if self.distinct_col is not None:
            cols.append(
                F.when(
                    F.col("b.uu_sk").isNull(), F.col("a.uu_sk")
                )
                .otherwise(F.hll_union(F.col("a.uu_sk"), F.col("b.uu_sk")))
                .alias("uu_sk")
            )
        return joined.select(*cols)

    def apply(self, df: DataFrame) -> None:
        """Fold a disjoint fact increment into the rollup as a new
        store version — partials, pruned state read, additive combine,
        pruned ``full_upsert``. Creates the table if absent."""
        if not self.store.exists(self.name):
            self.build(df)
            return
        self.store.merge(
            self.name,
            self._combined(self.partials(df)),
            self.keys,
            policy="full_upsert",
        )

    # --- read side --------------------------------------------------------

    def read(self) -> DataFrame:
        """Current state, with derived measures: ``avg_v_fp`` is the
        integer-rounded mean ``floor((2*sum + n) / (2*n))`` (the
        half-up rounding any ANSI engine replays) and, when the rollup
        carries a sketch, ``uu_est`` is the HLL distinct estimate."""
        df = self.store.read(self.name).withColumn(
            "avg_v_fp",
            F.expr("(2 * sum_v + n) div (2 * n)").cast("long"),
        )
        if self.distinct_col is not None:
            df = df.withColumn(
                "uu_est", F.hll_sketch_estimate(F.col("uu_sk"))
            )
        return df

    def versions(self) -> list[str]:
        return self.store.versions(self.name)

    def optimize(self, **kwargs) -> None:
        """Compact the small files incremental maintains accumulate —
        delegates to the store's OPTIMIZE analog."""
        self.store.optimize(self.name, **kwargs)
