"""Graph analytics on DataFrames: power-iteration PageRank.

The connected-components primitive (pointer-jumping) lives in
``operators/neardup.py`` where the dedup pipeline consumes it; this
module holds the rank/centrality side. Reference repo has no graph
workload — this is part of the scale-extension layer (training-data
pipelines rank sources/domains by link mass all the time).

Design: everything is exact INTEGER fixed-point arithmetic so any ANSI
engine replays the iteration bit-for-bit (the same trick as
``similarity.kmeans_refine`` and ``text.bpe_merges``):

- ranks live in units of ``scale`` (default 10^12): initial rank =
  ``scale // n_nodes`` per node;
- a node's per-edge contribution is ``rank // out_degree`` (integer
  floor division);
- the damped update is ``base + (85 * inbound_sum) // 100`` with
  ``base = (15 * (scale // n_nodes)) // 100`` — the standard 0.85
  damping expressed in integers.

Dangling nodes (no out-edges) keep receiving ``base`` and leak their
mass — the simple variant; redistributing dangling mass adds one more
metadata-scale aggregate per iteration if ever needed.

Scale shape: each iteration is one join of the rank table (|nodes|)
against the edge list on src plus one hash-agg by dst — the classic
distributed PageRank cost, |edges|-shuffle per iteration. The plan is
fully LAZY (no driver collects; iterations chain as joins), so
Catalyst sees the whole k-step pipeline at once. At 100 TB partition
edges and ranks by the same key so the per-iteration join co-locates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
) -> DataFrame:
    """Synchronous label-propagation community detection over a
    distinct DIRECTED edge list (pass both directions for undirected
    semantics): every node starts labeled with itself; each iteration
    every node adopts the most frequent label among its in-neighbors,
    ties broken by the smallest label, nodes with no in-edges keep
    their label. Fully deterministic (no randomized tie-breaking — the
    asynchronous variant's nondeterminism is exactly what an oracle
    cannot replay), so a generated CTE chain value-checks every
    iteration. Returns (node, community).

    Per iteration: one |labels| x edges join, one (node, label)
    hash-agg, one per-node row_number window — the same keyed
    shuffle cost profile as ``pagerank``, lazy end to end."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    e = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    ).distinct()
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(iters):
        neigh = (
            labels.join(e, labels["node"] == e["__s"])
            .select(F.col("__d").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        w = Window.partitionBy("node").orderBy(
            F.col("__c").desc(), F.col("label").asc()
        )
        picked = (
            neigh.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("node", F.col("label").alias("__new"))
        )
        labels = labels.join(picked, "node", "left").select(
            "node", F.coalesce(F.col("__new"), F.col("label")).alias("label")
        )
    return labels.select("node", F.col("label").alias("community"))


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    scale: int = 1_000_000_000_000,
) -> DataFrame:
    """Exact fixed-point PageRank over a distinct edge list. Returns
    (node, rank_fp) with ranks in ``scale`` units after ``iters``
    damped power iterations from a uniform start."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    e = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    ).distinct()
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
    # n_nodes is a metadata-scale scalar; keeping it driver-side makes
    # base/init literals, which the oracle replays as literals too
    n_nodes = nodes.count()
    init = scale // n_nodes
    base = (15 * init) // 100
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank_fp"))
    for _ in range(iters):
        contribs = (
            ranks.join(outdeg, ranks["node"] == outdeg["__s"])
            .select(
                "__s",
                F.floor(F.col("rank_fp") / F.col("__deg"))
                .cast("long")
                .alias("__c"),
            )
            .join(e, "__s")
            .groupBy(F.col("__d").alias("node"))
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.floor(
                        F.coalesce(F.col("__in"), F.lit(0)) * 85 / 100
                    )
                )
                .cast("long")
                .alias("rank_fp"),
            )
        )
    return ranks
