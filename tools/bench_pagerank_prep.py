"""A/B the PageRank edge-prep strategies at sf0.1 (round-8 verdict ask #3).

Variants (all verified rank-checksum-identical; results in SCALE.md
"PageRank per-iteration cost flatness", r8 row):

- ``current``:  the r7 SHIPPED prep — distinct(s,d) -> self-join
  degree hash-agg -> pin folded list (three exchanges). Kept as the
  baseline so the published 14.2 s point stays reproducible.
- ``fused``:    ONE forced repartition by src; dedup + degree agg +
  fold join all run shuffle-free on that partitioning
  (HashPartitioning on a subset of each stage's keys satisfies its
  clustered distribution).
- ``fusedmem``: fused + MEMORY_AND_DISK loop pins — what
  ``operators/graph.py::_edges_with_degree`` NOW ships (the r8
  winner; graph.py additionally builds symmetric edges with a
  one-pass explode, ``plans/catalog_ext._trade_edges``).
- ``cset``:     groupBy-collect_set-explode single-shuffle fusion —
  measured slower and rejected for hub-array skew.

Run: python tools/bench_pagerank_prep.py [iters ...]
(env PREP_ONLY=fusedmem,... restricts variants)
"""

from __future__ import annotations

import sys
import time

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F

MEM = StorageLevel.MEMORY_AND_DISK

sys.path.insert(0, "/root/repo")

from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators.cache import (  # noqa: E501
    pin,
    release_pinned,
)
from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.session import (  # noqa: E501
    get_spark,
)

SF = "/root/testdata/sf0.1"


def trade_edges(spark) -> DataFrame:
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    cs = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    return cs.unionByName(
        cs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def prep_current(edges):
    e = edges.select(
        F.col("src").alias("__s"), F.col("dst").alias("__d")
    ).distinct()
    e_deg = pin(
        e.join(e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg")), "__s")
    )
    nodes = pin(
        e_deg.select(F.col("__s").alias("node"))
        .unionByName(e_deg.select(F.col("__d").alias("node")))
        .distinct()
    )
    return e_deg, nodes


def prep_fused(edges):
    raw = edges.select(
        F.col("src").alias("__s"), F.col("dst").alias("__d")
    ).repartition("__s")
    e = raw.dropDuplicates(["__s", "__d"])
    e_deg = pin(
        e.join(e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg")), "__s")
    )
    nodes = pin(
        e_deg.select(F.col("__s").alias("node"))
        .unionByName(e_deg.select(F.col("__d").alias("node")))
        .distinct()
    )
    return e_deg, nodes


def prep_cset(edges):
    g = (
        edges.select(F.col("src").alias("__s"), F.col("dst").alias("__d"))
        .groupBy("__s")
        .agg(F.collect_set("__d").alias("__ds"))
    )
    e_deg = pin(
        g.select(
            "__s",
            F.size("__ds").alias("__deg"),
            F.explode("__ds").alias("__d"),
        ).select("__s", "__d", "__deg"),
        MEM,
    )
    nodes = pin(
        e_deg.select(F.col("__s").alias("node"))
        .unionByName(e_deg.select(F.col("__d").alias("node")))
        .distinct(),
        MEM,
    )
    return e_deg, nodes


def prep_fused_mem(edges):
    raw = edges.select(
        F.col("src").alias("__s"), F.col("dst").alias("__d")
    ).repartition("__s")
    e = raw.dropDuplicates(["__s", "__d"])
    e_deg = pin(
        e.join(e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg")), "__s"),
        MEM,
    )
    nodes = pin(
        e_deg.select(F.col("__s").alias("node"))
        .unionByName(e_deg.select(F.col("__d").alias("node")))
        .distinct(),
        MEM,
    )
    return e_deg, nodes


def run_pagerank(e_deg, nodes, iters, checkpoint_every=4):
    scale = 1_000_000_000_000
    n_nodes = nodes.count()
    init = scale // n_nodes
    base = (15 * init) // 100
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank_fp"))
    for i in range(1, iters + 1):
        contribs = (
            ranks.join(e_deg, ranks["node"] == e_deg["__s"])
            .groupBy(F.col("__d").alias("node"))
            .agg(F.sum(F.expr("rank_fp div __deg")).alias("__in"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(base) + F.expr("(coalesce(__in, 0L) * 85) div 100"))
            .cast("long")
            .alias("rank_fp"),
        )
        if i % checkpoint_every == 0 and i < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def main() -> None:
    iters_list = [int(a) for a in sys.argv[1:]] or [12]
    spark = get_spark()
    for iters in iters_list:
        import os
        only = os.environ.get("PREP_ONLY")
        preps = [
            ("current", prep_current),
            ("fused", prep_fused),
            ("fusedmem", prep_fused_mem),
            ("cset", prep_cset),
        ]
        if only:
            preps = [(n, p) for n, p in preps if n in only.split(",")]
        for name, prep in preps:
            best = None
            chk = None
            for _ in range(2):
                t0 = time.monotonic()
                e_deg, nodes = prep(trade_edges(spark))
                ranks = run_pagerank(e_deg, nodes, iters)
                row = ranks.agg(
                    F.sum("rank_fp").alias("s"),
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.hash("node", "rank_fp").cast("long")).alias("h"),
                ).collect()[0]
                wall = time.monotonic() - t0
                chk = (row["s"], row["n"], row["h"])
                best = wall if best is None else min(best, wall)
                release_pinned(spark)
            print(
                f"iters={iters:3d} {name:8s} best={best:6.2f}s "
                f"checksum={chk}"
            )


if __name__ == "__main__":
    main()
