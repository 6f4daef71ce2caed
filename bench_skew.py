#!/usr/bin/env python
"""Skew-mitigation micro-benchmark: plain vs salted shuffle join on a
deterministically skewed fact (one key owns ~20% of rows).

The headline bench's catalog pair (skewed_join_plain/salted) measures
the engine's default config at the bench SF, where AQE's runtime skew
split + the small absolute hot-key size make the two indistinguishable
— itself a result worth recording. THIS script measures the regime the
manual salt exists for: AQE unavailable (streaming foreachBatch plans)
and a hot key big enough that one reducer's sort dominates the stage.
The fact side is amplified AMP× with an explode so the hot key reaches
executor-meaningful size at local testdata scale; amplification and
skew are deterministic (portable hash), so runs are comparable.

Prints ONE JSON line:
  {"metric": "skew_join_bench", "plain_sec": .., "salted_sec": ..,
   "speedup": .., "amp": .., "aqe": "off", "sf": ..}
"""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import functions as F

import pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark as pl
from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.functions.expressions import (
    portable_hash64,
)
from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators.joins import (
    salted_join,
)
from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.sources.tables import (
    load_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMP = int(os.environ.get("SPARK_GRAFT_SKEW_AMP", "20"))
RUNS = 3


def _sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = pl.get_spark(app_name="pulselake-bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment"
    )

    def skewed_fact():
        e = load_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "value"
        )
        e = e.withColumn("__r", F.explode(F.sequence(F.lit(1), F.lit(AMP))))
        hot = (
            F.pmod(
                portable_hash64(F.concat_ws(":", "event_id", "__r"), seed=3),
                F.lit(5),
            )
            == 0
        )
        return e.select(
            F.when(hot, F.lit(1)).otherwise(F.col("user_id")).alias(
                "c_custkey"
            ),
            "value",
        )

    def agg(joined):
        return joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("t")
        )

    def plain():
        return agg(skewed_fact().join(cust.hint("merge"), "c_custkey"))

    def salted():
        return agg(
            salted_join(
                skewed_fact(), cust.hint("merge"), on=["c_custkey"],
                salt_buckets=8,
            )
        )

    def best_of(fn) -> float:
        fn().write.format("noop").mode("overwrite").save()  # warm-up
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    p, s = best_of(plain), best_of(salted)
    print(
        json.dumps(
            {
                "metric": "skew_join_bench",
                "plain_sec": p,
                "salted_sec": s,
                "speedup": round(p / s, 2),
                "amp": AMP,
                "aqe": "off",
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
