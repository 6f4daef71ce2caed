"""Phase-by-phase wall attribution for star_join_view_maintain
(guide §1): build / apply_fact / apply_dim(dp) / apply_dim(ds) / read.
Run: python tools/profile_star_join.py [sf_dir] [cpus]"""

import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = sys.argv[2] if len(sys.argv) > 2 else "32"

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("profile-star-join")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators.matview import (  # noqa: E402
    MaintainedStarJoin,
)
from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators.merge import (  # noqa: E402
    TableStore,
)
from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.sources.tables import (  # noqa: E402
    load_table,
)


def _t(name):
    return load_table(spark, SF_DIR, name)


def run_once(tag):
    marks = []

    def mark(label, t0):
        marks.append((label, time.perf_counter() - t0))

    qty = F.floor(F.col("l_quantity").cast("double") * 100 + 0.5).cast("long")
    fact = (
        _t("lineitem")
        .select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            qty.alias("qty_c"),
        )
        .groupBy("l_orderkey", "l_linenumber")
        .agg(
            F.min("l_partkey").alias("l_partkey"),
            F.min("l_suppkey").alias("l_suppkey"),
            F.min("qty_c").alias("qty_c"),
        )
    )
    dp = _t("part").select("p_partkey", "p_brand")
    ds = _t("supplier").select(
        "s_suppkey", "s_name", F.col("s_nationkey").cast("int").alias("s_nat")
    )
    store = TableStore(
        spark, tempfile.mkdtemp(prefix="pulselake_star_prof_"), keep_versions=5
    )
    sj = MaintainedStarJoin(
        store,
        "v",
        ["l_orderkey", "l_linenumber"],
        {"dp": ("l_partkey", "p_partkey"), "ds": ("l_suppkey", "s_suppkey")},
    )
    t0 = time.perf_counter()
    sj.build(fact, {"dp": dp.filter(F.col("p_partkey") % 3 != 0), "ds": ds})
    mark("build", t0)
    t0 = time.perf_counter()
    sj.apply_fact(
        fact.filter(F.col("l_orderkey") % 20 == 1).withColumn(
            "qty_c", F.col("qty_c") + F.lit(777)
        )
    )
    mark("apply_fact", t0)
    t0 = time.perf_counter()
    sj.apply_dim(
        "dp",
        dp.filter(F.col("p_partkey") % 3 == 0).unionByName(
            dp.filter(
                (F.col("p_partkey") % 3 != 0) & (F.col("p_partkey") % 7 == 1)
            ).withColumn("p_brand", F.lit("RETAGGED"))
        ),
    )
    mark("apply_dim_dp", t0)
    t0 = time.perf_counter()
    sj.apply_dim(
        "ds",
        ds.filter(F.col("s_suppkey") % 9 == 0)
        .select(
            "s_suppkey",
            F.lit(None).cast("string").alias("s_name"),
            F.lit(None).cast("int").alias("s_nat"),
        )
        .unionByName(
            ds.filter(F.col("s_suppkey") % 9 == 1).withColumn(
                "s_nat", -F.col("s_nat")
            )
        ),
    )
    mark("apply_dim_ds", t0)
    t0 = time.perf_counter()
    n_versions = len(sj.versions())
    n = (
        sj.read()
        .select(
            "l_orderkey", "l_linenumber", "qty_c",
            F.lit(n_versions).cast("long").alias("n_versions"),
        )
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    mark("read+noop", t0)
    total = sum(d for _, d in marks)
    print(
        f"[{tag}] total={total:6.2f}s  "
        + "  ".join(f"{label}={d:5.2f}" for label, d in marks)
    )
    return total


t0 = time.perf_counter()
spark.range(50_000_000).selectExpr("sum(id)").collect()
print(f"cal={time.perf_counter() - t0:.3f}")
for i in range(3):
    run_once(f"pass{i}")
t0 = time.perf_counter()
spark.range(50_000_000).selectExpr("sum(id)").collect()
print(f"cal={time.perf_counter() - t0:.3f}")
spark.stop()
