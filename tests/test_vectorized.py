"""Parity between the JVM higher-order vector path and the
Arrow/pandas_udf path — both must produce the same top-k and (to 1e-9)
the same cosines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.functions.vectorized import (
    cosine_to_query_pandas,
    knn_brute_force_pandas,
)
from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators.neardup import (
    cosine_similarity,
)
from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators.similarity import (
    knn_brute_force,
)
from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.sources.tables import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings")


def _query_vec(embeddings) -> list[float]:
    row = embeddings.filter(F.col("vec_id") == 0).first()
    return [float(x) for x in row["embedding"]]


def test_cosine_paths_agree(spark, embeddings):
    q = _query_vec(embeddings)
    qlit = F.array(*[F.lit(float(x)) for x in q])
    both = embeddings.select(
        "vec_id",
        cosine_similarity(F.col("embedding"), qlit).alias("jvm"),
        cosine_to_query_pandas(q)(F.col("embedding")).alias("arrow"),
    )
    bad = both.filter(F.abs(F.col("jvm") - F.col("arrow")) > 1e-9).count()
    assert bad == 0


def test_knn_paths_agree(spark, embeddings):
    q = _query_vec(embeddings)
    a = knn_brute_force(embeddings, q, k=15).collect()
    b = knn_brute_force_pandas(embeddings, q, k=15).collect()
    assert [(r["vec_id"], r["cosine"]) for r in a] == [
        (r["vec_id"], r["cosine"]) for r in b
    ]
