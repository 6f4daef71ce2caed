"""Arrow-vectorized (pandas_udf) alternatives for vector math.

The engine's default vector ops are JVM higher-order functions
(``operators.neardup.cosine_similarity``) — zero Python crossing,
oracle-checkable. For embedding-heavy workloads (wide vectors, many
queries) the Arrow path amortizes the Python crossing over whole
batches and uses numpy's SIMD kernels; this module provides it behind
the same semantics. Parity between the two paths is pinned by
``tests/test_vectorized.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def cosine_to_query_pandas(query_vec: list[float]):
    """Returns a pandas_udf Column factory: cosine(embedding, query)
    computed batch-at-a-time in numpy (float64, matching the JVM
    fold's dtype). Usage::

        df.withColumn("cosine", cosine_to_query_pandas(q)("embedding"))
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.sqrt((q * q).sum())

    @pandas_udf("double")
    def _cos(vecs: pd.Series) -> pd.Series:
        # one vstack per Arrow batch: (batch, dim) matrix ops
        m = np.vstack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        dots = m @ q
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(dots / (norms * qn))

    return _cos


def knn_brute_force_pandas(
    df,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Exact cosine top-k via the Arrow path — same contract as
    ``operators.similarity.knn_brute_force`` (cosine desc, id asc)."""
    scored = df.withColumn(
        "cosine", F.round(cosine_to_query_pandas(query_vec)(F.col(vec_col)), 6)
    )
    return (
        scored.select(id_col, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
