"""PulseLake-Spark — a PySpark-native lakehouse analytics engine.

A brand-new, Spark-first implementation of the query and
data-processing capabilities of the reference system
``sandeepdivakaruni/PulseLake-A-Lakehouse-Based-Fitbit-Data-Analysis-System``
(a Medallion bronze→silver→gold lakehouse over Fitbit-style event
streams), generalized into a reusable engine:

- ``session``    — scale-tuned SparkSession factory (AQE, shuffle sizing,
                   Arrow, RocksDB state store for streaming).
- ``schemas``    — declared StructType registry (schema-on-write; no
                   inference), mirroring the reference's DDL-first design
                   (reference ``Setup/02-setup.py``).
- ``sources``    — batch + streaming file sources with ingest metadata,
                   Kafka source config, table loading.
- ``operators``  — joins (broadcast-dim, interval, range, as-of,
                   semi/anti), dedup (exact, CDC-latest, MinHash-LSH,
                   SimHash, n-gram Jaccard, embedding-cosine), grouped and
                   multi-dimensional aggregation, top-k, merge/upsert
                   library, similarity search, text analysis, multimodal
                   column plumbing.
- ``functions``  — reusable Column-expression factories (binning,
                   validity flags, epoch casts) — the reference's
                   ``age_bins`` pattern (``Silver/05-silver.py:291-304``)
                   generalized; no row-at-a-time UDFs in hot paths.
- ``plans``      — the query catalog exercised by the driver harness and
                   the Fitbit medallion workload re-expressed as
                   DataFrame plans.
- ``streaming``  — watermarked dedup, stream-stream interval joins,
                   foreachBatch upsert sinks, dependency-wave
                   orchestrator.

Everything is public Apache Spark API; Delta Lake is optional and gated
behind an import-try (``operators.merge``).
"""

from .session import get_spark, stop_spark
from .sources.tables import TABLE_NAMES, load_table, load_tables, register_views

__all__ = [
    "get_spark",
    "stop_spark",
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
]
