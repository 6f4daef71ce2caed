"""Query catalog package.

``QUERIES`` is re-ordered here so that queries which do **not** yet have
a green driver CORRECTNESS row enumerate first: the external driver
checks at most 50 queries per round in ``__spark_entry__.queries()``
dict order (insertion order), so putting the never-yet-checked entries
first guarantees they get a row this round. Queries proven green in
CORRECTNESS_r01/r02 come after; they remain covered by the local mirror
(`tests/test_catalog_oracle.py`), which runs all of them.

Provenance of driver rows per query is tracked in README.md
("Correctness provenance").
"""

from .catalog import QUERIES, Query

# Queries with no driver CORRECTNESS row in rounds 1-2 (VERDICT.md round 2,
# "What's missing #1"), plus queries newly added in round 3. Keep this
# list under 50 entries so every one is guaranteed a driver row.
_DRIVER_PRIORITY: list[str] = [
    # -- round-2 verdict's 27 never-driver-checked queries --
    "quality_gopher",
    "tfidf_topk_terms",
    "bm25_search",
    "boilerplate_coverage",
    "decontam_ngram_overlap",
    "language_id",
    "clean_text_docs",
    "bigram_counts",
    "sliding_window_agg",
    "ts_similarity_search",
    "split_assign",
    "hash_sample_docs",
    "stratified_sample_events",
    "source_cap_sample",
    "zorder_file_stats",
    "cms_heavy_hitters",
    "full_outer_reconcile",
    "multimodal_frames",
    "multimodal_features",
    "shipping_priority",
    "regional_volume",
    "order_priority_semi",
    "distinct_agg",
    "approx_distinct_agg",
    "salted_join_agg",
    "unpivot_order_metrics",
    "grouping_sets_orders",
    # -- new in round 3 (never had a chance at a driver row) --
    "range_join_binned_report",
    "sliding_window_avg",
    "decontam_ngram_overlap_shuffle",
    "group_cap_presampled",
    "skewed_join_plain",
    "skewed_join_salted",
    "embedding_quantize_int8",
    "knn_int8",
    "redact_pii_docs",
    "cdf_stream_changes",
    "cdf_changes_since",
    "store_merge_pruned",
    "stateful_sessionize_gaps",
    "pack_sequences_docs",
    "temperature_mixture_sample",
    "top_bigram_concentration",
    "training_corpus_funnel",
    # -- checked only in round 1 (stale; re-verify) --
    "neardup_clusters",
    "dedup_canonical_docs",
    "multimodal_resize",
]


def _reorder_for_driver() -> None:
    ordered: dict[str, Query] = {}
    for name in _DRIVER_PRIORITY:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    for name, q in QUERIES.items():
        if name not in ordered:
            ordered[name] = q
    # mutate in place: every `from .catalog import QUERIES` importer
    # holds a reference to this same dict object
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder_for_driver()

__all__ = ["QUERIES", "Query"]
