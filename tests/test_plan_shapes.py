"""Physical-plan regression tests — the ``.explain("formatted")``
audit from SCALE.md turned into assertions, so a refactor can't
silently lose predicate pushdown, column pruning, a broadcast hint, or
reintroduce a cartesian into a scale-path query. These are the
properties that decide whether a plan survives 100 TB, independent of
what any row-level test can see.
"""

from __future__ import annotations

import contextlib
import io
import os
import re

import pytest

from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.plans import (
    QUERIES,
)

SF_DIR = os.environ.get("PULSELAKE_TEST_SF_DIR", "/root/testdata/sf0.001")


def plan_of(spark, name: str, mode: str = "formatted", execute: bool = False) -> str:
    df = QUERIES[name].spark(spark, SF_DIR)
    if execute:
        # AQE only reveals the final plan (codegen ids, chosen join
        # strategies) after execution — and only for an action on THIS
        # DataFrame's own query execution (a write wraps a new plan)
        df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_pricing_summary_pushdown_and_partial_agg(spark):
    plan = plan_of(spark, "pricing_summary", execute=True)
    assert "isFinalPlan=true" in plan
    # the shipdate filter must reach the parquet scan…
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split(
        "PushedFilters"
    )[1].split("]")[0]
    # …and the aggregation must be partial+final (map-side combine)
    assert plan.count("HashAggregate") >= 2
    # formatted mode tags codegen'd operators with "[codegen id : N]"
    assert "codegen id" in plan


def test_filter_project_prunes_columns(spark):
    plan = plan_of(spark, "filter_project")
    scan = plan.split("ReadSchema")[1].splitlines()[0]
    # the lineitem scan reads only what the projection needs — a scan
    # hauling all 16 columns for a narrow projection is wrong at scale
    assert "l_comment" not in scan
    assert "PushedFilters: [" in plan


def test_dim_joins_broadcast_not_sortmerge(spark):
    for name in ("session_stats_dim", "dim_join_enrich", "derived_date_dim"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_broadcast_guard_hints_small_and_drops_large(spark):
    """maybe_broadcast (round-3 verdict #6): small dims keep the
    explicit hint; dims past the byte guard lose it, so the planner /
    AQE decides instead of a forced OOM-risk broadcast. The assert is
    on the logical ResolvedHint — auto-broadcast may still pick a
    broadcast join physically for a tiny test dim, which is exactly
    the intended fallback."""
    import pyspark.sql.functions as F
    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators.joins import (
        broadcast_dim_join,
        maybe_broadcast,
    )

    fact = spark.range(1000).withColumnRenamed("id", "k")
    dim = spark.range(100).withColumnRenamed("id", "k").withColumn(
        "attr", F.col("k") * 2
    )

    def analyzed(df) -> str:
        return df._jdf.queryExecution().analyzed().toString()

    small = broadcast_dim_join(fact, dim, ["k"])
    assert "ResolvedHint" in analyzed(small)
    large = broadcast_dim_join(fact, dim, ["k"], max_bytes=0)
    assert "ResolvedHint" not in analyzed(large)
    # the guarded path is semantically identical
    assert sorted(r["k"] for r in large.collect()) == sorted(
        r["k"] for r in small.collect()
    )
    # maybe_broadcast returns the plain frame untouched past the guard
    assert maybe_broadcast(dim, max_bytes=0) is dim


def test_range_and_interval_joins_are_equi_keyed(spark):
    # the BETWEEN/interval predicates must ride an equi join as a
    # residual condition — never a nested-loop over the fact table
    for name in ("range_join_report", "interval_pairing", "asof_attribution"):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_range_join_binned_is_equi_join_on_bin(spark):
    # the KEYLESS range join: binning must turn the BETWEEN into an
    # equi join on the bin column — the whole point of the rewrite is
    # that no nested-loop ever materializes without an equi key
    plan = plan_of(spark, "range_join_binned_report")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan  # a real join happened, on the derived bin


def test_topk_uses_take_ordered(spark):
    plan = plan_of(spark, "topk_revenue")
    # global sort + limit must fuse into per-partition heaps
    assert "TakeOrderedAndProject" in plan


def test_bucketed_neardup_has_no_cartesian_but_baseline_does(spark):
    bucketed = plan_of(spark, "embedding_neardup_bucketed")
    assert "BroadcastNestedLoopJoin" not in bucketed
    assert "CartesianProduct" not in bucketed
    # the all-pairs baseline IS the nested loop — the contrast this
    # catalog documents (correctness baseline vs scale path)
    baseline = plan_of(spark, "embedding_neardup")
    assert "BroadcastNestedLoopJoin" in baseline


def test_lsh_pairs_no_cartesian_and_reuses_bands(spark):
    plan = plan_of(spark, "minhash_lsh_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # cache_bands: the banded table feeds both join sides from memory
    # instead of recomputing the shingle→hash→agg pipeline twice
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan


def test_semi_anti_joins_stay_semi(spark):
    # EXISTS/NOT EXISTS must not degrade to inner join + distinct
    for name, kind in (
        ("semi_join_active", "LeftSemi"),
        ("anti_join_dormant", "LeftAnti"),
    ):
        plan = plan_of(spark, name)
        assert kind in plan, name


@pytest.mark.parametrize(
    "name", ["quality_gopher", "split_assign", "stratified_sample_events"]
)
def test_map_side_ops_have_no_shuffle(spark, name):
    # quality gating / splits / sampling are pure map work: any
    # Exchange in the plan means someone added an accidental shuffle
    plan = plan_of(spark, name)
    assert "Exchange" not in plan, name


def test_tfidf_no_cartesian_single_broadcast_scalar(spark):
    plan = plan_of(spark, "tfidf_topk_terms")
    # corpus-size N must ride in as a broadcast one-row aggregate (the
    # crossJoin of a 1-row DF becomes BroadcastNestedLoop — fine at
    # one row), never a CartesianProduct over data-sized inputs
    assert "CartesianProduct" not in plan
    # tf and df aggs both partial+final
    assert plan.count("HashAggregate") >= 4


def test_bm25_broadcasts_stats_filters_before_agg(spark):
    plan = plan_of(spark, "bm25_search")
    assert "CartesianProduct" not in plan
    # the query-term filter must run BEFORE the tf aggregation (on the
    # exploded tokens), so only hits shuffle: in the formatted plan the
    # isin filter appears below the first HashAggregate
    assert "term" in plan and "IN (" in plan or "isin" in plan.lower() or "term#" in plan
    assert "BroadcastHashJoin" in plan  # df join rides a broadcast


def test_sliding_window_single_shuffle(spark):
    import re

    plan = plan_of(spark, "sliding_window_agg")
    # window expansion is map-side (Expand), then ONE exchange for the
    # (window, group) agg; formatted mode prints each node twice (tree
    # + detail), so count the detail-section headers
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Expand" in plan
    assert "CartesianProduct" not in plan


def test_ts_similarity_broadcasts_reference(spark):
    plan = plan_of(spark, "ts_similarity_search")
    # the reference series joins broadcast — the scan stays linear
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_language_id_is_pure_map_side(spark):
    # language ID is per-row column math: any Exchange is a bug
    plan = plan_of(spark, "language_id")
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode — array ops stay packed


def test_boilerplate_single_explode_single_big_shuffle(spark):
    import re

    plan = plan_of(spark, "boilerplate_coverage")
    # ONE explode (the agg+join-back formulation computed it twice)
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1
    # window by shingle + final doc agg = two data exchanges, plus the
    # guarded parallelism bump of the single-file local input
    # (ensure_min_parallelism — a plan-time no-op at real input-split
    # counts, so at scale this is the original two)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 3
    assert "BroadcastExchange" not in plan
    assert "CartesianProduct" not in plan


def test_segment_dedup_two_shuffles_one_explode(spark):
    import re

    plan = plan_of(spark, "segment_dedup_docs")
    # one explode (position sequence), window by segment + doc
    # reassembly agg = exactly two exchanges; the corpus never
    # broadcasts and nothing goes cartesian
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert "BroadcastExchange" not in plan
    assert "CartesianProduct" not in plan


def test_shard_manifest_no_global_window(spark):
    plan = plan_of(spark, "shard_manifest_docs")
    # the prefix sums run per hash-range bucket; a Window with an empty
    # partition spec would serialize the corpus through one task
    assert "Window" in plan
    assert "PartitionBy: []" not in plan and "partitionBy=[]" not in plan
    # bucket prefixes ride a broadcast join; no cartesian
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_length_p99_ordered_window_over_histogram_only(spark):
    import re

    plan = plan_of(spark, "length_p99_flags")
    # the cumulative sum's single-partition sort runs AFTER the
    # histogram agg (metadata-scale input): in the formatted plan the
    # Window node must sit above a HashAggregate, and the data-sized
    # side joins the 1-row threshold via broadcast (BNLJ at one row is
    # the intended shape), never a CartesianProduct or SortMergeJoin
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_decontam_broadcasts_bench_grams_only(spark):
    plan = plan_of(spark, "decontam_ngram_overlap")
    # benchmark gram set rides a broadcast; the training side must not
    # shuffle before its per-doc agg, and nothing goes cartesian
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # hash-sample benchmark split must push to the scan as a filter on
    # the training side (deterministic pmod(conv(md5)) predicate)
    assert "pmod" in plan


def test_decontam_shuffle_variant_avoids_broadcast(spark):
    plan = plan_of(spark, "decontam_ngram_overlap_shuffle")
    # the forced past-the-threshold path: gram semi-join must be a
    # shuffled join on the 8-byte hash key, never a broadcast of a
    # (by assumption oversized) gram set, never cartesian
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_decontam_auto_guard_switches_on_size(spark):
    """The size guard actually steers: a tiny threshold forces the
    shuffle path, and both strategies return identical results."""
    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.plans.catalog_ext import (
        _decontam_overlap,
    )

    wide = _decontam_overlap(spark, SF_DIR, strategy="auto")
    narrow = _decontam_overlap(
        spark, SF_DIR, strategy="auto", broadcast_max_grams=1
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        narrow.explain(mode="formatted")
    assert "BroadcastHashJoin" not in buf.getvalue()
    a = {(r["doc_id"], r["n_overlap_grams"]) for r in wide.collect()}
    b = {(r["doc_id"], r["n_overlap_grams"]) for r in narrow.collect()}
    assert a == b and a


def test_cms_broadcasts_sketch_no_cartesian(spark):
    plan = plan_of(spark, "cms_heavy_hitters")
    # the sketch (<= depth*width rows) must ride a broadcast; the token
    # universe is never sort-merge-shuffled against it
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # sketch build must have map-side partial aggregation
    assert plan.count("HashAggregate") >= 4


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """SCALE.md's bucketing-at-ingest prescription, proven: the
    orders⋈lineitem spine join over tables bucketed the same way on
    the join key plans ZERO Exchange (rows co-located by bucket file),
    while the identical plain-parquet join plans one per side."""
    import contextlib as _ctx
    import io as _io

    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.sources import (
        bucketed,
        load_table,
    )

    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")

    def plan(df) -> str:
        buf = _io.StringIO()
        with _ctx.redirect_stdout(buf):
            df.explain(mode="formatted")
        return buf.getvalue()

    # model the at-scale condition: neither spine side is broadcastable
    # (at 100 TB they aren't) — otherwise the planner broadcasts the
    # tiny test table and disables bucketed scans entirely
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = o.join(li, o.o_orderkey == li.l_orderkey)
        assert plan(plain).count("Exchange") >= 2  # both sides shuffle
        bucketed.ingest_bucketed(o, "t_orders_b", ["o_orderkey"], n_buckets=8)
        bucketed.ingest_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "t_lineitem_b",
            ["o_orderkey"],
            n_buckets=8,
        )
        ob = bucketed.read_bucketed(spark, "t_orders_b")
        lb = bucketed.read_bucketed(spark, "t_lineitem_b")
        joined = ob.join(lb, "o_orderkey")
        p = plan(joined)
        assert "Exchange" not in p, p
        assert "SortMergeJoin" in p
        # and it actually runs, producing the same rows as the plain join
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_ivf_cell_partitioned_probe_prunes_partitions(spark, tmp_path):
    """The IVF docstring's at-scale prescription, proven: assign cells
    at ingest, write partitioned by cell, and a probe restricted to
    nprobe cells plans a scan whose PartitionFilters prune the other
    cells — the probe reads candidate partitions only, never the full
    corpus."""
    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators import (
        similarity,
    )
    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.sources import (
        load_table,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = [
        list(r["embedding"])
        for r in emb.filter(emb.vec_id < 4).orderBy("vec_id").collect()
    ]
    assigned = similarity.ivf_assign(emb, cents)
    path = str(tmp_path / "ivf_cells")
    assigned.write.partitionBy("cell").parquet(path)

    probe = spark.read.parquet(path).filter("cell IN (0, 2)")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain(mode="formatted")
    plan = buf.getvalue()
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "cell" in pf  # the cell filter prunes at the partition layer
    # and pruning is real: only the probed partitions' rows are read
    full = spark.read.parquet(path)
    assert probe.count() == full.filter("cell IN (0, 2)").count() < full.count()


def test_skewed_join_pair_shapes(spark):
    # the skew pair must measure SHUFFLE joins: the merge hint keeps
    # the dim off the broadcast path on both variants, and the salted
    # variant must not plan a cartesian for the dim replication
    for name in ("skewed_join_plain", "skewed_join_salted"):
        plan = plan_of(spark, name)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize(
    "name", ["redact_pii_docs", "embedding_quantize_int8"]
)
def test_new_map_side_ops_have_no_shuffle(spark, name):
    # PII redaction and int8 quantization are per-row column math: any
    # Exchange means an accidental shuffle crept in
    plan = plan_of(spark, name)
    assert "Exchange" not in plan, name


def test_quality_classifier_is_pure_map(spark):
    # model inference must be map-side: literal weight map + fold,
    # zero exchanges, and the scan reads only (doc_id, text)
    plan = plan_of(spark, "quality_classifier_score")
    assert "Exchange" not in plan
    schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in schema and "lang" not in schema and "source" not in schema


def test_numeric_profile_single_pass(spark):
    # 4 columns x (nulls, exact distinct, min, max, sum) must plan as
    # ONE Expand-based multi-distinct aggregation — not a scan per
    # column: exactly one parquet scan, partial+final aggs
    plan = plan_of(spark, "numeric_profile_lineitem")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Expand" in plan
    assert plan.count("HashAggregate") >= 2


def test_robust_outlier_stats_one_data_scan(spark):
    # every statistic (median, MAD, outlier count) must derive from the
    # persisted value histogram: exactly ONE scan of the events table;
    # all ordered windows run over the cached histogram, never the data
    plan = plan_of(spark, "robust_outlier_events")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan
    assert "CartesianProduct" not in plan


def test_kmeans_refine_assignment_is_map_side(spark):
    # final assignment = literal centroids (no join, no cartesian);
    # the only exchange is the k-row cluster rollup
    plan = plan_of(spark, "kmeans_refine_embeddings")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_bpe_pair_counts_aggregates_over_vocab(spark):
    # pair derivation must hang off the (word, count) aggregate — two
    # hash-agg levels, top-n as TakeOrderedAndProject, no global Sort
    plan = plan_of(spark, "bpe_pair_counts")
    assert "TakeOrderedAndProject" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2


def test_funnel_steps_filter_before_shuffle(spark):
    # each funnel stage must push its event_type filter into the scan
    # (PushedFilters) so only that step's events shuffle — and the
    # user joins must stay equi (no nested loop)
    plan = plan_of(spark, "funnel_conversion")
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "event_type" in pushed
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_event_transitions_single_window_shuffle(spark):
    # one exchange for the per-user window, one for the pair rollup
    plan = plan_of(spark, "event_transitions")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1


def test_fuzzy_match_is_equi_join_on_block(spark):
    # the blocking key must carry the join: equi join, never a
    # cartesian/nested-loop over the part table
    plan = plan_of(spark, "fuzzy_match_parts")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_locf_single_window_shuffle(spark):
    plan = plan_of(spark, "locf_gap_fill")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1


def test_systematic_sample_no_global_window(spark):
    # the prefix sum must stay two-level (bucket-partitioned windows +
    # broadcast prefix join) — a SinglePartition exchange would mean
    # the textbook one-task global cumsum crept back in
    plan = plan_of(spark, "systematic_weighted_sample")
    assert "SinglePartition" not in plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1  # bucket-local


def test_weekly_wow_window_over_aggregated_series(spark):
    # the lag window must run over the |weeks| aggregate, not the fact
    # table: plan order is scan -> partial/final agg -> single-partition
    # window; the window input is the aggregated series
    plan = plan_of(spark, "weekly_revenue_wow")
    assert plan.count("HashAggregate") >= 2   # partial + final first
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    # window comes after the aggregation (formatted mode numbers nodes
    # leaf-first, so the downstream window carries the HIGHER id)
    agg_ids = [int(m) for m in re.findall(r"\((\d+)\) HashAggregate", plan)]
    win_ids = [int(m) for m in re.findall(r"\((\d+)\) Window", plan)]
    assert min(win_ids) > max(agg_ids)


def test_catalog_wide_plan_lint(spark):
    """Systemic plan governance: EVERY batch catalog query must plan
    without a CartesianProduct (data x data nested loop) and without
    BatchEvalPython (row-at-a-time Python UDF — Arrow paths like
    MapInPandas/ArrowEvalPython are the sanctioned escape hatches).
    Streaming-tagged queries are exercised by their own oracle runs
    (building them here would execute the stream).

    This complements the per-query shape tests above: those pin
    specific good shapes; this one stops BAD shapes from entering any
    of the ~120 queries unnoticed.
    """
    allow_cartesian = {
        # deliberately-registered all-pairs BASELINE (its bucketed
        # variant is the scale path and is asserted cartesian-free)
        "embedding_neardup",
    }
    failures = []
    for name, q in QUERIES.items():
        if "streaming" in q.tags:
            continue
        try:
            plan = plan_of(spark, name)
        except Exception as exc:  # building must not error either
            failures.append(f"{name}: build failed: {exc}")
            continue
        if "CartesianProduct" in plan and name not in allow_cartesian:
            failures.append(f"{name}: CartesianProduct")
        if "BatchEvalPython" in plan:
            failures.append(f"{name}: row-at-a-time Python UDF")
    assert not failures, failures


def test_psi_and_interp_one_data_scan_each(spark):
    # psi: one (value, cohort) histogram feeds everything via persist;
    # interp: bounds + union + windows all on the one events scan pair
    plan = plan_of(spark, "feature_drift_psi")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    # the per-period trend generalization keeps the same contract
    plan_t = plan_of(spark, "psi_trend_weekly")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan_t)) == 1
    assert "CartesianProduct" not in plan_t.replace(
        "BroadcastNestedLoopJoin", ""
    )
    plan2 = plan_of(spark, "interpolate_daily_values")
    # the union legitimately reads events twice (observations + bounds)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan2)) <= 2
    assert "CartesianProduct" not in plan2


def test_iterative_graph_lineage_is_bounded(spark):
    """r5 verdict #1: pagerank/label_propagation truncate lineage with
    localCheckpoint every checkpoint_every iterations, so the FINAL
    plan holds at most one checkpoint window of join stages no matter
    how many iterations ran — iters=12 with a 4-wide window must cost
    the same plan depth as a plain iters=4 run."""
    import pyspark.sql.functions as F
    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators.cache import (
        release_pinned,
    )
    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators.graph import (
        label_propagation,
        pagerank,
    )

    edges = spark.range(60).select(
        F.concat(F.lit("n"), (F.col("id") % 20)).alias("src"),
        F.concat(F.lit("n"), ((F.col("id") * 7 + 3) % 20)).alias("dst"),
    )

    def joins_in_plan(df) -> int:
        return df._jdf.queryExecution().optimizedPlan().toString().count("Join")

    # bounded lineage: 12 and 20 iterations with the same 4-wide window
    # both end exactly 4 iterations past their last cut, so their final
    # plans must hold the SAME number of joins — depth cannot leak in.
    # (An equality against an un-truncated 4-iter run would conflate
    # this with how much prep lineage the initial rank table embeds.)
    deep = pagerank(edges, iters=12, checkpoint_every=4)
    deeper = pagerank(edges, iters=20, checkpoint_every=4)
    assert joins_in_plan(deep) == joins_in_plan(deeper)
    # and truncation never plans MORE joins than the un-cut short run
    shallow = pagerank(edges, iters=4, checkpoint_every=100)
    assert joins_in_plan(deep) <= joins_in_plan(shallow)
    # truncation is a plan optimization, not a semantics change —
    # checked at 6 iterations (deliberately small: the UN-truncated
    # deep chain is itself the pathological compile-time case this
    # feature removes)
    assert sorted(map(tuple, pagerank(edges, iters=6, checkpoint_every=2).collect())) == sorted(
        map(tuple, pagerank(edges, iters=6, checkpoint_every=100).collect())
    )
    deep_lpa = label_propagation(edges, iters=12, checkpoint_every=4)
    shallow_lpa = label_propagation(edges, iters=4, checkpoint_every=100)
    assert joins_in_plan(deep_lpa) == joins_in_plan(shallow_lpa)
    assert sorted(
        map(tuple, label_propagation(edges, iters=5, checkpoint_every=2).collect())
    ) == sorted(
        map(
            tuple,
            label_propagation(edges, iters=5, checkpoint_every=100).collect(),
        )
    )
    release_pinned()


def test_merge_scd1_fused_clustering_plans_one_exchange(spark):
    """r14 verdict ask #4: the merge-fusion claim needs a plan
    artifact. The fused form (cluster_into) must plan exactly ONE
    Exchange — hashpartitioning on the bucket column — with the
    window riding that partitioning (HashPartitioning(bucket)
    satisfies ClusteredDistribution(bucket, *keys) because bucket is
    a function of the keys); the unfused form plans a separate
    window exchange. Results must be identical either way."""
    import re

    from pyspark.sql import functions as F

    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators.merge import (
        merge_scd1,
    )

    target = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    source = spark.range(250, 600).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    bucket = F.pmod(F.abs(F.xxhash64("k")), F.lit(32)).cast("int")

    fused = merge_scd1(
        target, source, ["k"], cluster_into=("__bucket", bucket)
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fused.explain(mode="formatted")
    plan = buf.getvalue()
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1, plan
    # ...and that one exchange is the bucket clustering, not a key hash
    assert "__bucket" in plan[plan.index(") Exchange"):].split("Arguments")[1].splitlines()[0]
    # one Window (plus, on 3.5+, its WindowGroupLimit pre-filter)
    assert len(re.findall(r"\(\d+\) Window\n", plan)) == 1

    unfused = merge_scd1(target, source, ["k"])
    got = sorted(
        (r.k, r.v) for r in fused.drop("__bucket").collect()
    )
    want = sorted((r.k, r.v) for r in unfused.collect())
    assert got == want


def test_fuse_window_with_clustering_guard():
    """The §2 parallelism guard: fusion requires hash mode, a
    window-shaped policy, and n_buckets wide enough to occupy the
    cluster (the fused exchange hashes on the bucket alone, so
    n_buckets caps the window sort's task count)."""
    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators.merge import (
        fuse_window_with_clustering,
    )

    hash32 = {"mode": "hash", "n_buckets": 32, "keys": ["k"]}
    hash4 = {"mode": "hash", "n_buckets": 4, "keys": ["k"]}
    coltab = {"mode": "column", "column": "day", "keys": ["k"]}

    assert fuse_window_with_clustering(hash32, "scd1", None, 32)
    assert fuse_window_with_clustering(hash32, "full_upsert", None, 8)
    assert fuse_window_with_clustering(hash32, "upsert_delete", None, 32)
    # under-bucketed: parallelism collapse — keep two exchanges
    assert not fuse_window_with_clustering(hash4, "scd1", None, 32)
    assert fuse_window_with_clustering(hash4, "scd1", None, 4)
    # column-mode partitions are not key-determined
    assert not fuse_window_with_clustering(coltab, "scd1", None, 8)
    # join-shaped policies have no window to fuse
    assert not fuse_window_with_clustering(hash32, "scd2", None, 8)
    assert not fuse_window_with_clustering(hash32, "cdc_versioned", None, 8)
    # update_cols switches full_upsert to its join form
    assert not fuse_window_with_clustering(hash32, "full_upsert", ["v"], 8)
