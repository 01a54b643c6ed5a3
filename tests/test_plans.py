"""Plan-property tests: the scale guarantees PERF.md claims, asserted
mechanically via plans.inspect — pushdown reaches the scan, dims
broadcast, narrow operators don't shuffle."""

import pytest
from pyspark.sql import functions as F

from datafusion_archive_spark.plans import summarize
from datafusion_archive_spark.queries import QUERIES


def test_filter_pushdown_and_pruning(spark, sf_dir):
    s = summarize(QUERIES["scan_filter_project"](spark, sf_dir))
    pushed = ";".join(s.pushed_filters)
    assert "GreaterThan(l_quantity" in pushed
    assert "LessThan(l_discount" in pushed
    assert s.scans_pruned_to(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount",
    ), s.read_schemas


def test_q1_single_shuffle_aggregation(spark, sf_dir):
    s = summarize(QUERIES["q1_pricing_summary"](spark, sf_dir))
    # one hash exchange (partial→final agg); the sort adds a range
    # exchange, not a hash one
    assert s.n_hash_exchanges == 1, s.raw
    assert not s.joins


def test_q5_dimensions_broadcast(spark, sf_dir):
    s = summarize(QUERIES["q5_local_supplier"](spark, sf_dir))
    assert "BroadcastHashJoin" in s.joins
    assert "CartesianProduct" not in s.joins


def test_text_stats_is_scan_side(spark, sf_dir):
    s = summarize(QUERIES["text_stats"](spark, sf_dir))
    assert s.n_hash_exchanges == 0, "text metrics must not shuffle"
    assert not s.joins


def test_sessionize_single_shuffle(spark, sf_dir):
    s = summarize(QUERIES["events_sessionize"](spark, sf_dir))
    assert s.n_hash_exchanges == 1, (
        "lag + running sum + aggs should reuse one user_id partitioning:\n"
        + s.raw
    )


def test_ann_bruteforce_corpus_never_shuffles(spark, sf_dir):
    s = summarize(QUERIES["ann_bruteforce"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in s.joins  # query side broadcast
    # ranking shuffles the scored pairs once; corpus scan itself no
    assert s.n_hash_exchanges <= 1


def test_q7_shipdate_filter_pushed_to_scan(spark, sf_dir):
    """The q7 year restriction must reach the lineitem parquet scan as
    a pushed shipdate range, not run post-aggregate."""
    s = summarize(QUERIES["q7_volume_between_nations"](spark, sf_dir))
    pushed = ";".join(s.pushed_filters)
    assert "l_shipdate" in pushed, s.pushed_filters


def test_ngram_jaccard_skew_guard_in_plan(spark, sf_dir):
    """The registered ngram-Jaccard query must run with the
    stop-shingle df-cap engaged — the plan contains the document-
    frequency filter feeding the shingle self-join."""
    s = summarize(QUERIES["dedup_ngram_jaccard"](spark, sf_dir))
    assert "(df#" in s.raw and "<= 50" in s.raw, s.raw


def test_salted_join_no_cartesian(spark, sf_dir):
    s = summarize(QUERIES["salted_join_agg"](spark, sf_dir))
    assert "CartesianProduct" not in s.joins
    assert "BroadcastNestedLoopJoin" not in s.joins


def test_decontaminate_benchmark_set_broadcast(spark, sf_dir):
    """The benchmark gram set must broadcast — the corpus side of the
    membership probe never shuffles."""
    s = summarize(QUERIES["decontaminate_ngram_overlap"](spark, sf_dir))
    assert "BroadcastHashJoin" in s.joins, s.joins
    assert "CartesianProduct" not in s.joins


def test_vocab_topk_is_take_ordered(spark, sf_dir):
    """Top-k must not globally sort: TakeOrdered keeps per-partition
    heaps + a driver merge."""
    s = summarize(QUERIES["vocab_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in s.raw, s.raw


def test_chunking_is_map_only(spark, sf_dir):
    s = summarize(QUERIES["chunk_documents"](spark, sf_dir))
    assert s.n_hash_exchanges == 0, "chunking must not shuffle:\n" + s.raw
    assert not s.joins


def test_exists_correlated_decorrelates(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS must decorrelate into semi/anti
    hash joins — no per-row subquery, no cartesian product."""
    s = summarize(QUERIES["exists_correlated"](spark, sf_dir))
    assert "LeftSemi" in s.raw, s.raw
    assert "LeftAnti" in s.raw, s.raw
    assert "CartesianProduct" not in s.joins


def test_latest_per_key_single_shuffle(spark, sf_dir):
    """CDC latest-row compaction: one hash Exchange on the key, no
    join (the self-join formulation would shuffle orders twice)."""
    s = summarize(QUERIES["latest_per_key"](spark, sf_dir))
    assert s.n_hash_exchanges == 1, s.raw
    assert not s.joins


def test_cross_join_grid_aggregates_before_join(spark, sf_dir):
    """The enumeration grid joins per-cell aggregates, not raw facts:
    the fact aggregate must sit below the grid join, and both grid
    sides broadcast."""
    s = summarize(QUERIES["cross_join_grid"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in s.joins or "CartesianProduct" not in s.joins
    assert "HashAggregate" in s.raw


def test_repetition_metrics_are_scan_side(spark, sf_dir):
    """Gopher repetition rules are per-document array expressions —
    they must never shuffle."""
    s = summarize(QUERIES["text_repetition_gopher"](spark, sf_dir))
    assert s.n_hash_exchanges == 0, s.raw
    assert not s.joins


def test_gapfill_no_cartesian_and_bounded_shuffles(spark, sf_dir):
    """Gap-fill is grid-join-shaped: bucket agg + per-user bounds +
    grid left-join + one window — at most the agg's and the window's
    hash exchanges, never a cartesian grid expansion."""
    s = summarize(QUERIES["events_gapfill_locf"](spark, sf_dir))
    assert "CartesianProduct" not in s.joins
    assert s.n_hash_exchanges <= 3, s.raw


def test_null_safe_join_is_hash_join(spark, sf_dir):
    """EqualNullSafe must plan as a hash/SMJ join key, never a
    cartesian product with a post-filter."""
    s = summarize(QUERIES["join_null_safe"](spark, sf_dir))
    assert "CartesianProduct" not in s.joins, s.joins
    assert "BroadcastNestedLoopJoin" not in s.joins, s.joins


def test_partitioned_scan_prunes_directories(spark, sf_dir):
    """The year predicate must reach the scan as a PartitionFilter
    (directory pruning), not a post-scan filter."""
    s = summarize(QUERIES["partitioned_pruning"](spark, sf_dir))
    pf = ";".join(s.partition_filters)
    assert "o_year" in pf and "1997" in pf, s.partition_filters


def test_no_cartesian_in_certification_window(spark, sf_dir):
    """Bulk scale guard: no query in the certification window may plan
    a CartesianProduct. cross_join_grid is the one deliberate
    enumeration grid (dims-only, aggregate-before-join) and is
    exempted explicitly."""
    from datafusion_archive_spark.queries import _FIRST_50

    allowed = {"cross_join_grid"}
    offenders = {}
    for name in _FIRST_50:
        if name in allowed:
            continue
        s = summarize(QUERIES[name](spark, sf_dir))
        if "CartesianProduct" in s.joins:
            offenders[name] = s.joins
    assert not offenders, offenders


def test_heavy_hitters_two_phase_agg_single_window(spark, sf_dir):
    """Explode fan-out must be absorbed by a map-side partial
    aggregate: one hash Exchange for the (lang, token) agg, one for
    the per-lang ranking window — never a shuffle of raw tokens."""
    s = summarize(QUERIES["heavy_hitters_topk"](spark, sf_dir))
    assert s.n_hash_exchanges == 2, s.raw
    assert not s.joins


def test_salted_sampler_spreads_the_window_sort(spark, sf_dir):
    """The salted two-phase top-k exists to break the per-language
    sort hotspot: the first window must partition by (lang, salt) —
    visible as a hashpartitioning on two keys — and only the tiny
    candidate set may reach the per-lang window."""
    s = summarize(QUERIES["weighted_sample_per_lang_salted"](spark, sf_dir))
    assert s.n_hash_exchanges == 2, s.raw
    assert "salt" in s.raw and "lang" in s.raw


def test_window_topk_salted_first_phase(spark, sf_dir):
    """VERDICT r7 #2: the (flag,status) top-3 must not funnel the
    fact scan into a ~6-partition window. The first (heavy) window
    partitions on (l_returnflag, l_linestatus, salt) — visible as a
    hashpartitioning carrying the salt column — and the second window
    sees only the <= salts*3-per-group candidate set."""
    s = summarize(QUERIES["window_topk_per_group"](spark, sf_dir))
    assert s.n_hash_exchanges == 2, s.raw
    # the heavy first-phase exchange hashes on (keys, salt)
    assert any(
        "salt" in e and "l_returnflag" in e
        for e in s.raw.split("hashpartitioning")[1:]
    ), s.raw


def test_collocations_topk_is_take_ordered(spark, sf_dir):
    """The PMI top-20 must be a TakeOrderedAndProject (per-partition
    heap + merge), never a global sort; unigram counts and the two
    scalar totals join by broadcast."""
    s = summarize(QUERIES["collocations_pmi"](spark, sf_dir))
    assert "TakeOrderedAndProject" in s.raw
    assert "BroadcastHashJoin" in s.joins
    assert "SortMergeJoin" not in s.joins


def test_ingestion_rows_single_shuffle(spark, sf_dir):
    """Schema-evolution merge and corrupt-row quarantine are scan +
    two-phase aggregate: exactly one hash Exchange each."""
    for name in ("schema_evolution_merge", "quarantine_corrupt_rows"):
        s = summarize(QUERIES[name](spark, sf_dir))
        assert s.n_hash_exchanges == 1, (name, s.raw)
        assert not s.joins, name


def test_containment_mirrors_jaccard_plan(spark, sf_dir):
    """Containment reuses the jaccard candidate machinery: cached
    shingle table (InMemoryTableScan reuse), no cartesian, no SMJ at
    this sf — the per-shingle equi-join stays the only quadratic-ish
    term, guarded by the df cap."""
    s = summarize(QUERIES["dedup_containment"](spark, sf_dir))
    assert "CartesianProduct" not in s.joins
    assert "InMemoryTableScan" in s.raw  # shingles computed once


def _executed_parquet_scans(df) -> int:
    """Count EXECUTED parquet scan nodes — the numbered operators of
    the formatted plan. (Detail sections replay a cached relation's
    stored lineage, so substring counts over the whole text overcount
    plans that reuse an InMemoryTableScan.)"""
    import re

    from datafusion_archive_spark.plans.inspect import plan_string

    nodes = re.findall(r"^\(\d+\) ([A-Za-z ]+)", plan_string(df, "formatted"), re.M)
    return sum(1 for n in nodes if n.startswith("Scan parquet"))


def test_tfidf_single_corpus_scan(spark, sf_dir):
    """TF-IDF derives document frequencies and the doc count from the
    cached (doc, term, tf) table — exactly one parquet scan of the
    corpus; vocab-side joins broadcast."""
    df = QUERIES["tfidf_topk_terms"](spark, sf_dir)
    assert _executed_parquet_scans(df) == 1
    assert "SortMergeJoin" not in summarize(df).joins


def test_collocations_two_corpus_scans(spark, sf_dir):
    """The PMI totals re-aggregate the cached count tables instead of
    re-tokenizing: two parquet scans (unigram + bigram explode), not
    four."""
    df = QUERIES["collocations_pmi"](spark, sf_dir)
    assert _executed_parquet_scans(df) == 2


def test_quality_filter_is_map_only(spark, sf_dir):
    """The composite keep/drop gate must stay scan-side: zero
    Exchanges, no joins — a pure map over the corpus at any scale."""
    s = summarize(QUERIES["quality_filter_pipeline"](spark, sf_dir))
    assert s.n_hash_exchanges == 0, s.raw
    assert not s.joins


def test_transitions_one_corpus_exchange(spark, sf_dir):
    """The Markov transition matrix moves the corpus exactly once (the
    user_id window); the pair agg and row-normalizing window run over
    the |types|^2 matrix. Scan must prune to the four sequence cols."""
    df = QUERIES["events_transitions"](spark, sf_dir)
    s = summarize(df)
    assert s.n_hash_exchanges == 3, s.raw
    assert not s.joins
    assert _executed_parquet_scans(df) == 1
    assert s.scans_pruned_to("event_id", "ts", "user_id", "event_type"), (
        s.read_schemas
    )


def test_mixture_weights_tiny_cross_join_only(spark, sf_dir):
    """Per-language totals ride back via a broadcast of the one-row
    totals aggregate — never a corpus-sided cartesian."""
    s = summarize(QUERIES["mixture_weights"](spark, sf_dir))
    assert "CartesianProduct" not in s.joins
    assert "SortMergeJoin" not in s.joins


def test_pii_redact_is_map_only_with_pushdown(spark, sf_dir):
    """The redaction kernel is a pure scan-side map; the custkey limit
    must reach the parquet scan as a pushed filter."""
    s = summarize(QUERIES["pii_redact"](spark, sf_dir))
    assert s.n_hash_exchanges == 0, s.raw
    assert not s.joins
    assert "LessThanOrEqual(c_custkey" in ";".join(s.pushed_filters), (
        s.pushed_filters
    )


def test_dedup_passages_single_scan_no_cartesian(spark, sf_dir):
    """Passages are sliced from one cached word-array scan; only
    (md5, doc_id) pairs shuffle and the shared-set comes back as an
    equi (semi) join — never all-pairs."""
    df = QUERIES["dedup_passages"](spark, sf_dir)
    assert _executed_parquet_scans(df) == 1
    assert "CartesianProduct" not in summarize(df).joins


def test_perplexity_model_joins_are_equi(spark, sf_dir):
    """The bigram LM scores via equi-joins against vocab-sized count
    tables (the only nested-loop is the one-row V broadcast)."""
    s = summarize(QUERIES["perplexity_bigram"](spark, sf_dir))
    assert "CartesianProduct" not in s.joins
    assert "BroadcastHashJoin" in s.joins or "SortMergeJoin" in s.joins


# round-6 recompute-sweep pins: each of these queries had a tiny
# rollup fanning out uncached, re-running its corpus-sized subtree per
# branch (PERF.md round-6 section). The ceiling is the post-fix scan
# count — a regression that drops the cache re-inflates it.
# The round-7 quantile-upgrade rows pin the RETURNED plan after the
# eager cutpoint search: the returned DataFrame must not re-scan what
# the search already resolved to literals/broadcast tables.
_SCAN_CEILINGS = {
    "percentiles": 0,  # grouped search collapses to a local relation
    "histogram_equi_depth": 1,
    "winsorized_aggs": 1,
    "outliers_mad": 1,
    "percentiles_by_month": 1,
    "atkinson_index": 1,  # cached rollup + literal median
    "hierarchy_closure_rollup": 1,
    "graph_triangle_count": 3,
    "graph_pagerank": 3,
    "minhash_estimate_audit": 4,
    "fdr_bh_nation_tests": 3,
    "assoc_triples": 2,
    "assoc_rules_pairs": 2,
    "dbscan_clusters": 5,
    "entropy_rate_transitions": 1,
    "target_encoding_nation": 3,
    "rfm_segments": 1,
    "kl_divergence_lang": 1,
    "js_divergence_langs": 1,
    "lorenz_curve_deciles": 1,
    "bootstrap_ci_mean": 1,
    "mutual_information_lang_source": 1,
    "psi_price_drift": 2,
    "cumulative_gains": 2,
    "calibration_curve": 4,
    "leakage_traintest_overlap": 2,
    "cohort_ltv_cumulative": 2,
    "double_smoothing_forecast": 1,
    "active_users_stickiness": 1,
    "daily_growth_accounting": 1,
    "newsvendor_stocking": 3,
    "events_funnel": 3,
    "retrieval_metrics_truncation": 4,
    "embedding_quantization_audit": 2,
    "fixed_effects_within": 2,
    "bloom_prefilter_semi_join": 5,
}


@pytest.mark.slow
def test_recompute_sweep_scan_ceilings(spark, sf_dir):
    import pytest as _pytest

    failures = []
    for name, ceiling in _SCAN_CEILINGS.items():
        s = summarize(QUERIES[name](spark, sf_dir))
        if s.n_scans > ceiling:
            failures.append(f"{name}: {s.n_scans} scans > {ceiling}")
    assert not failures, (
        "fan-out recompute regressed (a shared rollup lost its cache):\n"
        + "\n".join(failures)
    )


def test_bucketed_rank_spreads_low_cardinality_windows(spark, sf_dir):
    """Round 8: the per-row rank queries over ~5-value keys
    (window_ntile_dist, quality_quantile_norm, class_rebalance) must
    not hash the fact scan into #groups window partitions. After the
    bucketed_group_rank rewire, the only fact-scale window partitions
    on (key, _bkt) — visible as a hashpartitioning carrying the
    bucket column — and the bare-key exchange only carries the
    bounded (group, bucket) offset grid."""
    for name, key in [
        ("window_ntile_dist", "o_orderpriority"),
        ("quality_quantile_norm", "lang"),
        ("class_rebalance", "lang"),
        ("window_ranks", "c_mktsegment"),
        # keys=[]: global ranks / running sums hash on the bucket alone
        ("gini_customer_spend", None),
        ("spearman_rank_corr", None),
        ("ks_test_two_sample", None),
        ("mann_whitney_u", None),
        ("auc_roc", None),
        ("heaps_law_fit", None),
        ("exponential_fit_gaps", None),
        ("sprt_ab_sequential", None),
        ("wasserstein_drift", None),
        ("anderson_darling_2sample", None),
    ]:
        s = summarize(QUERIES[name](spark, sf_dir))
        assert any(
            "_bkt" in e and (key is None or key in e)
            for e in s.raw.split("hashpartitioning")[1:]
        ), (name, s.raw)


def test_exchange_count_dedupes_cached_subtree_reprints(spark):
    """VERDICT r8 #5: simple-mode explain re-prints a cached subtree's
    plan at every InMemoryTableScan reference, so a fan-out over one
    cached 1-exchange rollup counted as 7 exchanges (and the chained
    rewires as 172+). n_hash_exchanges now dedupes by formatted node
    id: the 7-way fan-out must report the ONE real exchange."""
    base = (
        spark.range(100)
        .groupBy((F.col("id") % 5).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .cache()
    )
    try:
        fan = base
        for _ in range(6):
            fan = fan.unionByName(base)
        s = summarize(fan)
        # the inflation is still visible in the raw simple string...
        assert s.raw.count("Exchange hashpartitioning") == 7
        # ...but the deduped count reports the single physical node
        assert s.n_hash_exchanges == 1
    finally:
        base.unpersist()
