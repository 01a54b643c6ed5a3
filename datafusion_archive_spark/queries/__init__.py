"""The engine's query suite — one entry per operator in SURVEY.md §2
plus the north-star extension surface (text/dedup/similarity/
multimodal/streaming).

Each query is a ``(spark, sf_dir) -> DataFrame`` callable with a
DuckDB-SQL oracle string whose column names and value semantics match
exactly (the driver hash-compares sorted results). Queries without an
oracle (approximate / non-SQL-expressible operators) get a rows-only
check.

Ordering: the driver certifies only the first 50 entries per round, so
the dict is explicitly ordered to rotate un-certified entries into that
window. Round 1 certified the relational/timeseries/text head; round 2
the TPC-H tail + dedup/ANN/multimodal family; round 4 presents every
remaining never-certified entry (sources/sinks, LLM-pipeline tail,
UDAF, plan-IR serde, the fixed ``windows2`` wave, the new registry-UDF
batch twin, and ``approx_aggs`` as an explicit rows-only row), filled
out with the oldest (round-1) certifications.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datafusion_archive_spark.operators.util import release_caches
from datafusion_archive_spark.queries import (
    aggregates2,
    llm,
    nested,
    pipeline,
    pipeline2,
    pipeline3,
    pipeline4,
    pipeline5,
    pipeline6,
    pipeline7,
    pipeline8,
    pipeline9,
    pipeline10,
    pipeline11,
    pipeline12,
    pipeline13,
    pipeline14,
    pipeline15,
    pipeline16,
    pipeline17,
    pipeline18,
    pipeline19,
    pipeline20,
    pipeline21,
    pipeline22,
    pipeline23,
    pipeline24,
    pipeline25,
    pipeline26,
    pipeline27,
    pipeline28,
    pipeline29,
    pipeline30,
    pipeline31,
    pipeline32,
    pipeline33,
    pipeline34,
    pipeline35,
    pipeline36,
    pipeline37,
    pipeline38,
    pipeline39,
    pipeline40,
    pipeline41,
    pipeline42,
    pipeline43,
    pipeline44,
    pipeline45,
    pipeline46,
    pipeline47,
    pipeline48,
    pipeline49,
    pipeline50,
    pipeline51,
    pipeline52,
    pipeline53,
    pipeline54,
    pipeline55,
    pipeline56,
    pipeline57,
    pipeline58,
    pipeline59,
    pipeline60,
    pipeline61,
    pipeline62,
    pipeline63,
    pipeline64,
    pipeline65,
    pipeline66,
    pipeline67,
    pipeline68,
    pipeline69,
    pipeline70,
    pipeline71,
    registry_udf,
    relational,
    sources_io,
    sql2,
    timeseries,
    tpch_more,
    tpch_more2,
    tpch_more3,
    windows2,
)

#: Every query module. tests/test_registration.py asserts this tuple
#: stays in sync with the modules on disk (a module with a QUERIES
#: dict that is missing here is dead code — the round-3 failure mode).
QUERY_MODULES = (
    relational,
    timeseries,
    llm,
    nested,
    tpch_more,
    tpch_more2,
    tpch_more3,
    aggregates2,
    pipeline,
    sources_io,
    windows2,
    registry_udf,
    pipeline2,
    pipeline3,
    pipeline4,
    pipeline5,
    pipeline6,
    pipeline7,
    pipeline8,
    pipeline9,
    pipeline10,
    pipeline11,
    pipeline12,
    pipeline13,
    pipeline14,
    pipeline15,
    pipeline16,
    pipeline17,
    pipeline18,
    pipeline19,
    pipeline20,
    pipeline21,
    pipeline22,
    pipeline23,
    pipeline24,
    pipeline25,
    pipeline26,
    pipeline27,
    pipeline28,
    pipeline29,
    pipeline30,
    pipeline31,
    pipeline32,
    pipeline33,
    pipeline34,
    pipeline35,
    pipeline36,
    pipeline37,
    pipeline38,
    pipeline39,
    pipeline40,
    pipeline41,
    pipeline42,
    pipeline43,
    pipeline44,
    pipeline45,
    pipeline46,
    pipeline47,
    pipeline48,
    pipeline49,
    pipeline50,
    pipeline51,
    pipeline52,
    pipeline53,
    pipeline54,
    pipeline55,
    pipeline56,
    pipeline57,
    pipeline58,
    pipeline59,
    pipeline60,
    pipeline61,
    pipeline62,
    pipeline63,
    pipeline64,
    pipeline65,
    pipeline66,
    pipeline67,
    pipeline68,
    pipeline69,
    pipeline70,
    pipeline71,
    sql2,
)

_ALL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for mod in QUERY_MODULES:
    _ALL_QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

#: Queries intentionally WITHOUT a DuckDB oracle (the driver records a
#: rows-only check). Every _ALL_QUERIES key must be here or in ORACLES
#: — tests/test_registration.py enforces it.
ROWS_ONLY = {
    # approximate aggregates: HLL/KLL sketch outputs are
    # implementation-defined; tests/test_approx_bounds.py pins their
    # relative error against exact DuckDB values instead.
    "approx_aggs",
    # BPE merge training is iterative (merge i depends on the rewrite
    # from merge i-1) — not expressible as one SQL statement; pinned
    # differentially against a pure-Python reference BPE in
    # tests/test_round5b.py.
    "bpe_merges",
    # the encode side consumes the iterative trainer's merge list, so
    # it inherits the same non-SQL-expressible status; the encoder
    # kernel itself is differentially pinned (tests/test_round5c.py).
    "bpe_encode_tokens",
}

#: The round-5 certification window (driver checks entries [:50]).
#: Policy: a query with NO driver row ever is weaker evidence than one
#: whose row is merely old, so never-certified names outrank
#: re-certification. This round added 59 queries (waves 1-9) on top of
#: the 143 with an r1-r4 row of record; the window holds the two
#: round-4 dtype-only red rows (console_script_sql,
#: histogram_equi_depth — oracles now CAST to the Spark dtype;
#: re-certifying closes the last red rows) plus 48 never-certified
#: round-5 names. The 11 round-5 names that don't fit
#: (window_rolling_median, bitwise_aggs, text_sentences,
#: dedup_sentences_cross_doc, geo_grid_join, vocab_richness, zipf_fit,
#: readability_scores, embedding_centroids, gini_customer_spend,
#: interarrival_stats) each have a same-machinery sibling inside the
#: window (weighted_median / histogram_dense for percentile-free
#: quantiles; regression_aggs for numeric agg folds; dedup_passages
#: for sentence splitting; collocations_pmi for token-pair analytics;
#: ks_test_two_sample for distribution stats) and head the round-6
#: window. Round-1-of-record re-certification resumes in round 6; the
#: local dtype-strict gate (tools/check_oracle.py) reproduces the
#: driver hash semantics, so old rows are additionally re-proven
#: locally every round.
_FIRST_50 = [
    # --- new this round (never certified)
    "weighted_sample_per_lang_salted",
    "heavy_hitters_topk",
    "schema_evolution_merge",
    "quarantine_corrupt_rows",
    "collocations_pmi",
    "dedup_containment",
    "outliers_mad",
    "tfidf_topk_terms",
    "quality_filter_pipeline",
    "events_transitions",
    "mixture_weights",
    "pii_redact",
    "dedup_passages",
    "perplexity_bigram",
    "curation_funnel",
    "quality_quantile_norm",
    "snapshot_diff",
    "bpe_merges",  # rows-only by design (iterative; differential pytest)
    "semantic_dedup_clusters",
    "skyline_orders",
    "scd2_event_state",
    "time_decay_agg",
    "shard_manifest",
    "events_anomaly_zscore",
    "window_range_1h",
    "bpe_encode_tokens",  # rows-only (consumes the iterative trainer)
    "class_rebalance",
    "temporal_split_last_k",
    "events_hopping_distinct_users",
    "sales_share_shift",
    # --- round-4 dtype-only failures, oracles fixed
    "console_script_sql",
    "histogram_equi_depth",
    # --- round-5 waves 5-9 (never certified)
    "regression_aggs",
    "data_quality_checks",
    "assoc_rules_pairs",
    "gaps_islands",
    "bloom_prefilter_semi_join",
    "graph_triangle_count",
    "graph_pagerank",
    "rrf_fusion",
    "median_mode_aggs",
    "window_running_distinct",
    "interval_union_time",
    "weighted_median",
    "moving_corr",
    "ab_test_ztest",
    "contingency_stats",
    "ks_test_two_sample",
    "phrase_search_inverted",
    "histogram_dense",
]

# ROUND-6 NOTE (next certification window): head with the round-5
# names that did not fit this round — the 11 from waves 9-12
# (window_rolling_median, bitwise_aggs, text_sentences,
# dedup_sentences_cross_doc, geo_grid_join, vocab_richness, zipf_fit,
# readability_scores, embedding_centroids, gini_customer_spend,
# interarrival_stats) plus EVERYTHING in pipeline15-24 (waves 13-22:
# RFM/Pareto/Benford/EWMA/CUSUM/ACF, divergences + encodings +
# feature hashing + Simpson, JW linkage + bootstrap + seasonality +
# Lorenz, Mann-Whitney/survival/MI/PSI/trigrams/MoM, AUC/gains/
# calibration/corr-matrix/Theil, stream-static enrichment, asof
# forward + grouped percentiles + ANOVA + leakage, drawdown/entropy
# rate/conversion/peaks/Bollinger, cohort LTV/repeat rate/HHI/
# seasonal outliers/missing days, minhash audit + novelty +
# embedding QA, any-order funnel + abandonment, array HOFs +
# weighted quartiles + 2-D histogram, SPRT + decile migration +
# new-vs-returning, LSH tuning curve, integrity audit + exponential
# fit + Hill index, xml_roundtrip, PLUS the late-round-5 waves 35-46
# (pipeline37-48: assoc_triples, surrogate_keys_hash,
# hierarchy_closure_rollup, apportion_largest_remainder,
# theil_sen_slope, pettitt_changepoint, spearman_rank_corr,
# kendall_tau_daily, jackknife_ratio_se, pattern_rise_drop,
# segment_overlap_venn, trend_test_ca, species_richness_chao1,
# mann_kendall_trend, inventory_clamped_scan, shapley_attribution,
# isotonic_calibration, diff_in_diff, periodogram_dft,
# runs_test_random, pca_power_iteration,
# embedding_quantization_audit, holt_winters_weekly,
# eb_shrinkage_rates, cuped_adjustment, quantile_treatment_effects,
# grouped_ols_elasticity, fixed_effects_within, shuffle_skew_audit,
# retrieval_metrics_truncation, conformal_interval_coverage,
# wasserstein_drift, newsvendor_stocking, logistic_newton,
# covariate_balance_smd, cem_stratified_ate, raking_ipf,
# ips_policy_eval, gpd_pot_fit, k_anonymity_audit,
# point_in_polygon_tag, ar1_durbin_watson, ccf_leadlag,
# classical_decomposition, atkinson_index, dbscan_clusters,
# silhouette_simplified, huber_irls_regression,
# langid_confusion_audit, kmeans_lloyd, ab_srm_check,
# matrix_profile_motifs, matrix_profile_discords,
# winnowing_fingerprints, moss_shared_fingerprints,
# markov_transition_matrix, markov_attribution_removal,
# kde_gaussian_grid, anderson_darling_2sample, cox_ph_newton,
# logrank_test, spatial_clark_evans, em_exponential_mixture) —
# all locally
# green under the dtype-strict gate) and any round-6 additions, then
# the r1-of-record names oldest-first
# (agg_having, agg_rollup, cast_semantics, date_funcs,
# events_asof_join, events_distinct_kmv, events_range_join, geo_udt,
# in_subquery, join_full_outer, join_inner_3way, json_extract,
# predicate_between_in, string_funcs, text_fingerprint, text_lang_id,
# text_stats, window_topk_per_group, setop_*, join_left_outer,
# join_semi, events_multi_rollup, events_time_bucket, try_cast_nulls,
# try_divide_nulls, literals_no_from, sqrt_fn, agg_cube,
# agg_grouping_sets, cte_scalar_subquery, distinct_pairs, percentiles,
# pivot_linestatus, sort_limit_topk, filter_like, window_running,
# agg_count_distinct_group, arithmetic_ops, case_when,
# null_predicates), so no query's certification-of-record falls more
# than a few rounds behind.


def _wrap(fn):
    """Release the previous query's operator-internal caches before
    building the next one — by the time a new query callable runs, the
    prior result has been consumed (collected/written), so its cached
    intermediates are dead weight in a long driver/bench session."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        release_caches()
        # certified builds must use the engine-portable hash family:
        # a query built inside use_hash("xxhash64") would bake
        # non-oracle-reproducible fingerprints into its plan
        from datafusion_archive_spark.functions import text as _text

        if _text.HASH_METHOD != "md5":
            raise RuntimeError(
                "certified queries must not be built inside "
                f"use_hash({_text.HASH_METHOD!r})"
            )
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


assert len(_FIRST_50) == 50, len(_FIRST_50)
assert all(name in _ALL_QUERIES for name in _FIRST_50)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: _wrap(_ALL_QUERIES[name]) for name in _FIRST_50
}
for name, fn in _ALL_QUERIES.items():
    if name not in QUERIES:
        QUERIES[name] = _wrap(fn)

__all__ = ["QUERIES", "ORACLES"]
