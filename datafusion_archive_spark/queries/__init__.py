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

#: The certification window (driver checks entries [:50]).
#: Policy: a query with NO driver row ever is weaker evidence than one
#: whose row is merely old, so never-certified names outrank
#: re-certification. After round 5 the registry holds 342 names with
#: 191 ever driver-certified (188 ever green); the round-6 window
#: below drains the never-certified backlog oldest-first, exactly as
#: the round-5 ROUND-6 NOTE scheduled and VERDICT r5 #1 prescribed.
#: The local dtype-strict gate (tools/check_oracle.py) reproduces the
#: driver hash semantics, so out-of-window names are additionally
#: re-proven locally every round (sweep log committed per-round).
_FIRST_50 = [
    # ROUND-9 WINDOW — registry still frozen (VERDICT r5 #1): the
    # steady-state re-certification rotation begins, exactly as the
    # round-8 ROUND-9 NOTE scheduled and VERDICT r8 #1 prescribed.
    # Priority (code age outranks row age): (1) the one never-certified
    # name — jarque_bera_normality — whose row takes driver coverage to
    # 342/342; (2) the 15 queries REWRITTEN in round 8 after their
    # certification row landed (the bucketed-rank/lag program), whose
    # rows predate the code they vouch for; (3) the oldest (round-1)
    # rows, in registry order. Rows-only entries (approx_aggs, bpe_*)
    # stay excluded — their evidence is the differential pytest, and a
    # window slot spent on a no_oracle row certifies nothing.
    "jarque_bera_normality",
    # -- rewritten-since-row (round-8 bucketed-rank/lag rewires) --
    "window_topk_per_group",
    "window_ranks",
    "window_ntile_dist",
    "quality_quantile_norm",
    "class_rebalance",
    "weighted_median",
    "ks_test_two_sample",
    "gini_customer_spend",
    "mann_whitney_u",
    "auc_roc",
    "weighted_quartiles",
    "sprt_ab_sequential",
    "exponential_fit_gaps",
    "heaps_law_fit",
    "spearman_rank_corr",
    # -- oldest rows (round 1), registry order --
    "predicate_between_in",
    "filter_like",
    "null_predicates",
    "cast_semantics",
    "arithmetic_ops",
    "literals_no_from",
    "sqrt_fn",
    "geo_udt",
    "agg_having",
    "agg_count_distinct_group",
    "agg_rollup",
    "pivot_linestatus",
    "sort_limit_topk",
    "distinct_pairs",
    "join_inner_3way",
    "join_left_outer",
    "join_semi",
    "join_full_outer",
    "cte_scalar_subquery",
    "setop_union",
    "setop_intersect",
    "setop_except",
    "window_running",
    "json_extract",
    "try_cast_nulls",
    "string_funcs",
    "date_funcs",
    "case_when",
    "try_divide_nulls",
    "setop_union_all",
    "agg_cube",
    "agg_grouping_sets",
    "in_subquery",
    "percentiles",
]

# ROUND-10 NOTE (next certification window): the steady-state
# rotation continues (VERDICT r7 #5, r8 #6). After CORRECTNESS_r09
# lands, every registered name has a driver row and every round-8
# rewire is certified against its current code — so round 10 is pure
# oldest-first re-certification. Priority unchanged: (1)
# never-certified (none expected), (2) rewritten-since-row (none
# pending — fold in any new rewires), (3) oldest rows by latest green
# round, ties by registry order. Computed from the CORRECTNESS_r{1..8}
# union (the r1-only tail, then the round-3 wave in registry order) —
# recompute against the r{1..9} union before swapping in, in case a
# sweep turns a row red. The exact 50:
#   events_time_bucket, events_asof_join, events_range_join,
#   events_multi_rollup, events_distinct_kmv, text_stats,
#   text_lang_id, text_fingerprint, join_anti, text_clean,
#   dedup_exact, dedup_ngram_jaccard, dedup_minhash_signatures,
#   dedup_minhash_lsh, dedup_clusters, dedup_simhash_signatures,
#   dedup_simhash_pairs, ann_bruteforce, embedding_near_dup, ann_lsh,
#   ann_ivf, multimodal_decode, multimodal_frame_sample, array_ops,
#   posexplode_ordinality, struct_access, q4_order_priority,
#   q6_forecast_revenue, q10_returned_items, q12_priority_shipping,
#   q14_promo_effect, q18_large_volume, q19_disjunctive_predicates,
#   window_frames, nulls_ordering, regexp_extract,
#   q13_customer_distribution, q15_top_supplier,
#   q17_small_quantity_revenue, q22_global_sales_opportunity,
#   map_funcs, sample_deterministic, q9_product_type_profit,
#   q11_important_stock, q16_parts_supplier_relationship,
#   q20_potential_part_promotion, q21_suppliers_kept_orders_waiting,
#   stats_aggs, argminmax_aggs, collect_agg
# Subsequent rounds continue the same rotation. The full local sweep
# log (tools/check_oracle.py over every registered query, plus the
# ORACLE_CHECK_VANILLA=1 variant) stays committed per-round as
# tools/oracle_sweep_r{N}.log to keep the locally-green claim
# auditable.

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
