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
presents everything that round could not see (TPC-H tail, window
frames, nested/array/map, the dedup/ANN/multimodal family) plus the
queries whose semantics changed this round (join_anti — now non-empty —
and the new dedup_clusters capstone). ``approx_aggs`` stays outside
the window: it is rows-only by design and would waste a certification
slot.
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
    relational,
    sources_io,
    timeseries,
    tpch_more,
    tpch_more2,
    tpch_more3,
)

_ALL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for mod in (
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
):
    _ALL_QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

#: The round-2 certification window (driver checks entries [:50]).
#: ROUND-3 TODO: rotate the still-uncertified tail into this window —
#: sources_roundtrip, salted_join_agg, planir_roundtrip,
#: decontaminate_ngram_overlap, vocab_topk, udaf_median_tokens,
#: chunk_documents, pack_sequences, embedding_near_dup_exact,
#: events_attribution_join, profile_columns, train_val_test_split,
#: bm25_topk, dedup_editdistance (+ anything added since);
#: fill the rest with the oldest-certified names.
_FIRST_50 = [
    # --- un-certified in round 1 (CORRECTNESS_r01 covered slots 0-49);
    #     every one of these already passes tools/check_oracle locally
    "text_clean",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh",
    "dedup_clusters",          # new this round: pairs → components → survivors
    "dedup_simhash_signatures",
    "dedup_simhash_pairs",
    "ann_bruteforce",
    "embedding_near_dup",      # re-certify: now planted + banded-LSH path
    "ann_lsh",
    "ann_ivf",
    "multimodal_decode",
    "multimodal_frame_sample",
    "array_ops",
    "posexplode_ordinality",
    "struct_access",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q12_priority_shipping",
    "q14_promo_effect",
    "q18_large_volume",
    "q19_disjunctive_predicates",
    "window_ranks",
    "window_frames",
    "nulls_ordering",
    "regexp_extract",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q22_global_sales_opportunity",
    "map_funcs",
    "sample_deterministic",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_parts_supplier_relationship",
    "q20_potential_part_promotion",
    "q21_suppliers_kept_orders_waiting",
    "stats_aggs",
    "argminmax_aggs",
    "collect_agg",
    "q2_min_per_group_subquery",
    "unpivot_stack",
    "expr_misc",
    "pipeline_clean_corpus",
    "text_quality_zscore",
    "q7_volume_between_nations",
    "q8_market_share",
    # --- changed semantics this round, needs a fresh driver row
    "join_anti",               # re-certify: now non-empty (filtered right side)
]


def _wrap(fn):
    """Release the previous query's operator-internal caches before
    building the next one — by the time a new query callable runs, the
    prior result has been consumed (collected/written), so its cached
    intermediates are dead weight in a long driver/bench session."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        release_caches()
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
