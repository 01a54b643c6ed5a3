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
}

#: The round-4 certification window (driver checks entries [:50]).
#: Head: every query that has NEVER had a driver row — the sources/
#: sinks + LLM-pipeline tail (uncertified since round 1), the fixed
#: windows2 wave, the new registry-UDF batch twin, and approx_aggs
#: (rows-only by design; certifying the weaker check on the record
#: beats leaving the row blank). Tail: oldest (round-1) certified
#: names, re-proving the relational core on current code.
#:
#: ROUND-5 NOTE: once CORRECTNESS_r04 lands, the union of driver rows
#: covers ALL registered queries (verified: r1∪r2∪r3 ∪ this window =
#: every key). The next rotation is maintenance: put any NEW queries
#: first, then the r1 names that have not been re-certified since
#: round 1 (the events_*/setop_*/join_* families and the scalar-fn
#: head), oldest first.
_FIRST_50 = [
    # --- never driver-certified (passed tools/check_oracle locally
    #     every round since they landed)
    "sources_roundtrip",       # CSV/NDJSON/DDL/write — the ref's executing core
    "salted_join_agg",
    "planir_roundtrip",
    "decontaminate_ngram_overlap",
    "vocab_topk",
    "udaf_median_tokens",
    "chunk_documents",
    "pack_sequences",
    "train_val_test_split",
    "bm25_topk",
    "dedup_editdistance",
    "embedding_near_dup_exact",
    "events_attribution_join",
    "profile_columns",
    "setop_intersect_all",
    "setop_except_all",
    "approx_aggs",             # rows-only by design (see ROWS_ONLY)
    # --- windows2 wave, fixed + wired this round
    "window_ntile_dist",
    "window_nav_nulls",
    "latest_per_key",
    "agg_filtered",
    "grouping_flags",
    "string_agg_ordered",
    "cross_join_grid",
    "exists_correlated",
    # --- new this round
    "registry_udf_expr",       # first driver row for the UDF registry
    "events_gapfill_locf",     # gap-fill + LOCF (hypertable staple)
    "text_repetition_gopher",  # Gopher/C4 n-gram repetition rules
    "dedup_incremental",       # new-batch-vs-corpus near-dup removal
    "recursive_month_grid",    # WITH RECURSIVE dimension + fact join
    "lateral_top2_per_priority",  # correlated LATERAL with ORDER BY/LIMIT
    "events_hopping_window",   # overlapping-window agg (stream==batch tested)
    "console_script_sql",      # console batch-mode pipeline, certified
    "stratified_sample",       # per-language hash-gated rebalancing
    "winsorized_aggs",         # robust clipped aggregation
    "merge_upsert_orders",     # MERGE INTO semantics, certified
    "join_null_safe",          # EqualNullSafe hash join
    "partitioned_pruning",     # partitionBy write + PartitionFilters scan
    "histogram_equi_depth",    # decile histogram via broadcast cutpoints
    "text_token_entropy",      # perplexity-proxy quality signal
    "cohort_retention",        # first-week cohort x return-week matrix
    "events_funnel",           # ordered click->view->purchase stages
    "weighted_sample",         # quality-weighted sample w/o replacement
    "weighted_sample_per_lang",  # balanced per-language variant
    # --- oldest-certified (round 1) fill: relational/TPC-H core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "scan_filter_project",
    "agg_global",
    "events_sessionize",
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
