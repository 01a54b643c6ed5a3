"""Print the physical-plan audit table for the headline queries —
the mechanized version of PERF.md's plan-audit claims.

For every headline query (plus any named on the command line), show:
join strategies, hash-exchange count, scan count, pushed filters, and
whether whole-stage codegen covers the plan. Use it after touching an
operator to confirm the plan still has the shape PERF.md promises.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from datafusion_archive_spark.plans import summarize
from datafusion_archive_spark.queries import QUERIES
from datafusion_archive_spark.session import get_spark

DEFAULT = [
    "scan_filter_project",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q7_volume_between_nations",
    "text_stats",
    "chunk_documents",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "decontaminate_ngram_overlap",
    "vocab_topk",
    "ann_bruteforce",
    "ann_lsh",
    "embedding_near_dup",
    "salted_join_agg",
    # round-8 bucketed rank/lag rewires: the fact-scale window must
    # hash on (key, _bkt), never on the bare low-cardinality key
    "window_topk_per_group",
    "window_ntile_dist",
    "window_ranks",
    "exponential_fit_gaps",
    "wasserstein_drift",
]


def main() -> int:
    sf_dir = (
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    )
    names = sys.argv[2:] or DEFAULT
    spark = get_spark("plan_audit")
    print(
        f"{'query':34} {'exchanges':>9} {'scans':>5} {'codegen':>7}  "
        f"joins / pushed filters"
    )
    for name in names:
        s = summarize(QUERIES[name](spark, sf_dir))
        joins = ",".join(sorted(set(s.joins))) or "-"
        pushed = "; ".join(p for p in s.pushed_filters if p)[:60] or "-"
        print(
            f"{name:34} {s.n_hash_exchanges:>9} {s.n_scans:>5} "
            f"{str(s.has_codegen):>7}  {joins} | {pushed}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
