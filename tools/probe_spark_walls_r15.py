"""Round-15 spark-only wall probe: time the ENGINE side of named
queries at a scale factor via the noop sink (guide §1.4), medians over
N passes on a warmed session. The oracle-sweep walls conflate Spark
with DuckDB's single-threaded replay (e.g. dbscan's recursive CTE), so
optimization targeting needs this artifact, not the sweep log.

Usage:
    python tools/probe_spark_walls_r15.py [sf_dir] [query ...]

Defaults: sf0.1 and the round-15 target list (slowest sweep rows at
sf0.1 in tools/oracle_sweep_r14_sf01.log plus every query the round's
commits touched). Prints one `wall_s name` line per query, sorted
descending, then a total.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from datafusion_archive_spark.queries import QUERIES
from datafusion_archive_spark.session import get_spark

DEFAULT_TARGETS = [
    # slowest sweep rows at sf0.1 (r14 log, wall incl. oracle)
    "minhash_estimate_audit",
    "graph_pagerank",
    "dbscan_clusters",
    "holt_winters_weekly",
    "bpe_encode_tokens",
    "graph_triangle_count",
    "text_clean",
    "bpe_merges",
    "moss_shared_fingerprints",
    "markov_attribution_removal",
    "winnowing_fingerprints",
    "dedup_editdistance",
    "dedup_clusters",
    "seasonal_adjusted_outliers",
    "spatial_clark_evans",
    "theil_sen_slope",
    "retrieval_metrics_truncation",
    "decontaminate_ngram_overlap",
    "ngram_novelty_rate",
    "percentiles",
    "dedup_incremental",
    "curation_funnel",
    "assoc_triples",
    "lsh_tuning_curve",
    "text_fingerprint",
    "window_ntile_dist",
    "wasserstein_drift",
    "median_mode_aggs",
    "outliers_mad",
    "dedup_ngram_jaccard",
    # round-15-touched queries not already above
    "text_repetition_gopher",
    "text_token_entropy",
    "semantic_dedup_clusters",
    "markov_transition_matrix",
]

RUNS = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or [n for n in DEFAULT_TARGETS if n in QUERIES]
    spark = get_spark("probe_spark_walls_r15")
    spark.range(1).count()

    walls: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        # one warm pass (page cache + codegen), then timed medians
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        ts = []
        for _ in range(RUNS):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            ts.append(time.time() - t0)
        walls[name] = statistics.median(ts)
        print(f"{walls[name]:7.3f} {name}", flush=True)

    print("--- sorted ---")
    for name, w in sorted(walls.items(), key=lambda kv: -kv[1]):
        print(f"{w:7.3f} {name}")
    print(f"TOTAL {sum(walls.values()):.3f} s over {len(walls)} queries")


if __name__ == "__main__":
    main()
