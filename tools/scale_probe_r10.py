"""Round-10 scale probe of the GRAPH family — the one operator family
never growth-probed (the r10 sf0.1 registry sweep OOM'd it at the old
1g local heap; this probe runs on the session factory's 8g default).

Synthetic power-law-ish undirected graph at two sizes (default 1M and
4M edges): ``triangle_stats`` (compact-forward wedge enumeration) and
``pagerank`` (8 power iterations). The 100 TB question is GROWTH, not
absolute latency: the oriented wedge join is bounded by out-degree²
under the (degree, id) orientation, so 4x edges should cost well under
the 16x a naive degree² enumeration would; pagerank is linear in edges
per iteration.

Edge construction: endpoint ids drawn as ``floor(U^2 * n_nodes)`` —
quadratically skewed toward low ids, giving the hub-heavy degree
distribution the orientation exists for. Self-loops dropped,
duplicates removed (the operators' documented input contract).

Usage: python tools/scale_probe_r10.py [n_edges_small] [factor]
Prints one line per (size, operator): wall seconds + exact digests
(triangle/wedge counts are integers; pagerank digests the sum of
ranks times 1e6 rounded — scale-invariant mass conservation).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from datafusion_archive_spark.operators.graph import pagerank, triangle_stats
from datafusion_archive_spark.operators.util import release_caches
from datafusion_archive_spark.session import get_spark

N_SMALL = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def edges_at(spark, n_edges):
    n_nodes = max(1000, n_edges // 10)
    raw = spark.range(n_edges).select(
        (
            F.pow(F.pmod(F.xxhash64("id"), 1_000_000) / 1_000_000.0, 2.0)
            * n_nodes
        ).cast("long").alias("src"),
        (
            F.pow(
                F.pmod(F.xxhash64("id", F.lit(1)), 1_000_000) / 1_000_000.0,
                2.0,
            )
            * n_nodes
        ).cast("long").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    # canonical undirected unique edges
    return raw.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
    ).distinct()


def main() -> int:
    spark = get_spark("scale_probe_r10")
    for n in (N_SMALL, N_SMALL * FACTOR):
        e = edges_at(spark, n)
        t0 = time.time()
        tri = triangle_stats(e).collect()[0]
        t_tri = time.time() - t0
        release_caches()
        t0 = time.time()
        pr = pagerank(e, iterations=8)
        mass = pr.agg(
            F.round(F.sum("rank") * 1e6).cast("long").alias("m"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        t_pr = time.time() - t0
        release_caches()
        print(
            f"edges={tri.n_edges} nodes={tri.n_nodes} "
            f"triangles={tri.n_triangles} wedges={tri.n_wedges} "
            f"tri_wall={t_tri:.2f}s pagerank_wall={t_pr:.2f}s "
            f"rank_mass_1e6={mass.m} (conserved iff == 1e6*nodes="
            f"{mass.n * 1_000_000})"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
