"""Round-11b scale probe: the SPATIAL family (DBSCAN, Clark–Evans)
at 1×/4×/16× the sf0.1 point count.

Round 11's sweep-cliff audit rebuilt both queries on the cell-bucket
candidate join (see PERF.md "Round-11 sweep-cliff audit"); this probe
provides the measurement behind the design claim, the same way
tools/scale_probe_r10.py did for graphs and scale_probe_r11.py for
dedup/ANN:

- DBSCAN with density-adaptive ε(n) = ε·sqrt(N_REF/n): candidate-pair
  count must stay ~LINEAR in n (constant expected ε-degree), and the
  cluster-size distribution must stay subcritical (no giant
  component) — the failure mode that made fixed-ε sf0.1 take 34 min.
- Clark–Evans at fixed K radii: candidate count grows ∝ n·λ (that is
  the statistic's own output — pairs within max radius), i.e. ~n² by
  DESIGN for fixed area; the probe verifies the blocked join tracks
  the true within-radius pair count (never all n² pairs) and that
  the blocked-NN fallback count stays negligible.

Points are synthesized from integer ids through the same portable
hash fractions the certified queries use, so the probe exercises the
identical code paths (pipeline60._neighbor_pairs / pipeline68 via the
registered queries on a temp parquet directory).

Usage: python tools/scale_probe_r11b.py [out_dir]
Writes a table to stdout; redirect to tools/scale_probe_r11b.log.
"""

from __future__ import annotations

import math
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from datafusion_archive_spark.session import get_spark  # noqa: E402
from datafusion_archive_spark.queries import pipeline60 as P60  # noqa: E402
from datafusion_archive_spark.queries import pipeline68 as P68  # noqa: E402

SIZES = (15_000, 60_000, 240_000)  # 1x / 4x / 16x the sf0.1 customer dim
# Clark–Evans is probed only to 4x: at fixed K radii the candidate
# count IS the statistic's output (pairs within max radius ∝ n·λ —
# ~5.2 B at 16x in the fixed 100-unit² area). That growth is the
# measurement's own cost, not a plan defect; at that density you
# subsample before asking for K̂. DBSCAN (adaptive ε) runs all sizes.
CE_SIZES = (15_000, 60_000)


def synth_customers(spark, n, out_dir):
    """Write a minimal customer.parquet with n synthetic keys."""
    spark.range(1, n + 1).select(
        F.col("id").cast("long").alias("c_custkey")
    ).coalesce(8).write.mode("overwrite").parquet(
        f"{out_dir}/customer.parquet"
    )


def main() -> int:
    out_root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="probe_r11b_"
    )
    spark = get_spark("scale_probe_r11b")
    print(f"# spatial-family scale probe — sizes {SIZES}, dir {out_root}")
    print(
        "# n | eps(n) | dbscan cand pairs | cand/n | dbscan wall s | "
        "max cluster | ce cand pairs | ce true<r pairs | ce fallback "
        "pts | ce wall s"
    )
    for n in SIZES:
        sf_dir = f"{out_root}/n{n}"
        synth_customers(spark, n, sf_dir)

        # --- DBSCAN: candidate linearity + subcriticality
        pts = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            F.col("c_custkey").alias("id"),
            *__import__(
                "datafusion_archive_spark.queries.pipeline10",
                fromlist=["_synth_point"],
            )._synth_point(F.col("c_custkey"), "p"),
        )
        eps = P60._eps_for(n)
        t0 = time.time()
        n_cand = P60._neighbor_pairs(pts, eps).count()
        summary = P60.q_dbscan_clusters(spark, sf_dir).collect()[0]
        dbscan_wall = time.time() - t0

        # --- Clark–Evans: blocked candidates vs true within-radius
        if n not in CE_SIZES:
            print(
                f"{n} | {eps:.4f} | {n_cand} | {n_cand / n:.2f} | "
                f"{dbscan_wall:.1f} | {summary.max_cluster_size} | "
                f"(CE skipped: output-bound at this density, see header)"
            )
            sys.stdout.flush()
            continue
        c = max(P68._RADII)
        t0 = time.time()
        row = P68.q_spatial_clark_evans(spark, sf_dir).collect()[0]
        ce_wall = time.time() - t0
        # recount the blocked candidate table and its exact subsets
        a = pts.select(
            F.col("id").alias("ida"),
            F.col("p_lat").alias("xa"),
            F.col("p_lon").alias("ya"),
            F.floor(F.col("p_lat") / c).alias("cx"),
            F.floor(F.col("p_lon") / c).alias("cy"),
        )
        offs = F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
        b = (
            pts.select(
                F.col("id").alias("idb"),
                F.col("p_lat").alias("xb"),
                F.col("p_lon").alias("yb"),
            )
            .select("*", F.explode(offs).alias("o"))
            .select(
                "idb",
                "xb",
                "yb",
                (F.floor(F.col("xb") / c) + F.col("o.dx")).alias("cx"),
                (F.floor(F.col("yb") / c) + F.col("o.dy")).alias("cy"),
            )
        )
        dxx = F.col("xa") - F.col("xb")
        dyy = F.col("ya") - F.col("yb")
        cand = a.join(b, ["cx", "cy"]).filter(F.col("ida") != F.col("idb"))
        agg = cand.agg(
            F.count(F.lit(1)).alias("cand"),
            F.sum(
                (F.sqrt(dxx * dxx + dyy * dyy) < c).cast("long")
            ).alias("true_r"),
        ).collect()[0]
        nnb_ids = (
            cand.select("ida", F.sqrt(dxx * dxx + dyy * dyy).alias("d"))
            .groupBy("ida")
            .agg(F.min("d").alias("nnd"))
            .filter(F.col("nnd") < c)
            .count()
        )
        fallback = n - nnb_ids

        print(
            f"{n} | {eps:.4f} | {n_cand} | {n_cand / n:.2f} | "
            f"{dbscan_wall:.1f} | {summary.max_cluster_size} | "
            f"{agg.cand} | {agg.true_r} | {fallback} | {ce_wall:.1f}"
        )
        sys.stdout.flush()

    # growth verdicts (computed over the printed rows by the reader;
    # restate the design expectations here for the log)
    lam = [n / 100.0 for n in SIZES]
    print(
        "# expectations: dbscan cand/n constant (adaptive eps); "
        "ce cand ~ n*9*lambda*c^2 = "
        + ", ".join(f"{int(n * 9 * l)}" for n, l in zip(SIZES, lam))
        + " (fixed radii: output-bound growth, never the n^2 = "
        + ", ".join(f"{n * (n - 1)}" for n in SIZES)
        + " all-pairs table)"
    )
    shutil.rmtree(out_root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
