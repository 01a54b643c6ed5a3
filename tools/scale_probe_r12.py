"""Round-12 scale probe: Clark–Evans/Ripley at 1×/4×/16× the sf0.1
point count, POST the density-adaptive radius fix (commit c514a3c) —
the r11b addendum VERDICT r11 #2 asked for.

tools/scale_probe_r11b.log measured the CE family BEFORE the fix,
when the K radii were fixed on the fixed [0,10)² space: the candidate
count there is the statistic's own output (pairs within max radius ∝
n·λ, ~n² for fixed area), so the 240k cell was skipped as
output-bound. c514a3c scales every radius by sqrt(N_REF/n), holding
the expected neighbor count per point CONSTANT at any density, so the
blocked-join candidate volume must now track n (9·c(n)²·λ = const) —
this probe verifies exactly that at 15k/60k/240k, including the 240k
row the old log could not run:

- cand/n approximately constant across 16× growth (the density
  budget),
- true within-max-radius pairs likewise ∝ n,
- blocked-NN fallback points ~0 (the CSR-exponentially-rare class),
- the Clark–Evans R statistic ≈ 1 and K ratios ≈ 1 at every size
  (CSR-distributed synth points — the adaptive radii must not bias
  the statistics).

Points come from the same portable hash fractions the certified query
uses (the probe calls the registered q_spatial_clark_evans on a temp
parquet directory — identical code path).

Usage: python tools/scale_probe_r12.py [out_dir]
Writes a table to stdout; redirect to tools/scale_probe_r12.log.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from datafusion_archive_spark.session import get_spark  # noqa: E402
from datafusion_archive_spark.queries import pipeline10 as P10  # noqa: E402
from datafusion_archive_spark.queries import pipeline68 as P68  # noqa: E402

SIZES = (15_000, 60_000, 240_000)  # 1x / 4x / 16x the sf0.1 customer dim


def synth_customers(spark, n, out_dir):
    spark.range(1, n + 1).select(
        F.col("id").cast("long").alias("c_custkey")
    ).coalesce(8).write.mode("overwrite").parquet(
        f"{out_dir}/customer.parquet"
    )


def main() -> int:
    out_root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="probe_r12_"
    )
    spark = get_spark("scale_probe_r12")
    print(
        f"# clark-evans post-fix scale probe (r11b addendum) — sizes "
        f"{SIZES}, dir {out_root}"
    )
    print(
        "# n | radius scale | ce cand pairs | cand/n | true<c pairs | "
        "fallback pts | CE R | k_ratio_100 | ce wall s"
    )
    for n in SIZES:
        sf_dir = f"{out_root}/n{n}"
        synth_customers(spark, n, sf_dir)
        scale = P68._radius_scale(n)
        c = max(P68._RADII) * scale  # ADAPTIVE cell size — the fix

        t0 = time.time()
        row = P68.q_spatial_clark_evans(spark, sf_dir).collect()[0]
        ce_wall = time.time() - t0

        # recount the blocked candidate table and its exact subsets at
        # the adaptive cell size (the r11b recount used the fixed
        # pre-fix radii)
        pts = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            F.col("c_custkey").alias("id"),
            *P10._synth_point(F.col("c_custkey"), "p"),
        )
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
            f"{n} | {scale:.4f} | {agg.cand} | {agg.cand / n:.2f} | "
            f"{agg.true_r} | {fallback} | {row.r_clark_evans} | "
            f"{row.k_ratio_100} | {ce_wall:.1f}"
        )
        sys.stdout.flush()

    print(
        "# expectations: cand/n approximately CONSTANT across the 16x "
        "growth (adaptive radii hold 9*c(n)^2*lambda fixed — the "
        "density budget); under CSR the R statistic and K ratios stay "
        "~1 at every size; fallback ~0. The pre-fix shape this "
        "replaces grew cand ~ n*lambda (r11b log: 17.6M -> 282M at "
        "4x, 240k skipped as output-bound)."
    )
    shutil.rmtree(out_root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
