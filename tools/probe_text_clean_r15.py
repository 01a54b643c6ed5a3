"""Round-15 re-run of the text_clean attribution probe (VERDICT r14
#3) after the round's two fixes:

  - ``repetition_ratio`` rewritten from O(distinct x n)
    filter-per-distinct-token to a sorted run-length max in one
    linear ``aggregate`` pass (profiling showed the old form was
    ~95% of the query's Spark wall — the regex chain it was blamed
    on was ~0.3 s of the 6.7 s);
  - ``clean_text``'s tag pass fused with the whitespace-collapse
    pass (4 full-string regex scans -> 3), output byte-identical.

Methodology identical to tools/probe_text_clean_r14.py (same
component split, same doc_id-hash-sampled linearity ladder); the
Done gate is >=1.3x on the 5k-doc spark_s vs the r14 log with the
text_clean oracle row still green.

Usage: python tools/probe_text_clean_r15.py [runs]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

import duckdb

sys.path.insert(0, "/root/repo")

from datafusion_archive_spark.session import get_spark

import __spark_entry__ as entrymod

SF_SMALL = "/root/testdata/sf0.01"
SF_LARGE = "/root/testdata/sf0.1"


def median_wall(fn, runs):
    walls = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return statistics.median(walls)


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("probe_text_clean_r14")
    q = entrymod.queries()["text_clean"]
    oracle = entrymod.oracle_sql()["text_clean"]

    # warm both engines + the parquet page cache once
    q(spark, SF_SMALL).toPandas()

    print(f"# text_clean attribution probe — runs={runs}, medians")
    print("# scale | rows | spark_s | oracle_s | compare_s | sweep-ish total")
    comps = {}
    for sf_dir, tag in ((SF_SMALL, "sf0.01"), (SF_LARGE, "sf0.1")):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'"
        )
        sdf_holder = {}
        spark_s = median_wall(
            lambda: sdf_holder.__setitem__("v", q(spark, sf_dir).toPandas()),
            runs,
        )
        odf_holder = {}
        oracle_s = median_wall(
            lambda: odf_holder.__setitem__("v", con.execute(oracle).fetchdf()),
            runs,
        )
        sys.path.insert(0, "/root/repo/tools")
        import check_oracle as co

        def _cmp():
            s_n = co.normalize(sdf_holder["v"])
            o_n = co.normalize(odf_holder["v"])
            assert co.value_repr(s_n) == co.value_repr(o_n), "value mismatch!"

        compare_s = median_wall(_cmp, runs)
        rows = len(sdf_holder["v"])
        comps[tag] = (rows, spark_s, oracle_s, compare_s)
        print(
            f"{tag} | {rows} | {spark_s:.2f} | {oracle_s:.2f} | "
            f"{compare_s:.2f} | {spark_s + oracle_s + compare_s:.2f}"
        )
        con.close()

    # Spark-side linearity at 4 corpus sizes from the SAME (sf0.1)
    # distribution — doc_id-hash sampling, not LIMIT, so content
    # shape is scale-invariant
    print("# spark-side linearity (docs sampled from sf0.1):")
    print("# n_docs | spark_s | s_per_1k_rows")
    tmp = tempfile.mkdtemp(prefix="probe_text_clean_")
    per_1k = []
    try:
        full = duckdb.connect()
        for n in (500, 1000, 2500, 5000):
            d = os.path.join(tmp, f"n{n}")
            os.makedirs(d)
            full.execute(
                "COPY (SELECT * FROM "
                f"'{SF_LARGE}/documents.parquet' "
                "ORDER BY md5(doc_id::VARCHAR) "
                f"LIMIT {n}) TO '{d}/documents.parquet' (FORMAT PARQUET)"
            )
            w = median_wall(lambda: q(spark, d).toPandas(), runs)
            per_1k.append((n, w))
            print(f"{n} | {w:.2f} | {1000.0 * w / n:.3f}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # conclusion: split the sweep growth into its parts
    r_s, s_s, o_s, c_s = *(comps["sf0.01"][0:1]), *comps["sf0.01"][1:]
    r_l, s_l, o_l, c_l = *(comps["sf0.1"][0:1]), *comps["sf0.1"][1:]
    tot_s = s_s + o_s + c_s
    tot_l = s_l + o_l + c_l
    # fixed-overhead estimate from the linearity fit: intercept of
    # wall vs rows over the 4 sampled sizes (least squares)
    xs = [n for n, _ in per_1k]
    ys = [w for _, w in per_1k]
    xbar = sum(xs) / len(xs)
    ybar = sum(ys) / len(ys)
    slope = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sum(
        (x - xbar) ** 2 for x in xs
    )
    intercept = ybar - slope * xbar
    # the marginal-growth ratio divides by (smallest wall - fitted
    # intercept); on a noisy quad the intercept can meet or exceed
    # that wall, where the ratio is meaningless — report n/a instead
    # of an absurd figure in committed gate evidence
    base_marginal = ys[0] - intercept
    if base_marginal > 0.05:
        marginal = (
            (ys[-1] - intercept) / base_marginal / (xs[-1] / xs[0])
        )
        marginal_txt = f"{marginal:.2f}x of linear"
    else:
        marginal_txt = (
            "n/a (fitted intercept ~ smallest wall — noisy fit, "
            "re-run the probe)"
        )
    print(
        f"# CONCLUSION: sweep growth {tot_l / tot_s:.1f}x on 10x rows = "
        f"spark {s_l / s_s:.1f}x + oracle {o_l / o_s:.1f}x + compare "
        f"{c_l / c_s:.1f}x (weights at sf0.1: spark {s_l:.2f}s, oracle "
        f"{o_l:.2f}s, compare {c_l:.2f}s). Spark fit: wall = "
        f"{intercept:.2f}s fixed + {1000 * slope:.3f}s/1k rows — "
        f"per-row marginal growth {marginal_txt}."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
