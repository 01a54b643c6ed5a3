"""Round-8 scale head-to-heads for the two plans VERDICT r7 graded
weak, on synthetic 30M-row inputs (the harness pattern of PERF.md's
round-7 grouped-quantile note):

A. low-cardinality top-k: row_number over a ~6-value window partition
   (the old q_window_topk_per_group plan) vs the salted two-phase
   top-k now shipped — results asserted identical.
B. weighted quartiles: the cumulative-window sweep over the per-group
   value dictionary (old plan) vs weighted_lower_quantiles_grouped —
   results asserted identical.
C. per-row rank: row_number over the ~6-value window partition (the
   old window_ntile_dist-class plan) vs bucketed_group_rank —
   compared via a per-group checksum of every row's rank (30M rows
   can't collect; the exact-rank differentials live in
   tests/test_round8.py).
D. global lag: lag over an UNPARTITIONED ordered window (one task
   sorts everything — the old exponential_fit_gaps-class plan) vs
   bucketed_group_lag, compared via an exact integer gap checksum.

Usage: python tools/scale_probe_r8.py [n_rows]
Prints one line per contender: name, wall seconds, result digest.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_archive_spark.operators.quantiles import (
    weighted_lower_quantiles_grouped,
)
from datafusion_archive_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000
FLAGS = ["A", "B", "C", "N", "R", "F"]


def base(spark):
    """Deterministic synthetic fact slab: 6-value group key, ~10M
    distinct prices, small integer weights."""
    return spark.range(N).select(
        F.col("id"),
        F.element_at(
            F.array(*[F.lit(x) for x in FLAGS]),
            (F.col("id") % 6 + 1).cast("int"),
        ).alias("flag"),
        (F.pmod(F.xxhash64("id"), 1_000_000_000) / 100.0).alias("price"),
        (F.col("id") % 7 + 1).cast("long").alias("qty"),
    )


def timed(label, fn):
    """Time one contender; a contender that dies (OOM, Py4J error)
    reports DIED instead of killing the harness — the losing plan
    failing outright IS a head-to-head result at this scale."""
    t0 = time.monotonic()
    try:
        out = fn()
    except Exception as exc:  # noqa: BLE001 — want OOM/Py4J alike
        dt = time.monotonic() - t0
        msg = str(exc).splitlines()[0][:120] if str(exc) else type(exc).__name__
        print(f"{label:28} {dt:8.2f}s  DIED: {msg}")
        return None
    dt = time.monotonic() - t0
    print(f"{label:28} {dt:8.2f}s  {out}")
    return out


def topk_raw(df):
    w = Window.partitionBy("flag").orderBy(F.col("price").desc(), "id")
    return sorted(
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("flag", "price", "rn")
        .collect()
    )


def topk_salted(df):
    order = [F.col("price").desc(), F.col("id")]
    salt = F.pmod(F.xxhash64("id"), F.lit(32))
    w1 = Window.partitionBy("flag", "salt").orderBy(*order)
    cand = (
        df.withColumn("salt", salt)
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= 3)
        .drop("salt", "r1")
    )
    w2 = Window.partitionBy("flag").orderBy(*order)
    return sorted(
        cand.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= 3)
        .select("flag", "price", "rn")
        .collect()
    )


def wq_sweep(df):
    by_v = df.groupBy("flag", "price").agg(F.sum("qty").alias("wt"))
    w = Window.partitionBy("flag").orderBy("price")
    cum = by_v.withColumn(
        "c",
        F.sum("wt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn("t", F.sum("wt").over(Window.partitionBy("flag")))
    q = lambda n: F.min(
        F.when(F.col("c") * 4 >= F.col("t") * n, F.col("price"))
    )
    return sorted(
        (r.flag, r.p25, r.p50, r.p75, r.t)
        for r in cum.groupBy("flag")
        .agg(
            q(1).alias("p25"), q(2).alias("p50"), q(3).alias("p75"),
            F.max("t").alias("t"),
        )
        .collect()
    )


def wq_search(df):
    res = weighted_lower_quantiles_grouped(
        df, "flag", "price", "qty", [(1, 4), (2, 4), (3, 4)]
    )
    return sorted(
        (k, v[0], v[1], v[2], total) for k, (v, total) in res.items()
    )


def _rank_digest(ranked, rank_col):
    """Per-group (n, checksum-of-rank×id-residue) — detects any rank
    permutation without materializing 30M rows on the driver."""
    return sorted(
        (r.flag, r.n, r.chk)
        for r in ranked.groupBy("flag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.col(rank_col) * (F.pmod(F.col("id"), F.lit(997)) + 1)
            ).alias("chk"),
        )
        .collect()
    )


def rank_plain(df):
    w = Window.partitionBy("flag").orderBy("price", "id")
    return _rank_digest(
        df.select("flag", "id", F.row_number().over(w).alias("rk")), "rk"
    )


def rank_bucketed(df):
    from datafusion_archive_spark.operators.ranks import bucketed_group_rank

    return _rank_digest(
        bucketed_group_rank(df, ["flag"], "price", tiebreak=["id"]), "_rank"
    )


def _gap_digest(df, prev_col):
    """Count + EXACT integer checksum of the gaps (prices are
    cent-valued, so round(gap*100) is integral; a float sum would
    differ between plans by accumulation order alone)."""
    g = df.select((F.col("price") - F.col(prev_col)).alias("gap")).filter(
        F.col("gap").isNotNull()
    )
    return sorted(
        (r.n, r.s)
        for r in g.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.abs("gap") * 100).cast("long")).alias("s"),
        ).collect()
    )


def lag_plain(df):
    w = Window.orderBy("price", "id")
    return _gap_digest(
        df.select("price", F.lag("price").over(w).alias("prev")), "prev"
    )


def lag_bucketed(df):
    from datafusion_archive_spark.operators.ranks import bucketed_group_lag

    return _gap_digest(
        bucketed_group_lag(
            df.select("price", "id"), [], "price", ["id"],
            [("price", "prev")],
        ),
        "prev",
    )


def main():
    # Size the one local JVM like a production executor (the PySpark
    # default 1g can't even shuffle-write the 30M slab across 32
    # concurrent tasks — everything would DIE for a reason that says
    # nothing about the plans under test).
    spark = get_spark(
        "scale_probe_r8", extra_conf={"spark.driver.memory": "16g"}
    )
    df = base(spark)
    df.count()  # warm the slab generation path
    pairs = [
        ("topk raw-window", topk_raw, "topk salted-two-phase", topk_salted),
        ("weighted-quartiles sweep", wq_sweep,
         "weighted-quartiles search", wq_search),
        ("rank plain-window", rank_plain,
         "rank bucketed", rank_bucketed),
        ("lag global-window", lag_plain,
         "lag bucketed", lag_bucketed),
    ]
    for old_label, old_fn, new_label, new_fn in pairs:
        a = timed(old_label, lambda: old_fn(df))
        b = timed(new_label, lambda: new_fn(df))
        if b is None:
            raise SystemExit(f"{new_label}: the SHIPPED plan died at N={N}")
        if a is not None:
            assert a == b, f"{new_label} diverges: {a} vs {b}"
            print(f"  {old_label} == {new_label} at N={N}")
        else:
            # Old plan died at this N: prove semantic equality on a
            # slab both survive, so the timing claim stays honest.
            small = df.filter(F.col("id") < 3_000_000)
            sa, sb = old_fn(small), new_fn(small)
            assert sa == sb, f"{new_label} diverges at 3M: {sa} vs {sb}"
            print(f"  {old_label} == {new_label} verified at N=3000000")
    print("head-to-heads done")


if __name__ == "__main__":
    main()
