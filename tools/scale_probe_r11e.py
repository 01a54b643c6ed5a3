"""Round-11e scale probe: the TIME-SERIES family (matrix profile,
Holt-Winters, Markov attribution, EM mixture) — the last iterative
family without growing-scale evidence.

These operators aggregate a fact stream down to a calendar-bounded
series (daily revenue, per-user journeys, inter-arrival gaps) before
the expensive kernel runs, so their 100 TB claim is: kernel cost is
bounded by the CALENDAR (matrix profile: O(days²) pairs, constant in
SF) or by the model size (Markov chain states, EM components, HW
state vector), and total wall grows only with the linear pre-
aggregation. This probe measures that claim directly by DENSIFYING
the certified sf0.01 tables k× over the SAME date span: each copy
offsets the join keys (orderkey/custkey; event_id/user_id) so rows
and users grow k× while the calendar stays fixed.

Measured per size, with the EXACT certified query functions:

- matrix_profile_motifs: wall + the subsequence count (must be
  CONSTANT — the O(n²) pair join is over days, not rows).
- holt_winters_weekly: wall (per-nation applyInPandas over a
  constant-length daily series; the agg is the only row-bound part).
- markov_attribution_removal: wall (transition counts grow with
  users, the chain and its 30 power steps are fixed-size).
- em_exponential_mixture: wall (3 EM passes, each one scan).

Usage: python tools/scale_probe_r11e.py [factor]
Commit stdout as tools/scale_probe_r11e.log.
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from datafusion_archive_spark.operators.util import release_caches
from datafusion_archive_spark.session import get_spark

BASE = "/root/testdata/sf0.01"
WORK = "/tmp/ts_probe_r11e"
FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def densify(spark, k: int) -> str:
    """k key-offset copies of the sf0.01 tables over the same dates.

    Customers are NOT duplicated (every order copy keeps a valid
    o_custkey); events duplicate with offset user_id so the journey
    count grows with k."""
    out = f"{WORK}/x{k}"
    shutil.rmtree(out, ignore_errors=True)
    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    frames = [
        orders.select(
            (F.col("o_orderkey") + F.lit(i * 1_000_000_000)).alias(
                "o_orderkey"
            ),
            *[c for c in orders.columns if c != "o_orderkey"],
        )
        for i in range(k)
    ]
    dup = frames[0]
    for f in frames[1:]:
        dup = dup.unionByName(f)
    dup.write.parquet(f"{out}/orders.parquet")

    ev = spark.read.parquet(f"{BASE}/events.parquet")
    eframes = [
        ev.select(
            (F.col("event_id") + F.lit(i * 1_000_000_000)).alias(
                "event_id"
            ),
            (F.col("user_id") + F.lit(i * 10_000_000)).alias(
                "user_id"
            ),
            *[
                c
                for c in ev.columns
                if c not in ("event_id", "user_id")
            ],
        )
        for i in range(k)
    ]
    edup = eframes[0]
    for f in eframes[1:]:
        edup = edup.unionByName(f)
    edup.write.parquet(f"{out}/events.parquet")

    for t in ("customer", "nation", "region"):
        # single-file parquet in the test data; copy works either way
        src, dst = f"{BASE}/{t}.parquet", f"{out}/{t}.parquet"
        import os

        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    return out


def main() -> int:
    spark = get_spark("scale_probe_r11e")
    from datafusion_archive_spark.queries.pipeline48 import (
        q_holt_winters_weekly,
    )
    from datafusion_archive_spark.queries.pipeline63 import (
        _subseqs,
        q_matrix_profile_motifs,
    )
    from datafusion_archive_spark.queries.pipeline65 import (
        q_markov_attribution_removal,
    )
    from datafusion_archive_spark.queries.pipeline68 import (
        q_em_exponential_mixture,
    )

    sizes = [1, FACTOR, FACTOR * FACTOR]
    print(
        "# factor orders_rows events_rows subseqs | mp_wall hw_wall "
        "markov_wall em_wall (s)"
    )
    for k in sizes:
        d = densify(spark, k)
        n_orders = spark.read.parquet(f"{d}/orders.parquet").count()
        n_events = spark.read.parquet(f"{d}/events.parquet").count()
        n_sub = _subseqs(spark, d).count()
        t0 = time.time()
        q_matrix_profile_motifs(spark, d).collect()
        t_mp = time.time() - t0
        release_caches()
        t0 = time.time()
        q_holt_winters_weekly(spark, d).collect()
        t_hw = time.time() - t0
        release_caches()
        t0 = time.time()
        q_markov_attribution_removal(spark, d).collect()
        t_mk = time.time() - t0
        release_caches()
        t0 = time.time()
        q_em_exponential_mixture(spark, d).collect()
        t_em = time.time() - t0
        release_caches()
        print(
            f"{k} {n_orders} {n_events} {n_sub} | "
            f"{t_mp:.2f} {t_hw:.2f} {t_mk:.2f} {t_em:.2f}"
        )
    shutil.rmtree(WORK, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
