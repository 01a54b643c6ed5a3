"""Round-15 measurement for VERDICT r14 #5: should the scalar-state
iterative trainers (logistic_newton, huber_irls, cox_ph_newton,
em_exponential_mixture) adopt the loop_session child-session scope?

Unlike the label-propagation loops (per-iteration SHUFFLES whose
width must track the label count, and self-join lineage that needs
checkpoint truncation), these trainers run one GLOBAL aggregation
per step over a cached frame and collect a single row — there is no
per-iteration shuffle to right-size (a global agg's exchange carries
one partial row per task) and no lineage growth (each step's plan is
built fresh from the cached leaf). The only candidate win is AQE's
per-step re-plan overhead, so that is what this probe measures:

  A. the query exactly as shipped (caller session, AQE on), vs
  B. the identical per-step aggregation driven on a loop_session
     child (AQE off, loop-derived width), including the scope's own
     entry cost (pool access, conf sync, width derivation count),

both as end-to-end walls and as per-step walls on the warmed cache,
medians over N runs at sf0.1. Usage:
python tools/probe_scalar_loops_r15.py [runs]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from datafusion_archive_spark.operators.util import (
    cached,
    loop_session,
    release_caches,
)
from datafusion_archive_spark.session import get_spark

SF = "/root/testdata/sf0.1"
ITERS = 4


def _obs(spark):
    from datafusion_archive_spark.queries.pipeline54 import _obs as real

    return real(spark, SF)


def _newton_steps(obs) -> tuple[float, float]:
    a = b = 0.0
    for _ in range(ITERS):
        p = 1.0 / (1.0 + F.exp(-(F.lit(a) + F.lit(b) * F.col("x"))))
        w = p * (1.0 - p)
        stats = obs.agg(
            F.sum(w).alias("h00"),
            F.sum(w * F.col("x")).alias("h01"),
            F.sum(w * F.col("x") * F.col("x")).alias("h11"),
            F.sum(F.col("y") - p).alias("g0"),
            F.sum((F.col("y") - p) * F.col("x")).alias("g1"),
        ).collect()[0]
        det = stats.h00 * stats.h11 - stats.h01 * stats.h01
        a += (stats.h11 * stats.g0 - stats.h01 * stats.g1) / det
        b += (stats.h00 * stats.g1 - stats.h01 * stats.g0) / det
    return a, b


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("probe_scalar_loops_r15")

    # warm: cache the obs frame once; both variants then measure the
    # pure per-step loop cost over the SAME cached data
    obs = cached(_obs(spark))
    n = obs.count()
    print(f"# scalar-loop probe — runs={runs}, sf0.1, obs rows={n}")

    def timed(tag, fn):
        walls = []
        results = set()
        for _ in range(runs):
            t0 = time.time()
            results.add(tuple(round(v, 9) for v in fn()))
            walls.append(time.time() - t0)
        med = statistics.median(walls)
        print(
            f"{tag}: median {med:.3f}s  per-step {med / ITERS:.3f}s  "
            f"(runs: {', '.join(f'{w:.3f}' for w in walls)})"
        )
        assert len(results) == 1, f"non-deterministic results: {results}"
        return med, results.pop()

    # A: caller session, AQE on (the shipped path)
    med_a, res_a = timed("A caller+AQE   ", lambda: _newton_steps(obs))

    # B: loop_session child (AQE off, loop width), INCLUDING scope
    # entry cost — the honest adoption price
    def run_child():
        with loop_session(obs.sparkSession, n) as ls:
            return _newton_steps(ls.handoff(obs))

    med_b, res_b = timed("B child (scope)", run_child)

    # B': per-step cost once the scope is already open (steady state)
    with loop_session(obs.sparkSession, n) as ls:
        obs_l = ls.handoff(obs)
        med_b2, res_b2 = timed("B' child (open) ", lambda: _newton_steps(obs_l))

    assert res_a == res_b == res_b2, "variants disagree on coefficients"
    verdict = (
        "ADOPT" if med_b < med_a * 0.9 else "REJECT (no material win)"
    )
    print(
        f"# CONCLUSION: caller+AQE {med_a:.3f}s vs child-with-entry "
        f"{med_b:.3f}s vs child-steady {med_b2:.3f}s over {ITERS} "
        f"steps -> {verdict}. Coefficients identical across variants."
    )
    release_caches()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
