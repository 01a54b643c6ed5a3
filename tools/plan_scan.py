"""Registry-wide physical-plan scan + gate — the mechanized version
of the per-round ``plan_scan_r{N}.log`` artifact.

Builds every registered query's plan at a scale factor and prints one
line per query: name, hash-exchange count (deduped by formatted
plan-node id — ``plans.inspect.summarize`` — so cached-subtree
re-prints don't inflate it), numbered file scans, and whether a
CartesianProduct appears anywhere (including cached branches).

The GATE (exit status):
- any CartesianProduct anywhere → fail;
- any build error → fail;
- any query above ``--max-exchanges`` (default 20) → fail — the
  known-worst iterative trainers sit at 17 (see PERF.md round-10
  notes), so a breach means either a new unjustified fan-out or a
  regression in an existing plan;
- any query above ``--max-scans`` (default 6) → fail — the registry's
  widest plans are the 6-table TPC-H joins (q5/q7/q21) and the
  multi-table referential-integrity audit, all 6 DISTINCT tables; a
  breach is the uncached fan-out-recompute class (one source re-read
  per branch of a reused subtree — the r8 spearman/wasserstein bug
  shape), which exchange counts alone can miss when the re-reads are
  scan-only.

Usage: python tools/plan_scan.py [sf_dir] [--max-exchanges N]
       [--max-scans N]
Redirect stdout to tools/plan_scan_r{N}.log per-round.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from datafusion_archive_spark.plans import summarize
from datafusion_archive_spark.queries import QUERIES
from datafusion_archive_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:]]
    max_exchanges = 20
    if "--max-exchanges" in args:
        i = args.index("--max-exchanges")
        max_exchanges = int(args[i + 1])
        del args[i : i + 2]
    max_scans = 6
    if "--max-scans" in args:
        i = args.index("--max-scans")
        max_scans = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    spark = get_spark("plan_scan")
    print(f"# Registry-wide physical-plan scan ({len(QUERIES)} queries,")
    print(f"# {sf_dir}): columns = name, hash exchanges (deduped by")
    print("# formatted plan-node id), numbered file scans,")
    print("# CartesianProduct present. Gate: no cartesian, no build")
    print(f"# errors, exchanges <= {max_exchanges}, scans <= {max_scans}.")
    print("name exchanges scans cartesian")
    worst = ("-", -1)
    worst_scans = ("-", -1)
    n_err = n_cart = n_over = n_scans_over = 0
    for name in sorted(QUERIES):
        try:
            s = summarize(QUERIES[name](spark, sf_dir))
        except Exception as e:  # build error IS a finding, keep going
            print(f"{name} ERROR {type(e).__name__}: {e}")
            n_err += 1
            continue
        cart = "CartesianProduct" in s.joins
        n_cart += cart
        n_over += s.n_hash_exchanges > max_exchanges
        n_scans_over += s.n_scans > max_scans
        if s.n_hash_exchanges > worst[1]:
            worst = (name, s.n_hash_exchanges)
        if s.n_scans > worst_scans[1]:
            worst_scans = (name, s.n_scans)
        print(name, s.n_hash_exchanges, s.n_scans, cart)
    print(
        f"# WORST-EXCHANGES {worst[0]} {worst[1]}; "
        f"WORST-SCANS {worst_scans[0]} {worst_scans[1]}; "
        f"errors={n_err}; cartesian={n_cart}; over-cap={n_over}; "
        f"scans-over-cap={n_scans_over}"
    )
    ok = n_err == 0 and n_cart == 0 and n_over == 0 and n_scans_over == 0
    print(f"# GATE {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
