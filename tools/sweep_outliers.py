"""Per-query growth gate over two oracle-sweep logs — the mechanized
version of the round-11 sweep-cliff audit.

Round 11 found four scale cliffs by hand-sorting the sf0.1 sweep log
by per-query wall and comparing against sf0.01 (dbscan_clusters at
2044 s was ~150× its sf0.01 time while every healthy query stayed at
or under ~8× for the 10× data step — PERF.md "Round-11 sweep-cliff
audit"). This script makes that comparison a gate: parse a small-SF
and a large-SF sweep log, compute each query's wall-time ratio, and
fail on anything super-linear past the cap or absolutely slow past
the ceiling.

The GATE (exit status):
- any query with time_large / max(time_small, floor) > --max-growth
  (default 15× for a 10× data step — healthy queries in the r11 logs
  top out near 8×; the floor keeps sub-second denominators from
  manufacturing ratios out of session noise) → fail;
- any query above --max-seconds in the large log (default 90 s —
  the slowest legitimate query, graph_pagerank, runs ~25 s warm;
  a 90 s+ entry is a new cliff regardless of its ratio) → fail;
- a query present in one log but not the other → fail (a crashed or
  skipped row must not silently escape the growth check).

Usage: python tools/sweep_outliers.py SMALL_LOG LARGE_LOG
       [--max-growth N] [--max-seconds N]
e.g.:  python tools/sweep_outliers.py tools/oracle_sweep_r11.log \
           tools/oracle_sweep_r11_sf01.log
"""

from __future__ import annotations

import argparse
import re
import sys

# PASS name: 123 rows (4.5s)   /   ROWS-ONLY name: ... (4.5s)
_LINE = re.compile(
    r"^(?:PASS|ROWS-ONLY) (?P<name>[a-z0-9_]+):.*\((?P<sec>[0-9.]+)s\)"
)


def parse_log(path: str) -> dict[str, float]:
    out: dict[str, float] = {}
    with open(path) as fh:
        for line in fh:
            m = _LINE.match(line.strip())
            if m:
                out[m.group("name")] = float(m.group("sec"))
    return out


def audit(
    small: dict[str, float],
    large: dict[str, float],
    max_growth: float,
    max_seconds: float,
    floor: float = 1.0,
) -> list[str]:
    """Return the list of violation messages (empty = gate pass)."""
    bad = []
    for name in sorted(set(small) ^ set(large)):
        side = "small" if name in small else "large"
        bad.append(f"{name}: only present in the {side} log")
    for name in sorted(set(small) & set(large)):
        ratio = large[name] / max(small[name], floor)
        if ratio > max_growth:
            bad.append(
                f"{name}: {small[name]:.1f}s -> {large[name]:.1f}s "
                f"({ratio:.1f}x > {max_growth:.0f}x growth cap)"
            )
        if large[name] > max_seconds:
            bad.append(
                f"{name}: {large[name]:.1f}s > {max_seconds:.0f}s ceiling"
            )
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("small_log")
    ap.add_argument("large_log")
    ap.add_argument("--max-growth", type=float, default=15.0)
    ap.add_argument("--max-seconds", type=float, default=90.0)
    args = ap.parse_args()

    small = parse_log(args.small_log)
    large = parse_log(args.large_log)
    if not small or not large:
        print("# ERROR: empty or unparseable log", file=sys.stderr)
        return 2
    worst = max(
        ((large[n] / max(small[n], 1.0), n) for n in set(small) & set(large)),
        default=(0.0, "-"),
    )
    slowest = max(((t, n) for n, t in large.items()), default=(0.0, "-"))
    bad = audit(small, large, args.max_growth, args.max_seconds)
    for msg in bad:
        print(f"VIOLATION {msg}")
    print(
        f"# {len(set(small) & set(large))} queries compared; "
        f"worst-growth {worst[1]} {worst[0]:.1f}x; "
        f"slowest {slowest[1]} {slowest[0]:.1f}s; "
        f"violations={len(bad)}"
    )
    print("# GATE " + ("PASS" if not bad else "FAIL"))
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())
