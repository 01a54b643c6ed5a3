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

AMBIENT ATTRIBUTION (--attribute, VERDICT r11 #7): shared-host
burstiness swings identical-code sweep readings ~1.5-2× within
minutes (graph_pagerank 16.5 → 36.5 s across the r11 battery logs,
proven ambient by a hand-run worktree A/B). With --attribute, every
growth/ceiling breach triggers an automatic same-commit A/B: the
breaching queries are re-run --attribute-runs times (fresh
check_oracle subprocesses on the same tree, same sf_dir) and the
MEDIAN re-read replaces the suspect reading. A breach whose re-read
lands back inside the gate is reported as AMBIENT (logged, not
fatal); one that reproduces is REAL and still fails the gate.
Missing-row violations are never attributable. This mechanizes the
attribution protocol PERF.md's history table applied by hand — no
more manual A/Bs on suspect totals.

Usage: python tools/sweep_outliers.py SMALL_LOG LARGE_LOG
       [--max-growth N] [--max-seconds N]
       [--attribute] [--sf-dir DIR] [--attribute-runs K]
e.g.:  python tools/sweep_outliers.py tools/oracle_sweep_r13.log \
           tools/oracle_sweep_r13_sf01.log --attribute \
           --sf-dir /root/testdata/sf0.1
--sf-dir is required with --attribute and is verified against the
large log's "# SF_DIR" header (stamped by check_oracle since r13).
"""

from __future__ import annotations

import argparse
import os
import re
import statistics
import subprocess
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


def log_sf_dir(path: str) -> str | None:
    """The ``# SF_DIR <path>`` header check_oracle stamps on every
    sweep log (since r13), or None for pre-r13 logs.

    Scans the WHOLE file: a log assembled by concatenating
    check_oracle runs (partial re-runs appended) carries one header
    per run, and if those runs were at different scales the mixed
    rows must not verify against only the first run's scale
    (ADVICE r13). Raises ValueError on >1 distinct header value.
    """
    seen: list[str] = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("# SF_DIR "):
                val = line[len("# SF_DIR "):].strip()
                if val not in seen:
                    seen.append(val)
    if len(seen) > 1:
        raise ValueError(
            f"{path}: {len(seen)} distinct '# SF_DIR' headers "
            f"({', '.join(seen)}) — mixed-scale log, refusing to "
            "verify against any single scale"
        )
    return seen[0] if seen else None


def audit_struct(
    small: dict[str, float],
    large: dict[str, float],
    max_growth: float,
    max_seconds: float,
    floor: float = 1.0,
) -> list[dict]:
    """Structured violations: {name, kind, msg} with kind in
    {"missing", "growth", "ceiling"} (empty = gate pass)."""
    bad: list[dict] = []
    for name in sorted(set(small) ^ set(large)):
        side = "small" if name in small else "large"
        bad.append(
            {
                "name": name,
                "kind": "missing",
                "msg": f"{name}: only present in the {side} log",
            }
        )
    for name in sorted(set(small) & set(large)):
        ratio = large[name] / max(small[name], floor)
        if ratio > max_growth:
            bad.append(
                {
                    "name": name,
                    "kind": "growth",
                    "msg": (
                        f"{name}: {small[name]:.1f}s -> {large[name]:.1f}s "
                        f"({ratio:.1f}x > {max_growth:.0f}x growth cap)"
                    ),
                }
            )
        if large[name] > max_seconds:
            bad.append(
                {
                    "name": name,
                    "kind": "ceiling",
                    "msg": (
                        f"{name}: {large[name]:.1f}s > "
                        f"{max_seconds:.0f}s ceiling"
                    ),
                }
            )
    return bad


def audit(
    small: dict[str, float],
    large: dict[str, float],
    max_growth: float,
    max_seconds: float,
    floor: float = 1.0,
) -> list[str]:
    """Back-compat wrapper: the violation messages only."""
    return [
        v["msg"]
        for v in audit_struct(small, large, max_growth, max_seconds, floor)
    ]


def reread_times(
    names: list[str],
    sf_dir: str,
    runs: int = 3,
    timeout: float = 3600.0,
) -> dict[str, float]:
    """Same-commit A/B: re-run the named queries ``runs`` times in
    fresh check_oracle subprocesses and return each query's MEDIAN
    re-read wall (absent if every re-run failed to produce a row —
    the caller treats that as non-attributable)."""
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "check_oracle.py")
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        try:
            proc = subprocess.run(
                [sys.executable, script, sf_dir, *names],
                capture_output=True,
                text=True,
                timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            # a hung re-run is itself evidence of a REAL breach —
            # queries with no successful re-read stay REAL in
            # attribute(), which is the right outcome; crashing the
            # gate with a traceback would be the least useful output
            # for the worst kind of regression (ADVICE r12)
            print(
                f"# ATTRIBUTION: re-run timed out after {timeout:.0f}s "
                "(hung re-read counts toward REAL)",
                file=sys.stderr,
            )
            continue
        for line in proc.stdout.splitlines():
            m = _LINE.match(line.strip())
            if m and m.group("name") in times:
                times[m.group("name")].append(float(m.group("sec")))
    return {
        n: statistics.median(ts) for n, ts in times.items() if ts
    }


def attribute(
    violations: list[dict],
    small: dict[str, float],
    max_growth: float,
    max_seconds: float,
    rereads: dict[str, float],
    floor: float = 1.0,
) -> tuple[list[dict], list[str]]:
    """Split growth/ceiling violations into (real, ambient-notes)
    using the re-read medians. A violation with no re-read stays
    real; missing-row violations are never attributable."""
    real: list[dict] = []
    ambient: list[str] = []
    for v in violations:
        rr = rereads.get(v["name"])
        if v["kind"] == "missing" or rr is None:
            real.append(v)
            continue
        if v["kind"] == "growth":
            ratio = rr / max(small[v["name"]], floor)
            if ratio <= max_growth:
                ambient.append(
                    f"{v['msg']} — re-read median {rr:.1f}s "
                    f"({ratio:.1f}x) inside the cap: ambient"
                )
                continue
        elif v["kind"] == "ceiling" and rr <= max_seconds:
            ambient.append(
                f"{v['msg']} — re-read median {rr:.1f}s inside the "
                "ceiling: ambient"
            )
            continue
        real.append(v)
    return real, ambient


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("small_log")
    ap.add_argument("large_log")
    ap.add_argument("--max-growth", type=float, default=15.0)
    ap.add_argument("--max-seconds", type=float, default=90.0)
    ap.add_argument(
        "--attribute",
        action="store_true",
        help="same-commit A/B on breach: re-run breaching queries and "
        "downgrade to AMBIENT any whose re-read median is back inside "
        "the gate",
    )
    ap.add_argument(
        "--sf-dir",
        default=None,
        help="scale dir for --attribute re-runs; REQUIRED with "
        "--attribute and must match the LARGE log's recorded scale "
        "(a mismatched scale silently compares apples to oranges: a "
        "re-read at a smaller scale lands inside the cap and "
        "misattributes a real breach as ambient)",
    )
    ap.add_argument("--attribute-runs", type=int, default=3)
    args = ap.parse_args()

    if args.attribute and not args.sf_dir:
        print(
            "# ERROR: --attribute requires an explicit --sf-dir "
            "matching the LARGE log's scale (no default — ADVICE r12)",
            file=sys.stderr,
        )
        return 2
    # scale verification covers BOTH logs in EVERY mode (r14 review:
    # the original ADVICE r13 fix only checked the large log under
    # --attribute, so a mixed-scale SMALL log — or any mixed log in a
    # plain gate run — still verified silently and inflated the
    # growth denominators)
    try:
        recorded_small = log_sf_dir(args.small_log)
        recorded = log_sf_dir(args.large_log)
    except ValueError as exc:
        print(f"# ERROR: {exc}", file=sys.stderr)
        return 2
    if (
        recorded_small is not None
        and recorded is not None
        and os.path.realpath(recorded_small) == os.path.realpath(recorded)
    ):
        print(
            f"# ERROR: small and large logs both record scale "
            f"{recorded}; the growth gate needs two DIFFERENT scales "
            "(same-scale inputs make every ratio ~1x and the gate "
            "meaningless)",
            file=sys.stderr,
        )
        return 2
    if args.attribute:
        # realpath, not normpath: check_oracle stamps sf_dir exactly
        # as passed on argv, so a relative spelling or a symlinked
        # alias of the same directory must still match (ADVICE r13)
        if recorded is not None and os.path.realpath(
            recorded
        ) != os.path.realpath(args.sf_dir):
            print(
                f"# ERROR: --sf-dir {args.sf_dir} does not match the "
                f"large log's recorded scale {recorded}; re-reads at "
                "the wrong scale would misattribute breaches",
                file=sys.stderr,
            )
            return 2

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
    bad = audit_struct(small, large, args.max_growth, args.max_seconds)

    ambient: list[str] = []
    if args.attribute and any(v["kind"] != "missing" for v in bad):
        names = sorted(
            {v["name"] for v in bad if v["kind"] != "missing"}
        )
        print(
            f"# ATTRIBUTION: re-running {len(names)} breaching "
            f"quer{'y' if len(names) == 1 else 'ies'} x"
            f"{args.attribute_runs} on the same tree ({args.sf_dir})"
        )
        sys.stdout.flush()
        rereads = reread_times(names, args.sf_dir, args.attribute_runs)
        bad, ambient = attribute(
            bad, small, args.max_growth, args.max_seconds, rereads
        )

    for msg in ambient:
        print(f"AMBIENT {msg}")
    for v in bad:
        print(f"VIOLATION {v['msg']}")
    print(
        f"# {len(set(small) & set(large))} queries compared; "
        f"worst-growth {worst[1]} {worst[0]:.1f}x; "
        f"slowest {slowest[1]} {slowest[0]:.1f}s; "
        f"ambient={len(ambient)} violations={len(bad)}"
    )
    print("# GATE " + ("PASS" if not bad else "FAIL"))
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())
