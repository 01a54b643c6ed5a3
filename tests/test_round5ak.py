"""Round-5 wave-42 semantics: clamped stateful scan, exact Shapley
attribution (datafusion_archive_spark/queries/pipeline44.py)."""

from __future__ import annotations

from collections import defaultdict
from itertools import permutations

import pytest

from datafusion_archive_spark.queries import pipeline44 as P44

SF = "/root/testdata/sf0.001"


class TestClampedScan:
    def test_matches_python_replay(self, spark):
        cust = {
            r.c_custkey: r.c_nationkey
            for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
        }
        nation = {
            r.n_nationkey: r.n_name
            for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
        }
        deltas = defaultdict(lambda: defaultdict(int))
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            nm = nation[cust[r.o_custkey]]
            if r.o_orderpriority in P44._UP:
                deltas[nm][r.o_orderdate] += 1
            elif r.o_orderpriority in P44._DOWN:
                deltas[nm][r.o_orderdate] -= 1
            else:
                deltas[nm][r.o_orderdate] += 0
        want = {}
        for nm, byday in deltas.items():
            b = mx = capped = zero = 0
            for d in sorted(byday):
                b = min(P44._CAP, max(0, b + byday[d]))
                mx = max(mx, b)
                capped += b == P44._CAP
                zero += b == 0
            want[nm] = (b, mx, capped, zero)
        got = {
            r.nation: (r.final_backlog, r.max_backlog,
                       r.n_days_capped, r.n_days_zero)
            for r in P44.q_inventory_clamped_scan(spark, SF).collect()
        }
        assert got == want

    def test_clamp_is_non_associative(self):
        # the property that rules out any window/partial-agg plan:
        # scanning [5, -10, 10] clamped at [0, 8] != clamping the sum
        seq = [5, -10, 10]
        b = 0
        for d in seq:
            b = min(8, max(0, b + d))
        assert b == 8 and min(8, max(0, sum(seq))) == 5


class TestShapley:
    def test_matches_permutation_definition(self, spark):
        per = defaultdict(lambda: [0, 0, 0, 0])
        for r in spark.read.parquet(f"{SF}/events.parquet").collect():
            f = per[r.user_id]
            for i, c in enumerate(P44._CHANNELS):
                if r.event_type == c:
                    f[i] = 1
            if r.event_type == "purchase":
                f[3] = 1
        coal_n = defaultdict(int)
        coal_y = defaultdict(int)
        for f in per.values():
            key = tuple(f[:3])
            coal_n[key] += 1
            coal_y[key] += f[3]

        def v(key):
            return coal_y[key] / coal_n[key] if coal_n.get(key) else 0.0

        # Shapley via the permutation (marginal-contribution) form —
        # an independent formulation from the query's subset unroll
        phi = [0.0, 0.0, 0.0]
        perms = list(permutations(range(3)))
        for order in perms:
            have = [0, 0, 0]
            for ch in order:
                before = v(tuple(have))
                have[ch] = 1
                phi[ch] += (v(tuple(have)) - before) / len(perms)
        got = {r.channel: r.shapley for r in
               P44.q_shapley_attribution(spark, SF).collect()}
        for i, c in enumerate(P44._CHANNELS):
            assert got[c] == pytest.approx(round(phi[i], 6), abs=2e-6)
        # efficiency axiom: contributions sum to v(N) - v(empty)
        assert sum(got.values()) == pytest.approx(
            v((1, 1, 1)) - v((0, 0, 0)), abs=5e-6
        )
