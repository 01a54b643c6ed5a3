"""Round-5 wave-68 semantics: Gini decision stump
(datafusion_archive_spark/queries/pipeline70.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline70 as P70

SF = "/root/testdata/sf0.001"


class TestDecisionStump:
    def test_matches_python(self, spark):
        obs = [
            (math.log(float(r.o_totalprice)),
             1 if r.o_orderpriority == "1-URGENT" else 0)
            for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
        ]
        lo = min(x for x, _ in obs)
        hi = max(x for x, _ in obs)
        bins = defaultdict(lambda: [0, 0])
        for x, y in obs:
            b = min(P70._BINS - 1,
                    int((x - lo) / (hi - lo) * P70._BINS))
            bins[b][0] += 1
            bins[b][1] += y
        nt = sum(v[0] for v in bins.values())
        pt = sum(v[1] for v in bins.values())
        pp = pt / nt
        gp = 2 * pp * (1 - pp)
        best = None
        nl = pl = 0
        for b in sorted(bins):
            nl += bins[b][0]
            pl += bins[b][1]
            if nl >= nt:
                continue
            rl = pl / nl
            rr = (pt - pl) / (nt - nl)
            gain = gp - (
                nl / nt * 2 * rl * (1 - rl)
                + (nt - nl) / nt * 2 * rr * (1 - rr)
            )
            key = (-round(gain, 8), b)
            if best is None or key < best[0]:
                thr = lo + (hi - lo) * (b + 1) / P70._BINS
                best = (key, thr, nl, nt - nl, rl, rr, gain)
        r = P70.q_decision_stump_gini(spark, SF).collect()[0]
        _, thr, n_l, n_r, rl, rr, gain = best
        assert (r.n_left, r.n_right) == (n_l, n_r)
        assert r.threshold == pytest.approx(round(thr, 6), abs=1e-5)
        assert r.rate_left == pytest.approx(round(rl, 6), abs=1e-6)
        assert r.rate_right == pytest.approx(round(rr, 6), abs=1e-6)
        assert r.rate_parent == pytest.approx(round(pp, 6), abs=1e-6)
        assert r.gini_gain == pytest.approx(round(gain, 8), abs=1e-7)
        # a split can never have negative impurity decrease
        assert r.gini_gain >= 0.0
