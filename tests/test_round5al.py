"""Round-5 wave-43 semantics: isotonic minimax fit, DiD estimator
(datafusion_archive_spark/queries/pipeline45.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline45 as P45

SF = "/root/testdata/sf0.001"


def _pava(ys, ws):
    """Classic pool-adjacent-violators on (value, weight) lists;
    returns merged blocks as [weighted_sum, weight]."""
    stack = []
    for y, w in zip(ys, ws):
        stack.append([y * w, w])
        while (
            len(stack) > 1
            and stack[-2][0] / stack[-2][1] >= stack[-1][0] / stack[-1][1]
        ):
            sy2, w2 = stack.pop()
            stack[-1][0] += sy2
            stack[-1][1] += w2
    return stack


class TestIsotonic:
    def test_matches_pava(self, spark):
        agg = defaultdict(lambda: [0, 0])
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            b = int(float(r.o_totalprice) // P45._BIN_W)
            agg[b][0] += 1
            agg[b][1] += r.o_orderpriority == "1-URGENT"
        bins = sorted(agg)
        ws = [agg[b][0] for b in bins]
        ys = [agg[b][1] / agg[b][0] for b in bins]
        blocks = _pava(ys, ws)
        # expand merged blocks back to per-bin fitted values
        want = []
        bi = 0
        for sy, w in blocks:
            mean = sy / w
            acc = 0
            while acc < w:
                acc += ws[bi]
                want.append(round(mean, 6))
                bi += 1
            assert acc == w  # block boundaries align with bins
        got = P45.q_isotonic_calibration(spark, SF).collect()
        assert [r.bin for r in got] == bins
        for r, f in zip(got, want):
            assert r.fitted_rate == pytest.approx(f, abs=2e-6)
        # monotone non-decreasing
        fs = [r.fitted_rate for r in got]
        assert all(a <= b + 1e-9 for a, b in zip(fs, fs[1:]))
        # weighted means preserved overall (PAVA conserves mass)
        tot_raw = sum(y * w for y, w in zip(ys, ws))
        tot_fit = sum(f * w for f, w in zip(want, ws))
        assert tot_fit == pytest.approx(tot_raw, rel=1e-4)


class TestDiD:
    def test_matches_python(self, spark):
        from datafusion_archive_spark.queries.timeseries import load_events

        rows = load_events(spark, SF).collect()
        first = {}
        for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
            first.setdefault(r.user_id, r.event_type)
        treated = {u for u, et in first.items() if et == "signup"}
        cells = defaultdict(list)
        split = P45._SPLIT
        for r in rows:
            if r.event_type != "purchase":
                continue
            t = 1 if r.user_id in treated else 0
            post = 1 if str(r.ts)[:10] >= split else 0
            cells[(t, post)].append(float(r.value))
        m = {k: sum(v) / len(v) for k, v in cells.items()}
        did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
        var = 0.0
        for k, v in cells.items():
            mu = m[k]
            s2 = sum((x - mu) ** 2 for x in v) / (len(v) - 1)
            var += s2 / len(v)
        r = P45.q_diff_in_diff(spark, SF).collect()[0]
        assert r.n_purchases == sum(len(v) for v in cells.values())
        assert r.treated_post == pytest.approx(round(m[(1, 1)], 4), abs=1e-3)
        assert r.did_effect == pytest.approx(round(did, 4), abs=1e-3)
        assert r.se_did == pytest.approx(round(math.sqrt(var), 4), abs=1e-3)
