"""Round-5 wave-56 semantics: DW/AR(1), CCF lead-lag
(datafusion_archive_spark/queries/pipeline58.py)."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import timedelta

import pytest

from datafusion_archive_spark.queries import pipeline58 as P58

SF = "/root/testdata/sf0.001"


def _orders(spark):
    agg = defaultdict(lambda: [0, 0.0])
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        d = r.o_orderdate
        d = d.date() if hasattr(d, "date") else d
        agg[d][0] += 1
        agg[d][1] += float(r.o_totalprice)
    return agg


class TestDurbinWatson:
    def test_matches_python(self, spark):
        agg = _orders(spark)
        days = sorted(agg)
        ys = [agg[d][1] for d in days]
        n = len(ys)
        ts = list(range(n))
        mt = sum(ts) / n
        my = sum(ys) / n
        b = sum((t - mt) * (y - my) for t, y in zip(ts, ys)) / sum(
            (t - mt) ** 2 for t in ts
        )
        es = [y - (my + b * (t - mt)) for t, y in zip(ts, ys)]
        dw = sum(
            (es[i] - es[i - 1]) ** 2 for i in range(1, n)
        ) / sum(e * e for e in es)
        phi = sum(es[i] * es[i - 1] for i in range(1, n)) / sum(
            es[i - 1] ** 2 for i in range(1, n)
        )
        r = P58.q_ar1_durbin_watson(spark, SF).collect()[0]
        assert r.n_days == n
        assert r.trend_slope == pytest.approx(round(b, 4), abs=1e-2)
        assert r.durbin_watson == pytest.approx(round(dw, 6), abs=1e-5)
        assert r.phi_ar1 == pytest.approx(round(phi, 6), abs=1e-5)
        # DW ~ 2(1 - phi) identity (approximate, end effects)
        assert abs(r.durbin_watson - 2 * (1 - r.phi_ar1)) < 0.15


class TestCcf:
    def test_matches_python(self, spark):
        agg = _orders(spark)
        days = sorted(agg)
        x = {d: float(agg[d][0]) for d in days}
        y = {d: agg[d][1] / agg[d][0] for d in days}

        def corr(pairs):
            n = len(pairs)
            ma = sum(a for a, _ in pairs) / n
            mb = sum(b for _, b in pairs) / n
            ca = sum((a - ma) * (b - mb) for a, b in pairs)
            va = sum((a - ma) ** 2 for a, _ in pairs)
            vb = sum((b - mb) ** 2 for _, b in pairs)
            return ca / math.sqrt(va * vb)

        got = {r.lag: r for r in P58.q_ccf_leadlag(spark, SF).collect()}
        assert set(got) == set(range(-P58._MAX_LAG, P58._MAX_LAG + 1))
        for k in got:
            pairs = [
                (x[d], y[d + timedelta(days=k)])
                for d in days
                if d + timedelta(days=k) in y
            ]
            r = got[k]
            assert r.n_pairs == len(pairs)
            assert r.ccf == pytest.approx(
                round(corr(pairs), 6), abs=1e-5
            )
