"""Round-5 wave-37 semantics: Theil–Sen slope, Pettitt changepoint
(datafusion_archive_spark/queries/pipeline39.py)."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import date

import pytest

from datafusion_archive_spark.queries import pipeline39 as P39

SF = "/root/testdata/sf0.001"


def _daily(spark):
    agg = defaultdict(float)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        agg[r.o_orderdate] += float(r.o_totalprice)
    return dict(agg)


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    mid = n // 2
    return xs[mid] if n % 2 else (xs[mid - 1] + xs[mid]) / 2.0


class TestTheilSen:
    def test_matches_python(self, spark):
        daily = _daily(spark)
        epoch = date(1992, 1, 1)
        pts = sorted(
            (
                int(((d.date() if hasattr(d, "date") else d) - epoch).days),
                v,
            )
            for d, v in daily.items()
        )
        slopes = [
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1 :]
        ]
        slope = _median(slopes)
        intercept = _median([y - slope * x for x, y in pts])
        r = P39.q_theil_sen_slope(spark, SF).collect()[0]
        assert r.n_days == len(pts)
        assert r.n_pairs == len(slopes)
        assert r.theil_sen_slope == pytest.approx(round(slope, 6), abs=1e-6)
        assert r.intercept == pytest.approx(round(intercept, 4), abs=1e-3)


class TestPettitt:
    def test_matches_quadratic_definition(self, spark):
        daily = _daily(spark)
        days = sorted(daily)
        xs = [daily[d] for d in days]
        n = len(xs)
        # the textbook double sum the query replaces with rank algebra
        best_k, best_d = -1, None
        u = 0
        for t in range(n - 1):
            # incremental quadratic: U_t = U_{t-1} + sum_j sgn(x_t - x_j)
            u += sum(
                (xs[t] > xs[j]) - (xs[t] < xs[j])
                for j in range(n)
                if j != t
            )
            if abs(u) > best_k:
                best_k, best_d = abs(u), days[t]
        r = P39.q_pettitt_changepoint(spark, SF).collect()[0]
        assert r.n_days == n
        assert r.k_stat == best_k
        assert r.change_date == best_d
        want_p = round(2.0 * math.exp(-6.0 * best_k**2 / (n**3 + n**2)), 8)
        assert r.p_approx == pytest.approx(want_p, abs=1e-8)
