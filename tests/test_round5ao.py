"""Round-5 wave-46 semantics: Holt–Winters weekly smoothing
(datafusion_archive_spark/queries/pipeline48.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline48 as P48

SF = "/root/testdata/sf0.001"


def _series_by_nation(spark):
    cust = {
        r.c_custkey: r.c_nationkey
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    nation = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    daily = defaultdict(lambda: defaultdict(float))
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        daily[nation[cust[r.o_custkey]]][r.o_orderdate] += float(
            r.o_totalprice
        )
    return {
        nm: [byday[d] for d in sorted(byday)]
        for nm, byday in daily.items()
    }


def _hw(ys):
    s_ = P48._S
    l0 = sum(ys[:s_]) / s_
    b = (sum(ys[s_ : 2 * s_]) / s_ - l0) / s_
    seas = [ys[i] - l0 for i in range(s_)]
    lev = l0
    sse = cnt = 0
    for t in range(s_, len(ys)):
        p = t % s_
        e = ys[t] - (lev + b + seas[p])
        sse += e * e
        cnt += 1
        new_lev = P48._ALPHA * (ys[t] - seas[p]) + (1 - P48._ALPHA) * (
            lev + b
        )
        b = P48._BETA * (new_lev - lev) + (1 - P48._BETA) * b
        seas[p] = (
            P48._GAMMA * (ys[t] - new_lev) + (1 - P48._GAMMA) * seas[p]
        )
        lev = new_lev
    return lev, b, math.sqrt(sse / cnt)


class TestHoltWinters:
    def test_matches_python_replay(self, spark):
        series = _series_by_nation(spark)
        got = {r.nation: r for r in
               P48.q_holt_winters_weekly(spark, SF).collect()}
        expected_nations = {
            nm for nm, ys in series.items()
            if len(ys) >= 2 * P48._S + 1
        }
        assert set(got) == expected_nations
        for nm in expected_nations:
            lev, b, rmse = _hw(series[nm])
            r = got[nm]
            assert r.n_days == len(series[nm])
            assert r.final_level == pytest.approx(round(lev, 4), abs=1e-3)
            assert r.final_trend == pytest.approx(round(b, 6), abs=1e-4)
            assert r.rmse_onestep == pytest.approx(round(rmse, 4),
                                                   abs=1e-3)

    def test_seasonal_improves_on_flat_forecast(self, spark):
        # HW one-step RMSE should beat the naive global-mean RMSE for
        # most nations (it adapts level + season)
        series = _series_by_nation(spark)
        got = {r.nation: r.rmse_onestep for r in
               P48.q_holt_winters_weekly(spark, SF).collect()}
        better = 0
        for nm, rmse in got.items():
            ys = series[nm]
            mu = sum(ys) / len(ys)
            naive = math.sqrt(sum((y - mu) ** 2 for y in ys) / len(ys))
            better += rmse < 1.5 * naive
        assert better >= len(got) * 0.8
