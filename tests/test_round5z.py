"""Round-5 wave-30 semantics: double-smoothing forecast, stickiness
(datafusion_archive_spark/queries/pipeline32.py)."""

from __future__ import annotations

import datetime
import math
from collections import defaultdict

from datafusion_archive_spark.queries import pipeline32 as P32
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


class TestDoubleSmoothing:
    def test_matches_python(self, spark):
        daily = defaultdict(float)
        epoch = datetime.date(1992, 1, 1)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            d = (r.o_orderdate.date() - epoch).days
            daily[d] = round(daily[d] + r.o_totalprice, 2)
        a = P32._DS_ALPHA

        def ewma(series, t, span):
            ks = [k for k in range(span) if (t - k) in series]
            num = sum((1 - a) ** k * series[t - k] for k in ks)
            den = sum((1 - a) ** k for k in ks)
            return num / den

        s1 = {t: ewma(daily, t, P32._DS_SPAN) for t in daily}
        s2 = {t: ewma(s1, t, P32._DS_SPAN) for t in s1}
        got = {r.day: r for r in P32.q_double_smoothing_forecast(spark, SF).collect()}
        want_days = {t + 1 for t in s2 if (t + 1) in daily}
        assert set(got) == want_days
        for d in want_days:
            f = 2 * s1[d - 1] - s2[d - 1]
            assert math.isclose(got[d].actual, daily[d], abs_tol=0.02)
            assert math.isclose(got[d].forecast, f, abs_tol=0.02), d
            assert math.isclose(
                got[d].abs_err, abs(daily[d] - f), abs_tol=0.05
            )

    def test_beats_persistence_baseline(self, spark):
        """On a noisy series the smoother approaches the (optimal)
        local mean, so it must beat naive persistence (forecast =
        yesterday's actual), whose MAE on white noise is ~2× the
        deviation from the mean."""
        rows = sorted(
            P32.q_double_smoothing_forecast(spark, SF).collect(),
            key=lambda r: r.day,
        )
        by_day = {r.day: r.actual for r in rows}
        persist = [
            abs(r.actual - by_day[r.day - 1])
            for r in rows
            if (r.day - 1) in by_day
        ]
        mae = sum(r.abs_err for r in rows) / len(rows)
        assert mae < sum(persist) / len(persist)


class TestStickiness:
    def test_matches_python(self, spark):
        epoch = datetime.date(2024, 1, 1)
        act = set()
        for r in load_events(spark, SF).collect():
            act.add((r.user_id, (r.ts.date() - epoch).days))
        days = sorted({d for _, d in act})
        got = {r.day: r for r in P32.q_active_users_stickiness(spark, SF).collect()}
        assert set(got) == set(days)
        for d in days:
            dau = len({u for u, dd in act if dd == d})
            wau = len({u for u, dd in act if d - 7 < dd <= d})
            mau = len({u for u, dd in act if d - 28 < dd <= d})
            assert got[d].dau == dau, d
            assert got[d].wau == wau, d
            assert got[d].mau == mau, d
            assert math.isclose(got[d].stickiness, dau / mau, abs_tol=1e-5)
            assert dau <= wau <= mau
