"""Round-5 wave-20 semantics: max drawdown, entropy rate, conversion
timing, local peaks, Bollinger breaches
(datafusion_archive_spark/queries/pipeline22.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from datafusion_archive_spark.queries import pipeline22 as P22
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


def _daily(spark):
    daily = defaultdict(float)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        d = r.o_orderdate.strftime("%Y-%m-%d")
        daily[d] = round(daily[d] + r.o_totalprice, 2)
    return daily


class TestDrawdown:
    def test_matches_python(self, spark):
        daily = _daily(spark)
        peak, best = 0.0, None
        for d in sorted(daily):
            peak = max(peak, daily[d])
            dd = (peak - daily[d]) / peak
            if best is None or dd > best[1] + 1e-12:
                best = (d, dd, peak)
        row = P22.q_max_drawdown_daily(spark, SF).collect()[0]
        assert row.trough_day == best[0]
        assert math.isclose(row.max_drawdown, best[1], abs_tol=1e-5)
        assert math.isclose(row.peak_rev, best[2], abs_tol=0.02)
        assert 0 < row.max_drawdown < 1


class TestEntropyRate:
    def test_matches_python(self, spark):
        seqs = defaultdict(list)
        for r in sorted(
            load_events(spark, SF).collect(),
            key=lambda r: (r.user_id, r.ts, r.event_id),
        ):
            seqs[r.user_id].append(r.event_type)
        pairs = defaultdict(int)
        for s in seqs.values():
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += 1
        nt = sum(pairs.values())
        nr = defaultdict(int)
        nc = defaultdict(int)
        for (a, b), n in pairs.items():
            nr[a] += n
            nc[b] += n
        hc = -sum(
            n / nt * math.log(n / nr[a]) for (a, b), n in pairs.items()
        )
        hm = -sum(
            n / nt * math.log(nc[b] / nt) for (a, b), n in pairs.items()
        )
        row = P22.q_entropy_rate_transitions(spark, SF).collect()[0]
        assert row.n_transitions == nt
        assert math.isclose(row.h_cond_nats, hc, abs_tol=1e-5)
        assert math.isclose(row.h_marginal_nats, hm, abs_tol=1e-5)
        # conditioning never increases entropy
        assert row.h_cond_nats <= row.h_marginal_nats + 1e-9
        assert math.isclose(row.memory_ratio, hc / hm, abs_tol=1e-5)


class TestConversionTiming:
    def test_matches_python(self, spark):
        ev = load_events(spark, SF).collect()
        clicks = defaultdict(list)
        for r in ev:
            if r.event_type == "click":
                clicks[r.user_id].append(r.ts)
        lags = []
        for r in ev:
            if r.event_type != "purchase":
                continue
            prior = [t for t in clicks.get(r.user_id, []) if t <= r.ts]
            if prior:
                lags.append((r.ts - max(prior)).total_seconds())
        row = P22.q_conversion_time_percentiles(spark, SF).collect()[0]
        assert row.n_converted == len(lags)
        assert math.isclose(
            row.p50_lag_s, np.percentile(lags, 50), abs_tol=0.02
        )
        assert math.isclose(
            row.p90_lag_s, np.percentile(lags, 90), abs_tol=0.02
        )
        assert row.p50_lag_s <= row.p90_lag_s


class TestLocalPeaks:
    def test_matches_python(self, spark):
        daily = _daily(spark)
        days = sorted(daily)
        mu = sum(daily.values()) / len(days)
        want = {
            d
            for i, d in enumerate(days)
            if 0 < i < len(days) - 1
            and daily[d] > daily[days[i - 1]]
            and daily[d] > daily[days[i + 1]]
            and daily[d] > P22._PEAK_FACTOR * mu
        }
        got = {r.day for r in P22.q_local_peaks_daily(spark, SF).collect()}
        assert got == want
        assert got  # non-vacuous at this SF


class TestBollinger:
    def test_matches_python(self, spark):
        daily = _daily(spark)
        days = sorted(daily)
        want = {}
        for i, d in enumerate(days):
            lo = max(0, i - P22._BOLL_WIN)
            prior = [daily[x] for x in days[lo:i]]
            if len(prior) < P22._BOLL_MIN_PRIORS:
                continue
            mu = float(np.mean(prior))
            sd = float(np.std(prior, ddof=1))
            if daily[d] > mu + P22._BOLL_K * sd:
                want[d] = "high"
            elif daily[d] < mu - P22._BOLL_K * sd:
                want[d] = "low"
        got = {
            r.day: r.direction
            for r in P22.q_bollinger_breaches(spark, SF).collect()
        }
        assert got == want
        # both directions occur or the band test is one-sided-vacuous
        assert set(got.values()) == {"high", "low"}
