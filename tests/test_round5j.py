"""Round-5 wave-13 semantics: RFM segmentation, Pareto/ABC, Benford
digit screen, EWMA, CUSUM changepoint, ACF
(datafusion_archive_spark/queries/pipeline15.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from datafusion_archive_spark.plans import summarize
from datafusion_archive_spark.queries import pipeline15 as P15

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").collect()


def _events(spark):
    from datafusion_archive_spark.queries.timeseries import load_events

    return load_events(spark, SF).collect()


class TestRfm:
    def test_matches_python(self, spark):
        rows = _orders(spark)
        per = {}
        for r in rows:
            d = per.setdefault(
                r.o_custkey, {"last": None, "n": 0, "mon": 0.0}
            )
            day = (r.o_orderdate.date() - np.datetime64("1992-01-01").item()).days
            d["last"] = day if d["last"] is None else max(d["last"], day)
            d["n"] += 1
            d["mon"] = round(d["mon"] + r.o_totalprice, 2)
        mx = max(d["last"] for d in per.values())
        rec = [float(mx - d["last"]) for d in per.values()]
        fre = [float(d["n"]) for d in per.values()]
        mon = [d["mon"] for d in per.values()]
        cuts = {
            "rec": np.percentile(rec, [25, 50, 75], method="linear"),
            "fre": np.percentile(fre, [25, 50, 75], method="linear"),
            "mon": np.percentile(mon, [25, 50, 75], method="linear"),
        }
        score = lambda v, cs: 1 + sum(1 for b in cs if v > b)
        segs = defaultdict(lambda: [0, 0.0])
        for r_, f_, m_ in zip(rec, fre, mon):
            k = (
                score(r_, cuts["rec"]),
                score(f_, cuts["fre"]),
                score(m_, cuts["mon"]),
            )
            segs[k][0] += 1
            segs[k][1] += m_
        got = {
            (r.r_score, r.f_score, r.m_score): (
                r.n_customers,
                r.avg_monetary,
            )
            for r in P15.q_rfm_segments(spark, SF).collect()
        }
        want = {
            k: (n, round(tot / n, 2)) for k, (n, tot) in segs.items()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0], k
            assert math.isclose(got[k][1], want[k][1], abs_tol=0.02), k

    def test_no_global_window(self, spark):
        """Quartile scoring must be the broadcast-cutpoint fold, not
        ntile over a global order: the plan has no Window at all."""
        s = summarize(P15.q_rfm_segments(spark, SF))
        assert "Window" not in s.raw


class TestParetoAbc:
    def test_matches_python(self, spark):
        li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
        rev = defaultdict(float)
        for r in li:
            rev[r.l_partkey] = round(rev[r.l_partkey] + r.l_extendedprice, 2)
        tot = sum(rev.values())
        cum = 0.0
        cls = defaultdict(lambda: [0, 0.0])
        for pk in sorted(rev, key=lambda p: (-rev[p], p)):
            cum += rev[pk]
            c = "A" if cum / tot <= 0.80 else ("B" if cum / tot <= 0.95 else "C")
            cls[c][0] += 1
            cls[c][1] += rev[pk]
        got = {
            r.abc_class: (r.n_parts, r.revenue, r.rev_share)
            for r in P15.q_pareto_abc_parts(spark, SF).collect()
        }
        assert set(got) == set(cls)
        for c, (n, revs) in cls.items():
            assert got[c][0] == n, c
            assert math.isclose(got[c][1], revs, abs_tol=0.05), c
            assert math.isclose(got[c][2], revs / tot, abs_tol=1e-5), c
        # Pareto shape: class A has fewer parts than C but more revenue
        assert got["A"][0] < got["C"][0] or got["A"][1] >= got["C"][1]


class TestBenford:
    def test_matches_python(self, spark):
        rows = _orders(spark)
        counts = defaultdict(int)
        for r in rows:
            if r.o_totalprice > 0:
                d = int(
                    r.o_totalprice
                    / 10 ** math.floor(math.log10(r.o_totalprice))
                )
                counts[d] += 1
        tot = sum(counts.values())
        got = {r.digit: r for r in P15.q_benford_first_digit(spark, SF).collect()}
        assert set(got) == set(counts)
        for d, n in counts.items():
            assert got[d].n == n
            assert math.isclose(got[d].obs_share, n / tot, abs_tol=1e-5)
            exp = math.log10(1 + 1 / d)
            assert math.isclose(got[d].benford_share, exp, abs_tol=1e-5)
            assert math.isclose(
                got[d].chi2_part,
                (n - exp * tot) ** 2 / (exp * tot),
                abs_tol=1e-3,
            )

    def test_shares_sum_to_one(self, spark):
        rows = P15.q_benford_first_digit(spark, SF).collect()
        assert math.isclose(sum(r.obs_share for r in rows), 1.0, abs_tol=1e-4)


class TestEwma:
    def test_matches_python(self, spark):
        rows = _orders(spark)
        daily = defaultdict(float)
        epoch = np.datetime64("1992-01-01").item()
        for r in rows:
            day = (r.o_orderdate.date() - epoch).days
            daily[day] = round(daily[day] + r.o_totalprice, 2)
        a = P15._EWMA_ALPHA
        got = {
            r.day: (r.rev, r.ewma_rev, r.n_days_in_window)
            for r in P15.q_ewma_daily_revenue(spark, SF).collect()
        }
        assert set(got) == set(daily)
        for t in daily:
            ks = [
                k
                for k in range(P15._EWMA_SPAN)
                if (t - k) in daily
            ]
            num = sum((1 - a) ** k * daily[t - k] for k in ks)
            den = sum((1 - a) ** k for k in ks)
            assert math.isclose(got[t][0], daily[t], abs_tol=0.02), t
            assert math.isclose(got[t][1], num / den, abs_tol=0.02), t
            assert got[t][2] == len(ks), t

    def test_smoothing_reduces_variance(self, spark):
        rows = P15.q_ewma_daily_revenue(spark, SF).collect()
        raw = [r.rev for r in rows]
        sm = [r.ewma_rev for r in rows]
        assert np.std(sm) < np.std(raw)


class TestCusum:
    def test_matches_python(self, spark):
        ev = _events(spark)
        daily = defaultdict(int)
        for r in ev:
            daily[r.ts.date()] += 1
        days = sorted(daily)
        mu = sum(daily.values()) / len(days)
        s, best = 0.0, None
        for d in days:
            s += daily[d] - mu
            if best is None or abs(s) > abs(best[1]) + 1e-12:
                best = (d, s)
        row = P15.q_cusum_changepoint(spark, SF).collect()[0]
        assert row.changepoint_day == best[0].strftime("%Y-%m-%d")
        assert math.isclose(row.cusum, best[1], abs_tol=1e-3)
        assert math.isclose(row.daily_mean, mu, abs_tol=1e-3)
        assert row.n_days == len(days)


class TestAcf:
    def test_matches_numpy(self, spark):
        ev = _events(spark)
        daily = defaultdict(int)
        for r in ev:
            daily[r.ts.date()] += 1
        days = sorted(daily)
        idx = {d: i for i, d in enumerate(days)}
        got = {r.lag: (r.acf, r.n_pairs) for r in P15.q_acf_daily_counts(spark, SF).collect()}
        for lag in range(1, P15._ACF_MAX_LAG + 1):
            pairs = [
                (daily[d], daily[days[idx[d] - lag]])
                for d in days
                if idx[d] >= lag
                and (d - days[idx[d] - lag]).days == lag
            ]
            if len(pairs) < 2:
                assert lag not in got
                continue
            x, y = zip(*pairs)
            want = float(np.corrcoef(x, y)[0, 1])
            assert got[lag][1] == len(pairs), lag
            assert math.isclose(got[lag][0], want, abs_tol=1e-5), lag

    def test_lag_grid_is_broadcast(self, spark):
        s = summarize(P15.q_acf_daily_counts(spark, SF))
        assert "CartesianProduct" not in s.joins
