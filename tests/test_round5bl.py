"""Round-5 wave-69 semantics: Page–Hinkley drift, Jarque–Bera
(datafusion_archive_spark/queries/pipeline71.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline71 as P71

SF = "/root/testdata/sf0.001"


def _rets(spark):
    daily = defaultdict(float)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        daily[r.o_orderdate] += float(r.o_totalprice)
    ys = [daily[d] for d in sorted(daily)]
    return [b / a - 1.0 for a, b in zip(ys, ys[1:])]


class TestPageHinkley:
    def test_matches_python_replay(self, spark):
        xs = _rets(spark)
        m = 0.0
        mn = float("inf")
        max_ph = -1.0
        over = 0
        alarm_idx = None
        s = 0.0
        for i, x in enumerate(xs, 1):
            s += x
            rmean = s / i
            m += x - rmean - P71._PH_DELTA
            mn = min(mn, m)
            ph = m - mn
            max_ph = max(max_ph, ph)
            if ph > P71._PH_LAMBDA:
                over += 1
                if alarm_idx is None:
                    alarm_idx = i
        r = P71.q_page_hinkley_drift(spark, SF).collect()[0]
        assert r.n_days == len(xs)
        assert r.max_ph == pytest.approx(round(max_ph, 6), abs=1e-5)
        assert r.n_days_over == over
        assert (r.first_alarm_day is None) == (alarm_idx is None)
        # PH is non-negative by construction
        assert r.max_ph >= 0.0


class TestJarqueBera:
    def test_matches_python(self, spark):
        xs = _rets(spark)
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum((x - mu) ** 2 for x in xs) / n
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        s = m3 / m2**1.5
        k = m4 / m2**2 - 3.0
        jb = n / 6.0 * (s * s + k * k / 4.0)
        r = P71.q_jarque_bera_normality(spark, SF).collect()[0]
        assert r.n_days == n
        assert r.skewness == pytest.approx(round(s, 6), abs=1e-5)
        assert r.excess_kurtosis == pytest.approx(round(k, 6), abs=1e-5)
        assert r.jb_stat == pytest.approx(round(jb, 4), abs=1e-3)
        assert r.p_chi2_2 == pytest.approx(
            round(math.exp(-jb / 2.0), 8), abs=1e-6
        )
        assert 0.0 <= r.p_chi2_2 <= 1.0
