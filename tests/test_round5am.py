"""Round-5 wave-44 semantics: DFT periodogram, runs test
(datafusion_archive_spark/queries/pipeline46.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline46 as P46

SF = "/root/testdata/sf0.001"


def _series(spark):
    daily = defaultdict(float)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        daily[r.o_orderdate] += float(r.o_totalprice)
    return [daily[d] for d in sorted(daily)]


class TestPeriodogram:
    def test_matches_python_dft(self, spark):
        ys = _series(spark)
        n = len(ys)
        mean = sum(ys) / n
        cy = [y - mean for y in ys]
        powers = {}
        for k in range(1, P46._MAX_K + 1):
            c = sum(
                y * math.cos(2 * math.pi * k * t / n)
                for t, y in enumerate(cy)
            )
            s = sum(
                y * math.sin(2 * math.pi * k * t / n)
                for t, y in enumerate(cy)
            )
            powers[k] = c * c + s * s
        want = sorted(
            powers, key=lambda k: (-round(powers[k] / 1e12, 1), k)
        )[: P46._TOP_K]
        got = P46.q_periodogram_dft(spark, SF).collect()
        assert [r.k for r in got] == want
        for r in got:
            assert r.power_e12 == pytest.approx(
                round(powers[r.k] / 1e12, 1), abs=0.2
            )
            assert r.period_days == pytest.approx(round(n / r.k, 2),
                                                 abs=0.01)

    def test_parseval_energy_bound(self, spark):
        # sum of ALL n periodogram ordinates = n * sum(y^2) (Parseval);
        # the k=1..K head must therefore stay below that total
        ys = _series(spark)
        n = len(ys)
        mean = sum(ys) / n
        total = n * sum((y - mean) ** 2 for y in ys)
        got = P46.q_periodogram_dft(spark, SF).collect()
        assert sum(r.power_e12 for r in got) * 1e12 < total


class TestRunsTest:
    def test_matches_python(self, spark):
        ys = _series(spark)
        srt = sorted(ys)
        n0 = len(srt)
        mid = n0 // 2
        med = (
            srt[mid]
            if n0 % 2
            else (srt[mid - 1] + srt[mid]) / 2.0
        )
        signs = [1 if y > med else 0 for y in ys if y != med]
        r_obs = 1 + sum(
            1 for a, b in zip(signs, signs[1:]) if a != b
        )
        n1 = sum(signs)
        n2 = len(signs) - n1
        n = n1 + n2
        mu = 2.0 * n1 * n2 / n + 1.0
        var = (mu - 1.0) * (mu - 2.0) / (n - 1.0)
        z = (r_obs - mu) / math.sqrt(var)
        r = P46.q_runs_test_random(spark, SF).collect()[0]
        assert (r.n_runs, r.n1, r.n2) == (r_obs, n1, n2)
        assert r.mu_runs == pytest.approx(round(mu, 4), abs=1e-4)
        assert r.z_runs == pytest.approx(round(z, 6), abs=1e-5)
