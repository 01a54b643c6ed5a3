"""Round-5 wave-64 semantics: Gaussian KDE grid, Anderson–Darling
(datafusion_archive_spark/queries/pipeline66.py)."""

from __future__ import annotations

import math

import pytest

from datafusion_archive_spark.queries import pipeline66 as P66

SF = "/root/testdata/sf0.001"


def _vals(spark):
    return [
        (float(r.o_totalprice),
         (r.o_orderdate.year if hasattr(r.o_orderdate, "year")
          else r.o_orderdate))
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    ]


class TestKde:
    def test_matches_python(self, spark):
        vs = [v for v, _ in _vals(spark)]
        n = len(vs)
        mu = sum(vs) / n
        sd = math.sqrt(sum((v - mu) ** 2 for v in vs) / (n - 1))
        lo, hi = min(vs), max(vs)
        h = 1.06 * sd * n ** -0.2
        dens = {}
        for g in range(P66._GRID_N):
            x = lo + (hi - lo) * g / (P66._GRID_N - 1)
            k = sum(
                math.exp(-0.5 * ((v - x) / h) ** 2) for v in vs
            )
            dens[g] = (x, k / (n * h * math.sqrt(2 * math.pi)) * 1e5)
        want = sorted(
            dens, key=lambda g: (-round(dens[g][1], 6), g)
        )[: P66._TOP]
        got = P66.q_kde_gaussian_grid(spark, SF).collect()
        assert [r.g for r in got] == want
        for r in got:
            x, d = dens[r.g]
            assert r.x == pytest.approx(round(x, 2), abs=0.02)
            assert r.density_e5 == pytest.approx(
                round(d, 6), abs=1e-4
            )

    def test_integrates_to_one(self, spark):
        vs = [v for v, _ in _vals(spark)]
        n = len(vs)
        mu = sum(vs) / n
        sd = math.sqrt(sum((v - mu) ** 2 for v in vs) / (n - 1))
        lo, hi = min(vs), max(vs)
        h = 1.06 * sd * n ** -0.2
        step = (hi - lo) / (P66._GRID_N - 1)
        total = 0.0
        for g in range(P66._GRID_N):
            x = lo + step * g
            k = sum(
                math.exp(-0.5 * ((v - x) / h) ** 2) for v in vs
            )
            total += k / (n * h * math.sqrt(2 * math.pi)) * step
        # Riemann sum of the KDE over the data range ~ 1
        assert 0.8 < total < 1.1


class TestAndersonDarling:
    def test_matches_python(self, spark):
        pooled = sorted(
            ((v, 1 if yr == 1997 else 0)
             for v, yr in _vals(spark)
             if yr in (1997, 1998)),
            key=lambda t: (t[0], 1 - t[1]),
        )
        # tie-break ORDER BY v, yr: yr=1997 sorts before 1998
        nn = len(pooled)
        n1 = sum(s for _, s in pooled)
        m = 0
        a2 = 0.0
        for i, (_, s) in enumerate(pooled, 1):
            m += s
            if i < nn:
                a2 += (m * nn - n1 * i) ** 2 / (i * (nn - i))
        a2 /= n1 * (nn - n1)
        r = P66.q_anderson_darling_2sample(spark, SF).collect()[0]
        assert (r.n_1997, r.n_1998) == (n1, nn - n1)
        assert r.a2_stat == pytest.approx(round(a2, 6), abs=1e-5)
        # same-population years: AD should not scream
        assert r.a2_stat < 10.0
