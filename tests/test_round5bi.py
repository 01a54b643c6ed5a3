"""Round-5 wave-66 semantics: Clark–Evans/Ripley, exponential
mixture EM (datafusion_archive_spark/queries/pipeline68.py)."""

from __future__ import annotations

import hashlib
import math

import pytest

from datafusion_archive_spark.queries import pipeline68 as P68
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


def _pt(key, seed):
    h = hashlib.md5(f"{key}:{seed}".encode()).hexdigest()
    return int(h[:15], 16) / float(1 << 60) * 10.0


class TestClarkEvans:
    def test_matches_python(self, spark):
        from datafusion_archive_spark.queries.pipeline10 import (
            _GEO_SEED_LAT,
            _GEO_SEED_LON,
        )

        pts = [
            (_pt(r.c_custkey, _GEO_SEED_LAT),
             _pt(r.c_custkey, _GEO_SEED_LON))
            for r in spark.read.parquet(
                f"{SF}/customer.parquet"
            ).collect()
        ]
        n = len(pts)
        # round 11d: radii are density-adaptive (base × sqrt(N_REF/n),
        # anchored at sf0.01) so the candidate join stays linear in
        # rows; the differential applies the same scaling
        scale = P68._radius_scale(n)
        radii = {r0: r0 * scale for r0 in P68._RADII}
        nnd = []
        kc = {r0: 0 for r0 in P68._RADII}
        for i, (xa, ya) in enumerate(pts):
            best = float("inf")
            for j, (xb, yb) in enumerate(pts):
                if i == j:
                    continue
                d = math.hypot(xa - xb, ya - yb)
                best = min(best, d)
                for r0 in P68._RADII:
                    kc[r0] += d < radii[r0]
            nnd.append(best)
        dbar = sum(nnd) / n
        lam = n / P68._AREA
        expected = 1.0 / (2.0 * math.sqrt(lam))
        se = 0.26136 / math.sqrt(n * lam)
        r_ = P68.q_spatial_clark_evans(spark, SF).collect()[0]
        assert r_.n_points == n
        assert r_.r_clark_evans == pytest.approx(
            round(dbar / expected, 6), abs=1e-5
        )
        assert r_.z_ce == pytest.approx(
            round((dbar - expected) / se, 6), abs=1e-4
        )
        for r0 in P68._RADII:
            rad = radii[r0]
            k_hat = P68._AREA * kc[r0] / (n * (n - 1))
            got = getattr(r_, f"k_ratio_{int(r0 * 100)}")
            assert got == pytest.approx(
                round(k_hat / (math.pi * rad * rad), 6), abs=1e-5
            )
        # hash points are uniform: CSR stats should be mild
        assert 0.7 < r_.r_clark_evans < 1.3


class TestEmMixture:
    def test_matches_python_em(self, spark):
        rows = sorted(
            load_events(spark, SF).collect(),
            key=lambda r: (r.ts, r.event_id),
        )
        us = [int(r.ts.timestamp() * 1_000_000) for r in rows]
        xs = [
            (b - a) / 1.0e6 for a, b in zip(us, us[1:])
        ]
        m = sum(xs) / len(xs)
        lam1, lam2, pi1 = 2.0 / m, 0.5 / m, 0.5
        for _ in range(P68._EM_ITERS):
            sr = srx = scx = 0.0
            for x in xs:
                f1 = pi1 * lam1 * math.exp(-lam1 * x)
                f2 = (1 - pi1) * lam2 * math.exp(-lam2 * x)
                r = f1 / (f1 + f2)
                sr += r
                srx += r * x
                scx += (1 - r) * x
            n = len(xs)
            pi1, lam1, lam2 = sr / n, sr / srx, (n - sr) / scx
        ll = sum(
            math.log(
                pi1 * lam1 * math.exp(-lam1 * x)
                + (1 - pi1) * lam2 * math.exp(-lam2 * x)
            )
            for x in xs
        ) / len(xs)
        r_ = P68.q_em_exponential_mixture(spark, SF).collect()[0]
        assert r_.n_gaps == len(xs)
        assert r_.pi_fast == pytest.approx(round(pi1, 6), abs=1e-4)
        assert r_.lambda_fast == pytest.approx(
            round(lam1, 6), rel=1e-3
        )
        assert r_.lambda_slow == pytest.approx(
            round(lam2, 6), rel=1e-3
        )
        assert r_.mean_loglik == pytest.approx(round(ll, 6), abs=1e-4)
        # components must stay ordered and the mixture non-degenerate
        assert r_.lambda_fast > r_.lambda_slow > 0
        assert 0.01 < r_.pi_fast < 0.99
