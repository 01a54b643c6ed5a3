"""Round-5 wave-48 semantics: quantile treatment effects, grouped OLS
elasticity (datafusion_archive_spark/queries/pipeline50.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline50 as P50
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


def _quantile(xs, q):
    xs = sorted(xs)
    h = (len(xs) - 1) * q
    lo = int(math.floor(h))
    hi = min(lo + 1, len(xs) - 1)
    return xs[lo] + (h - lo) * (xs[hi] - xs[lo])


class TestQte:
    def test_matches_python(self, spark):
        rows = load_events(spark, SF).collect()
        first = {}
        for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
            first.setdefault(r.user_id, r.event_type)
        treated = {u for u, et in first.items() if et == "signup"}
        arms = defaultdict(list)
        for r in rows:
            if r.event_type == "purchase":
                arms[1 if r.user_id in treated else 0].append(
                    float(r.value)
                )
        got = P50.q_quantile_treatment_effects(spark, SF).collect()
        assert len(got) == 9
        for r in got:
            q = r.quantile
            tq = _quantile(arms[1], q)
            cq = _quantile(arms[0], q)
            assert r.treated_q == pytest.approx(round(tq, 4), abs=1e-3)
            assert r.control_q == pytest.approx(round(cq, 4), abs=1e-3)
            assert r.qte == pytest.approx(round(tq - cq, 4), abs=2e-3)
        # deciles are monotone within each arm
        ts = [r.treated_q for r in got]
        cs = [r.control_q for r in got]
        assert ts == sorted(ts) and cs == sorted(cs)


class TestGroupedOls:
    def test_matches_python(self, spark):
        brand = {
            r.p_partkey: r.p_brand
            for r in spark.read.parquet(f"{SF}/part.parquet").collect()
        }
        obs = defaultdict(list)
        for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
            lx = math.log(float(r.l_extendedprice) / float(r.l_quantity))
            ly = math.log(float(r.l_quantity))
            obs[brand[r.l_partkey]].append((lx, ly))
        got = {r.p_brand: r for r in
               P50.q_grouped_ols_elasticity(spark, SF).collect()}
        assert set(got) == set(obs)
        for b, pts in obs.items():
            n = len(pts)
            mx = sum(x for x, _ in pts) / n
            my = sum(y for _, y in pts) / n
            cov = sum((x - mx) * (y - my) for x, y in pts) / (n - 1)
            vx = sum((x - mx) ** 2 for x, _ in pts) / (n - 1)
            vy = sum((y - my) ** 2 for _, y in pts) / (n - 1)
            r = got[b]
            assert r.n == n
            assert r.elasticity == pytest.approx(
                round(cov / vx, 6), abs=1e-5
            )
            assert r.r2 == pytest.approx(
                round(cov * cov / (vx * vy), 6), abs=1e-5
            )
            assert 0.0 <= r.r2 <= 1.0
