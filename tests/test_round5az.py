"""Round-5 wave-57 semantics: classical decomposition, Atkinson
(datafusion_archive_spark/queries/pipeline59.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline59 as P59

SF = "/root/testdata/sf0.001"


class TestClassicalDecomposition:
    def test_matches_python(self, spark):
        daily = defaultdict(float)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            d = r.o_orderdate
            daily[d.date() if hasattr(d, "date") else d] += float(
                r.o_totalprice
            )
        days = sorted(daily)
        ys = [daily[d] for d in days]
        n = len(days)
        rows = []
        for i in range(3, n - 3):
            trend = sum(ys[i - 3 : i + 4]) / 7.0
            # python weekday(): Mon=0..Sun=6; Spark dayofweek: Sun=1
            dow = (days[i].weekday() + 1) % 7 + 1
            rows.append((dow, ys[i], trend, ys[i] / trend))
        sraw = defaultdict(list)
        for dow, _, _, r_ in rows:
            sraw[dow].append(r_)
        s_raw = {dw: sum(v) / len(v) for dw, v in sraw.items()}
        mean_s = sum(s_raw.values()) / len(s_raw)
        s = {dw: v / mean_s for dw, v in s_raw.items()}
        got = {r.dow: r for r in
               P59.q_classical_decomposition(spark, SF).collect()}
        assert set(got) == set(s)
        # seasonal indices multiply to ~mean 1
        assert sum(r.seasonal_index for r in got.values()) == (
            pytest.approx(7.0, abs=1e-4)
        )
        for dw in s:
            r = got[dw]
            assert r.n_days == len(sraw[dw])
            assert r.seasonal_index == pytest.approx(
                round(s[dw], 6), abs=1e-5
            )
            resids = [
                y / (t * s[dw]) for d2, y, t, _ in rows if d2 == dw
            ]
            mu = sum(resids) / len(resids)
            sd = math.sqrt(
                sum((x - mu) ** 2 for x in resids) / (len(resids) - 1)
            )
            assert r.mean_resid == pytest.approx(round(mu, 6), abs=1e-5)
            assert r.sd_resid == pytest.approx(round(sd, 6), abs=1e-5)


class TestAtkinson:
    def test_matches_python_and_ordering(self, spark):
        spend = defaultdict(float)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            spend[r.o_custkey] += float(r.o_totalprice)
        ys = list(spend.values())
        n = len(ys)
        mean = sum(ys) / n
        geo = math.exp(sum(math.log(y) for y in ys) / n)
        a1 = 1 - geo / mean
        a05 = 1 - (sum(math.sqrt(y) for y in ys) / n) ** 2 / mean
        r = P59.q_atkinson_index(spark, SF).collect()[0]
        assert r.n_customers == n
        assert r.mean_spend == pytest.approx(round(mean, 2), abs=0.05)
        assert r.atkinson_eps1 == pytest.approx(round(a1, 6), abs=1e-5)
        assert r.atkinson_eps05 == pytest.approx(round(a05, 6), abs=1e-5)
        # more inequality aversion => larger index; both in [0, 1)
        assert 0.0 <= r.atkinson_eps05 <= r.atkinson_eps1 < 1.0
