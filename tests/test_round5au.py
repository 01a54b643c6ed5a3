"""Round-5 wave-52 semantics: Newton logistic training, SMD balance
(datafusion_archive_spark/queries/pipeline54.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline54 as P54
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


class TestLogisticNewton:
    def test_matches_python_newton(self, spark):
        obs = []
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            obs.append(
                (
                    1.0 if r.o_orderpriority == "1-URGENT" else 0.0,
                    math.log(float(r.o_totalprice)),
                )
            )
        mx = sum(x for _, x in obs) / len(obs)
        pts = [(y, x - mx) for y, x in obs]
        a = b = 0.0
        for _ in range(P54._NEWTON_ITERS):
            h00 = h01 = h11 = g0 = g1 = 0.0
            for y, x in pts:
                pr = 1.0 / (1.0 + math.exp(-(a + b * x)))
                w = pr * (1 - pr)
                h00 += w
                h01 += w * x
                h11 += w * x * x
                g0 += y - pr
                g1 += (y - pr) * x
            det = h00 * h11 - h01 * h01
            a += (h11 * g0 - h01 * g1) / det
            b += (h00 * g1 - h01 * g0) / det
        ll = -sum(
            y * math.log(1.0 / (1.0 + math.exp(-(a + b * x))))
            + (1 - y)
            * math.log(1.0 - 1.0 / (1.0 + math.exp(-(a + b * x))))
            for y, x in pts
        ) / len(pts)
        r = P54.q_logistic_newton(spark, SF).collect()[0]
        assert r.n == len(pts)
        assert r.intercept == pytest.approx(round(a, 6), abs=1e-5)
        assert r.slope == pytest.approx(round(b, 6), abs=1e-5)
        assert r.log_loss == pytest.approx(round(ll, 6), abs=1e-5)

    def test_beats_constant_model(self, spark):
        # the fitted model's log-loss must not exceed the best
        # constant predictor's entropy
        r = P54.q_logistic_newton(spark, SF).collect()[0]
        ys = [
            1.0 if row.o_orderpriority == "1-URGENT" else 0.0
            for row in spark.read.parquet(
                f"{SF}/orders.parquet"
            ).collect()
        ]
        p = sum(ys) / len(ys)
        h = -(p * math.log(p) + (1 - p) * math.log(1 - p))
        assert r.log_loss <= h + 1e-9


class TestSmdBalance:
    def test_matches_python(self, spark):
        rows = load_events(spark, SF).collect()
        first = {}
        for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
            first.setdefault(r.user_id, r.event_type)
        treated = {u for u, et in first.items() if et == "signup"}
        per = defaultdict(lambda: [0.0, 0.0, 0.0, 0.0])
        for r in rows:
            if str(r.ts)[:10] >= P54._SPLIT:
                continue
            u = per[r.user_id]
            if r.event_type == "view":
                u[0] += 1
            elif r.event_type == "click":
                u[1] += 1
            elif r.event_type == "error":
                u[2] += 1
            elif r.event_type == "purchase":
                u[3] += float(r.value)
        names = ["pre_views", "pre_clicks", "pre_errors",
                 "pre_purchase_value"]
        got = {r.covariate: r for r in
               P54.q_covariate_balance_smd(spark, SF).collect()}
        assert set(got) == set(names)
        for i, nm in enumerate(names):
            tvals = [v[i] for u, v in per.items() if u in treated]
            cvals = [v[i] for u, v in per.items() if u not in treated]
            mt = sum(tvals) / len(tvals)
            mc = sum(cvals) / len(cvals)
            st = sum((x - mt) ** 2 for x in tvals) / (len(tvals) - 1)
            sc = sum((x - mc) ** 2 for x in cvals) / (len(cvals) - 1)
            smd = (mt - mc) / math.sqrt((st + sc) / 2)
            r = got[nm]
            assert r.mean_treated == pytest.approx(round(mt, 4), abs=1e-3)
            assert r.mean_control == pytest.approx(round(mc, 4), abs=1e-3)
            assert r.smd == pytest.approx(round(smd, 6), abs=1e-5)
