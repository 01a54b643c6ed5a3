"""Round-5 wave-54 semantics: IPS/SNIPS policy eval, GPD tail fit
(datafusion_archive_spark/queries/pipeline56.py)."""

from __future__ import annotations

import json
import math
from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline56 as P56
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


class TestIpsEval:
    def test_matches_python(self, spark):
        logged = []
        for r in load_events(spark, SF).collect():
            if r.event_type == "purchase":
                logged.append(
                    (json.loads(r.props)["k"] % P56._ARMS,
                     float(r.value))
                )
        arms = defaultdict(list)
        for a, r_ in logged:
            arms[a].append(r_)
        n = len(logged)
        best = min(
            arms, key=lambda a: (-sum(arms[a]) / len(arms[a]), a)
        )
        p_best = len(arms[best]) / n
        ips = sum(
            r_ / p_best for a, r_ in logged if a == best
        ) / n
        snips_num = sum(r_ / p_best for a, r_ in logged if a == best)
        snips_den = sum(1.0 / p_best for a, r_ in logged if a == best)
        r = P56.q_ips_policy_eval(spark, SF).collect()[0]
        assert r.n_events == n
        assert r.behavior_share == pytest.approx(
            round(p_best, 6), abs=1e-6
        )
        assert r.ips_value == pytest.approx(round(ips, 4), abs=1e-3)
        assert r.snips_value == pytest.approx(
            round(snips_num / snips_den, 4), abs=1e-3
        )
        # SNIPS of a deterministic policy equals the best arm's mean
        assert r.snips_value == pytest.approx(
            round(sum(arms[best]) / len(arms[best]), 4), abs=1e-3
        )

    def test_ips_unbiased_for_logged_policy(self, spark):
        # evaluating the LOGGED policy (hit always, p=1) returns the
        # logged value — here just check logged_value == avg reward
        logged = []
        for r in load_events(spark, SF).collect():
            if r.event_type == "purchase":
                logged.append(float(r.value))
        r = P56.q_ips_policy_eval(spark, SF).collect()[0]
        assert r.logged_value == pytest.approx(
            round(sum(logged) / len(logged), 4), abs=1e-3
        )


class TestGpdFit:
    def test_matches_python(self, spark):
        vals = [
            float(r.o_totalprice)
            for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
        ]
        xs = sorted(vals)
        h = (len(xs) - 1) * 0.99
        lo = int(math.floor(h))
        u = xs[lo] + (h - lo) * (xs[min(lo + 1, len(xs) - 1)] - xs[lo])
        exc = [v - u for v in vals if v > u]
        m = sum(exc) / len(exc)
        var = sum((e - m) ** 2 for e in exc) / (len(exc) - 1)
        xi = (1.0 - m * m / var) / 2.0
        beta = m * (1.0 - xi)
        lam = len(exc) / len(vals)
        ret = u + beta / xi * ((lam * P56._RET_N) ** xi - 1.0)
        r = P56.q_gpd_pot_fit(spark, SF).collect()[0]
        assert r.n_exceedances == len(exc)
        assert r.threshold_p99 == pytest.approx(round(u, 2), abs=0.05)
        assert r.xi_hat == pytest.approx(round(xi, 6), abs=1e-4)
        assert r.beta_hat == pytest.approx(round(beta, 4), abs=0.5)
        assert r.return_level == pytest.approx(round(ret, 2), rel=1e-4)
        # a bounded-ish price distribution should not look heavy-tailed
        assert r.xi_hat < 0.5
