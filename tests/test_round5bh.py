"""Round-5 wave-65 semantics: Cox PH Newton, log-rank test
(datafusion_archive_spark/queries/pipeline67.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline67 as P67
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


def _cohort(spark):
    rows = sorted(
        load_events(spark, SF).collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    per = {}
    t_end = max(int(r.ts.timestamp() * 1_000_000) for r in rows)
    for r in rows:
        us = int(r.ts.timestamp() * 1_000_000)
        u = per.setdefault(
            r.user_id,
            {"t0": us, "first": r.event_type, "buy": None},
        )
        if r.event_type == "purchase" and u["buy"] is None:
            u["buy"] = us
    out = []
    for u in per.values():
        dur = (u["buy"] if u["buy"] is not None else t_end) - u["t0"]
        out.append(
            (dur, 1 if u["buy"] is not None else 0,
             1 if u["first"] == "signup" else 0)
        )
    return out


def _cox(cohort, iters):
    beta = 0.0
    for _ in range(iters):
        per_t = defaultdict(lambda: [0.0, 0.0, 0, 0])
        for dur, e, x in cohort:
            r = per_t[dur]
            eb = math.exp(beta * x)
            r[0] += eb
            r[1] += x * eb
            r[2] += e
            r[3] += x * e
        s0 = s1 = 0.0
        u = info = 0.0
        for dur in sorted(per_t, reverse=True):
            se, sxe, d, dx = per_t[dur]
            s0 += se
            s1 += sxe
            if d > 0:
                u += dx - d * s1 / s0
                info += d * (s1 / s0 - (s1 / s0) ** 2)
        beta += u / info
    return beta


class TestCox:
    def test_matches_python(self, spark):
        cohort = _cohort(spark)
        beta = _cox(cohort, P67._ITERS)
        r = P67.q_cox_ph_newton(spark, SF).collect()[0]
        assert r.n_users == len(cohort)
        assert r.n_events == sum(e for _, e, _ in cohort)
        assert r.n_treated == sum(x for _, _, x in cohort)
        assert r.beta == pytest.approx(round(beta, 6), abs=1e-4)
        assert r.hazard_ratio == pytest.approx(
            round(math.exp(beta), 6), rel=1e-4
        )


class TestLogrank:
    def test_matches_python_and_direction(self, spark):
        cohort = _cohort(spark)
        per_t = defaultdict(lambda: [0, 0, 0, 0])
        for dur, e, x in cohort:
            r = per_t[dur]
            r[0] += 1
            r[1] += x
            r[2] += e
            r[3] += x * e
        nt = n1t = 0
        ome = var = 0.0
        n_times = 0
        for dur in sorted(per_t, reverse=True):
            at, at1, d, d1 = per_t[dur]
            nt += at
            n1t += at1
            if d > 0 and nt > 1:
                n_times += 1
                p1 = n1t / nt
                ome += d1 - d * p1
                var += d * p1 * (1 - p1) * (nt - d) / (nt - 1)
        z = ome / math.sqrt(var)
        r = P67.q_logrank_test(spark, SF).collect()[0]
        assert r.n_event_times == n_times
        assert r.o_minus_e == pytest.approx(round(ome, 4), abs=1e-3)
        assert r.z_logrank == pytest.approx(round(z, 6), abs=1e-5)
        # Cox beta and log-rank z must agree in sign
        cox = P67.q_cox_ph_newton(spark, SF).collect()[0]
        assert (cox.beta > 0) == (r.z_logrank > 0) or abs(z) < 0.5
