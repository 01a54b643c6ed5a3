"""Round-5 wave-47 semantics: EB shrinkage, CUPED
(datafusion_archive_spark/queries/pipeline49.py)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline49 as P49

SF = "/root/testdata/sf0.001"


class TestEbShrinkage:
    def _python(self, spark):
        per = defaultdict(lambda: [0, 0])
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            per[r.o_custkey][0] += 1
            per[r.o_custkey][1] += r.o_orderpriority == "1-URGENT"
        rates = {c: y / n for c, (n, y) in per.items()}
        vals = list(rates.values())
        m = sum(vals) / len(vals)
        mu = m
        v = sum((x - mu) ** 2 for x in vals) / (len(vals) - 1)
        k = max(m * (1 - m) / v - 1.0, 1.0)
        shrunk = {
            c: (y + m * k) / (n + k) for c, (n, y) in per.items()
        }
        return per, rates, shrunk, m, k

    def test_matches_python(self, spark):
        per, rates, shrunk, m, k = self._python(spark)
        want = sorted(
            shrunk, key=lambda c: (-round(shrunk[c], 6), c)
        )[: P49._EB_TOP]
        got = P49.q_eb_shrinkage_rates(spark, SF).collect()
        assert [r.custkey for r in got] == want
        for r in got:
            assert r.raw_rate == pytest.approx(
                round(rates[r.custkey], 6), abs=1e-6
            )
            assert r.shrunk_rate == pytest.approx(
                round(shrunk[r.custkey], 6), abs=1e-6
            )

    def test_shrinkage_monotone_in_n(self, spark):
        # a perfect 1/1 rate must shrink more than a perfect 5/5 rate
        per, rates, shrunk, m, k = self._python(spark)
        for r_small in [c for c, (n, y) in per.items() if n == y == 1]:
            for r_big in [c for c, (n, y) in per.items()
                          if n == y and n >= 3]:
                assert shrunk[r_small] < shrunk[r_big]
                break
            break


class TestCuped:
    def test_matches_python(self, spark):
        from datafusion_archive_spark.queries.timeseries import (
            load_events,
        )

        per = defaultdict(lambda: [0.0, 0.0])
        for r in load_events(spark, SF).collect():
            if r.event_type != "purchase":
                continue
            side = 0 if str(r.ts)[:10] < P49._SPLIT else 1
            per[r.user_id][side] += float(r.value)
        pre = [v[0] for v in per.values()]
        post = [v[1] for v in per.values()]
        n = len(pre)
        mp, mq = sum(pre) / n, sum(post) / n
        cov = sum(
            (a - mp) * (b - mq) for a, b in zip(pre, post)
        ) / (n - 1)
        vp = sum((a - mp) ** 2 for a in pre) / (n - 1)
        vq = sum((b - mq) ** 2 for b in post) / (n - 1)
        theta = cov / vp
        rho2 = cov * cov / (vp * vq)
        r = P49.q_cuped_adjustment(spark, SF).collect()[0]
        assert r.n_users == n
        assert r.theta == pytest.approx(round(theta, 6), abs=1e-5)
        assert r.var_post == pytest.approx(round(vq, 2), abs=0.05)
        assert r.var_cuped == pytest.approx(
            round(vq * (1 - rho2), 2), abs=0.05
        )
        assert r.variance_reduction_pct == pytest.approx(
            round(100 * rho2, 4), abs=1e-3
        )
        # CUPED can only reduce variance
        assert r.var_cuped <= r.var_post
