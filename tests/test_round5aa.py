"""Round-5 wave-31 semantics: growth accounting, revenue bridge
(datafusion_archive_spark/queries/pipeline33.py)."""

from __future__ import annotations

import datetime
import math
from collections import defaultdict

from datafusion_archive_spark.queries import pipeline33 as P33
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


def _day_of(ts):
    return ts.date()


class TestGrowthAccounting:
    def test_matches_python_and_identities(self, spark):
        weeks = defaultdict(set)
        for r in load_events(spark, SF).collect():
            weeks[_day_of(r.ts)].add(r.user_id)
        first = {}
        for w in sorted(weeks):
            for u in weeks[w]:
                first.setdefault(u, w)
        got = {r.day: r for r in P33.q_daily_growth_accounting(spark, SF).collect()}
        assert set(got) == {w.strftime("%Y-%m-%d") for w in weeks}
        for w in sorted(weeks):
            key = w.strftime("%Y-%m-%d")
            pw = w - datetime.timedelta(days=1)
            new = sum(1 for u in weeks[w] if first[u] == w)
            retained = (
                sum(1 for u in weeks[w] if u in weeks.get(pw, set()))
                if pw in weeks
                else 0
            )
            resurrected = len(weeks[w]) - new - retained
            churned = (
                len(weeks[pw]) - retained if pw in weeks else 0
            )
            r = got[key]
            assert r.n_new == new, key
            assert r.n_retained == retained, key
            assert r.n_resurrected == resurrected, key
            assert r.n_churned == churned, key
            # identity: active = new + retained + resurrected
            assert (
                r.n_new + r.n_retained + r.n_resurrected
                == len(weeks[w])
            )
        # the framework must see every class at least once
        assert any(r.n_resurrected > 0 for r in got.values())
        assert any(r.n_churned > 0 for r in got.values())


class TestRevenueBridge:
    def test_additivity_and_values(self, spark):
        cells = defaultdict(lambda: [0.0, 0.0])  # (part, m) -> [q, rev]
        for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
            m = (r.l_shipdate.year - 1992) * 12 + r.l_shipdate.month - 1
            c = cells[(r.l_partkey, m)]
            c[0] += r.l_quantity
            c[1] += r.l_extendedprice
        months = sorted({m for _, m in cells})
        got = {r.m: r for r in P33.q_revenue_bridge_mom(spark, SF).collect()}
        for m in months:
            if m == 0:
                continue
            parts_cur = {pk for pk, mm in cells if mm == m}
            parts_prv = {pk for pk, mm in cells if mm == m - 1}
            vol = price = cross = entry = exit_ = delta = 0.0
            for pk in parts_cur | parts_prv:
                q1, r1 = cells.get((pk, m), (None, None))
                q0, r0 = cells.get((pk, m - 1), (None, None))
                delta += (r1 or 0.0) - (r0 or 0.0)
                if q1 is not None and q0 is not None:
                    p1, p0 = r1 / q1, r0 / q0
                    vol += (q1 - q0) * p0
                    price += q0 * (p1 - p0)
                    cross += (q1 - q0) * (p1 - p0)
                elif q1 is not None:
                    entry += r1
                else:
                    exit_ += -r0
            r = got[m]
            assert math.isclose(r.volume_effect, vol, abs_tol=0.05), m
            assert math.isclose(r.price_effect, price, abs_tol=0.05), m
            assert math.isclose(r.cross_effect, cross, abs_tol=0.05), m
            assert math.isclose(r.entry_effect, entry, abs_tol=0.05), m
            assert math.isclose(r.exit_effect, exit_, abs_tol=0.05), m
            assert math.isclose(r.rev_delta, delta, abs_tol=0.05), m
            # the bridge is exactly additive
            assert math.isclose(
                r.volume_effect
                + r.price_effect
                + r.cross_effect
                + r.entry_effect
                + r.exit_effect,
                r.rev_delta,
                abs_tol=0.1,
            ), m
