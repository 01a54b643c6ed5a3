"""Round-5 wave-25 semantics: SPRT, decile migration, new vs
returning (datafusion_archive_spark/queries/pipeline27.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from datafusion_archive_spark.queries import pipeline27 as P27
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


class TestSprt:
    def test_matches_python(self, spark):
        """Per-arm (user_id parity) SPRT replayed imperatively — one
        independent sequential test per experiment arm."""
        ev = sorted(
            (
                r
                for r in load_events(spark, SF).collect()
                if r.event_type in ("click", "purchase")
            ),
            key=lambda r: (r.ts, r.event_id),
        )
        inc_s = math.log(P27._SPRT_P1 / P27._SPRT_P0)
        inc_f = math.log((1 - P27._SPRT_P1) / (1 - P27._SPRT_P0))
        want = {}
        for arm in ("A", "B"):
            trials = [
                r
                for r in ev
                if ("A" if r.user_id % 2 == 0 else "B") == arm
            ]
            llr, crossing, up_i, dn_i = 0.0, None, None, None
            for i, r in enumerate(trials, 1):
                llr += inc_s if r.event_type == "purchase" else inc_f
                if crossing is None and abs(llr) >= P27._SPRT_A:
                    crossing = i
                if up_i is None and llr >= P27._SPRT_A:
                    up_i = i
                if dn_i is None and llr <= -P27._SPRT_A:
                    dn_i = i
            want[arm] = (len(trials), llr, crossing, up_i, dn_i)

        rows = {r.arm: r for r in P27.q_sprt_ab_sequential(spark, SF).collect()}
        assert set(rows) == {"A", "B"}
        for arm, (n, llr, crossing, up_i, dn_i) in want.items():
            row = rows[arm]
            assert row.n_trials == n
            assert math.isclose(row.final_llr, llr, abs_tol=1e-4)
            assert row.crossing_i == crossing
            if crossing is None:
                assert row.decision == "continue"
                # coherence: 'continue' means the LLR never left the
                # corridor — including at the end
                assert abs(row.final_llr) < P27._SPRT_A
            else:
                big = 2**62
                assert row.decision == (
                    "accept_h1"
                    if (up_i or big) < (dn_i or big)
                    else "accept_h0"
                )


class TestDecileMigration:
    def test_matches_python(self, spark):
        import datetime

        split = datetime.date(1998, 1, 1)
        early = defaultdict(float)
        late = defaultdict(float)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            tgt = early if r.o_orderdate.date() < split else late
            tgt[r.o_custkey] = round(tgt[r.o_custkey] + r.o_totalprice, 2)

        def decile_of(spend):
            cuts = np.percentile(list(spend.values()), [10 * i for i in range(1, 10)])
            return {k: sum(1 for b in cuts if v > b) for k, v in spend.items()}

        de, dl = decile_of(early), decile_of(late)
        want = defaultdict(int)
        for c in set(de) | set(dl):
            want[(de.get(c), dl.get(c))] += 1
        got = {
            (r.d_early, r.d_late): r.n_customers
            for r in P27.q_decile_migration_matrix(spark, SF).collect()
        }
        assert got == dict(want)
        # one-period-only customers must appear (NULL cells)
        assert any(k[0] is None or k[1] is None for k in got)

    def test_marginals_match_period_populations(self, spark):
        rows = P27.q_decile_migration_matrix(spark, SF).collect()
        n_early = sum(r.n_customers for r in rows if r.d_early is not None)
        n_late = sum(r.n_customers for r in rows if r.d_late is not None)
        import datetime

        split = datetime.date(1998, 1, 1)
        e, l = set(), set()
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            (e if r.o_orderdate.date() < split else l).add(r.o_custkey)
        assert n_early == len(e)
        assert n_late == len(l)


class TestNewVsReturning:
    def test_matches_python(self, spark):
        rows = spark.read.parquet(f"{SF}/orders.parquet").collect()
        first = {}
        for r in rows:
            d = r.o_orderdate.date()
            first[r.o_custkey] = min(first.get(r.o_custkey, d), d)
        agg = defaultdict(lambda: [0, 0, 0.0, 0.0])
        for r in rows:
            m = r.o_orderdate.strftime("%Y-%m")
            new = r.o_orderdate.date() == first[r.o_custkey]
            a = agg[m]
            if new:
                a[0] += 1
                a[2] = round(a[2] + r.o_totalprice, 2)
            else:
                a[1] += 1
                a[3] = round(a[3] + r.o_totalprice, 2)
        got = {r.month: r for r in P27.q_monthly_new_vs_returning(spark, SF).collect()}
        assert set(got) == set(agg)
        for m, (nn, nr, rn, rr) in agg.items():
            assert got[m].n_new_orders == nn, m
            assert got[m].n_returning_orders == nr, m
            assert math.isclose(got[m].new_revenue, rn, abs_tol=0.02), m
            assert math.isclose(got[m].returning_revenue, rr, abs_tol=0.02), m
        # acquisition dominates the first month, decays after
        months = sorted(agg)
        assert got[months[0]].n_returning_orders == 0
