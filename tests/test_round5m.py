"""Round-5 wave-16 semantics: Mann-Whitney U, survival curve, mutual
information, PSI drift, event trigrams, MoM growth
(datafusion_archive_spark/queries/pipeline18.py)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from datafusion_archive_spark.plans import summarize
from datafusion_archive_spark.queries import pipeline18 as P18
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


class TestMannWhitney:
    def test_matches_scipy_free_reference(self, spark):
        """Tie-aware U and z recomputed from first principles."""
        vals = defaultdict(list)
        for r in load_events(spark, SF).collect():
            if r.event_type in (P18._MW_A, P18._MW_B):
                vals[r.event_type].append(r.value)
        a, b = vals[P18._MW_A], vals[P18._MW_B]
        pooled = sorted(a + b)
        # average ranks with ties
        rank_of = {}
        i = 0
        while i < len(pooled):
            j = i
            while j < len(pooled) and pooled[j] == pooled[i]:
                j += 1
            avg = (i + 1 + j) / 2
            rank_of[pooled[i]] = avg
            i = j
        r1 = sum(rank_of[v] for v in a)
        n1, n2 = len(a), len(b)
        n = n1 + n2
        u1 = r1 - n1 * (n1 + 1) / 2
        ties = Counter(pooled)
        tie_sum = sum(t**3 - t for t in ties.values())
        sigma2 = n1 * n2 / 12 * ((n + 1) - tie_sum / (n * (n - 1)))
        z = (u1 - n1 * n2 / 2) / math.sqrt(sigma2)
        row = P18.q_mann_whitney_u(spark, SF).collect()[0]
        assert row.n1 == n1 and row.n2 == n2
        assert math.isclose(row.u1, u1, abs_tol=0.01)
        assert math.isclose(row.z, z, abs_tol=1e-5)

    def test_window_is_value_collapsed(self, spark):
        """The ordered window input is the distinct-value dictionary:
        the plan aggregates BEFORE the window."""
        s = summarize(P18.q_mann_whitney_u(spark, SF))
        raw = s.raw
        assert raw.index("HashAggregate") < raw.index("Window")


class TestSurvival:
    def test_matches_python(self, spark):
        per = {}
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            d = r.o_orderdate.date()
            if r.o_custkey in per:
                lo, hi = per[r.o_custkey]
                per[r.o_custkey] = (min(lo, d), max(hi, d))
            else:
                per[r.o_custkey] = (d, d)
        months = [(hi - lo).days / 30 for lo, hi in per.values()]
        got = {r.k: r for r in P18.q_survival_curve(spark, SF).collect()}
        ks = list(range(0, P18._SURV_MAX_MONTHS + 1, P18._SURV_STEP))
        assert set(got) == set(ks)
        for k in ks:
            n = sum(1 for m in months if m >= k)
            assert got[k].n_surviving == n, k
            assert math.isclose(got[k].survival, n / len(months), abs_tol=1e-5)

    def test_monotone_nonincreasing(self, spark):
        rows = sorted(
            P18.q_survival_curve(spark, SF).collect(), key=lambda r: r.k
        )
        assert rows[0].survival == 1.0  # everyone survives 0 months
        for a, b in zip(rows, rows[1:]):
            assert b.survival <= a.survival + 1e-12


class TestMutualInformation:
    def test_matches_python(self, spark):
        cells = Counter()
        for r in (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("lang", "source")
            .collect()
        ):
            cells[(r.lang, r.source)] += 1
        nt = sum(cells.values())
        pl = Counter()
        ps = Counter()
        for (l, s), n in cells.items():
            pl[l] += n
            ps[s] += n
        h = lambda c: -sum(n / nt * math.log(n / nt) for n in c.values())
        mi = sum(
            n / nt * math.log((n / nt) / ((pl[l] / nt) * (ps[s] / nt)))
            for (l, s), n in cells.items()
        )
        row = P18.q_mutual_information_lang_source(spark, SF).collect()[0]
        assert row.n_docs == nt
        assert math.isclose(row.h_lang, h(pl), abs_tol=1e-5)
        assert math.isclose(row.h_source, h(ps), abs_tol=1e-5)
        assert math.isclose(row.mi_nats, mi, abs_tol=1e-5)
        # information inequality: 0 <= MI <= min(H)
        assert -1e-9 <= row.mi_nats <= min(row.h_lang, row.h_source) + 1e-9


class TestPsi:
    def test_matches_python(self, spark):
        import datetime

        split = datetime.date(1998, 1, 1)
        ref, cur = [], []
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            (ref if r.o_orderdate.date() < split else cur).append(
                r.o_totalprice
            )
        cuts = np.percentile(ref, [10 * i for i in range(1, 10)])
        bin_of = lambda x: sum(1 for b in cuts if x > b)
        nr = Counter(bin_of(x) for x in ref)
        nc = Counter(bin_of(x) for x in cur)
        got = {r.bin: r for r in P18.q_psi_price_drift(spark, SF).collect()}
        tr, tc = len(ref), len(cur)
        assert set(got) == set(nr) | set(nc)
        psi_total = 0.0
        for b, r in got.items():
            assert r.n_ref == nr[b] and r.n_cur == nc[b]
            p, q = nr[b] / tr, nc[b] / tc
            assert math.isclose(r.psi_part, (p - q) * math.log(p / q), abs_tol=1e-5)
            psi_total += r.psi_part
        # deciles of a stationary synthetic distribution: tiny PSI
        assert psi_total < 0.2


class TestTrigrams:
    def test_matches_python(self, spark):
        seqs = defaultdict(list)
        for r in sorted(
            load_events(spark, SF).collect(),
            key=lambda r: (r.user_id, r.ts, r.event_id),
        ):
            seqs[r.user_id].append(r.event_type)
        want = Counter()
        for s in seqs.values():
            for i in range(len(s) - 2):
                want[(s[i], s[i + 1], s[i + 2])] += 1
        top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[
            : P18._TRIGRAM_TOPK
        ]
        got = [
            ((r["first"], r["second"], r["third"]), r.n)
            for r in P18.q_event_trigrams(spark, SF).collect()
        ]
        assert got == top


class TestMomGrowth:
    def test_matches_python(self, spark):
        monthly = defaultdict(float)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            monthly[r.o_orderdate.strftime("%Y-%m")] = round(
                monthly[r.o_orderdate.strftime("%Y-%m")] + r.o_totalprice, 2
            )
        months = sorted(monthly)
        got = {r.month: r for r in P18.q_percent_change_mom(spark, SF).collect()}
        assert set(got) == set(months)
        for i, m in enumerate(months):
            assert math.isclose(got[m].rev, monthly[m], abs_tol=0.02)
            if i == 0:
                assert got[m].mom_pct is None
            else:
                prev = monthly[months[i - 1]]
                assert math.isclose(
                    got[m].mom_pct,
                    (monthly[m] - prev) / prev * 100,
                    abs_tol=1e-3,
                )
            if i >= 12:
                yago = monthly[months[i - 12]]
                assert math.isclose(
                    got[m].yoy_pct,
                    (monthly[m] - yago) / yago * 100,
                    abs_tol=1e-3,
                )
            else:
                assert got[m].yoy_pct is None
