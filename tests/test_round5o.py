"""Round-5 wave-19 semantics: forward as-of join, grouped
percentiles, ANOVA, train/test leakage
(datafusion_archive_spark/queries/pipeline21.py; operators/asof.py
forward variant)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from datafusion_archive_spark.queries import pipeline21 as P21
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


class TestAsofForward:
    def test_matches_python(self, spark):
        ev = load_events(spark, SF).collect()
        errors = defaultdict(dict)
        for r in ev:
            if r.event_type == "error":
                cur = errors[r.user_id].get(r.ts)
                errors[r.user_id][r.ts] = (
                    r.value if cur is None else max(cur, r.value)
                )
        got = {
            r.event_id: r.error_value
            for r in P21.q_events_asof_forward(spark, SF).collect()
        }
        purchases = [r for r in ev if r.event_type == "purchase"]
        assert set(got) == {r.event_id for r in purchases}
        n_null = n_set = 0
        for p in purchases:
            futures = [
                (ts, v)
                for ts, v in errors.get(p.user_id, {}).items()
                if ts >= p.ts
            ]
            if futures:
                want = min(futures)[1]
                assert got[p.event_id] == want, p.event_id
                n_set += 1
            else:
                assert got[p.event_id] is None, p.event_id
                n_null += 1
        # both outcomes must occur or the fixture is vacuous
        assert n_set > 0 and n_null > 0

    def test_forward_vs_backward_differ(self, spark):
        """The two directions must not be accidentally identical."""
        from datafusion_archive_spark.queries.timeseries import q_asof_join

        fwd = {
            r.event_id: r.error_value
            for r in P21.q_events_asof_forward(spark, SF).collect()
        }
        back = {
            r.event_id: r.click_value
            for r in q_asof_join(spark, SF).collect()
        }
        assert set(fwd) == set(back)
        assert fwd != back


class TestGroupedPercentiles:
    def test_matches_numpy(self, spark):
        monthly = defaultdict(list)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            monthly[r.o_orderdate.strftime("%Y-%m")].append(r.o_totalprice)
        got = {r.month: r for r in P21.q_percentiles_by_month(spark, SF).collect()}
        assert set(got) == set(monthly)
        for m, xs in monthly.items():
            assert got[m].n == len(xs)
            for col, p in (("p50", 50), ("p90", 90), ("p99", 99)):
                want = float(np.percentile(xs, p, method="linear"))
                assert math.isclose(
                    getattr(got[m], col), want, abs_tol=0.02
                ), (m, col)


class TestAnova:
    def test_matches_numpy(self, spark):
        daily = defaultdict(float)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            daily[r.o_orderdate.date()] = round(
                daily[r.o_orderdate.date()] + r.o_totalprice, 2
            )
        groups = defaultdict(list)
        for d, x in daily.items():
            groups[d.isoweekday()].append(x)
        xs = [x for g in groups.values() for x in g]
        gm = sum(xs) / len(xs)
        ssb = sum(len(g) * (np.mean(g) - gm) ** 2 for g in groups.values())
        ssw = sum(
            (x - np.mean(g)) ** 2 for g in groups.values() for x in g
        )
        sst = sum((x - gm) ** 2 for x in xs)
        k, n = len(groups), len(xs)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        row = P21.q_anova_weekday_revenue(spark, SF).collect()[0]
        assert row.k == k and row.n == n
        assert math.isclose(row.f_stat, f, rel_tol=1e-4)
        assert math.isclose(row.eta_sq, ssb / sst, rel_tol=1e-4)
        # uniform synthetic calendar: weekday should NOT matter much
        assert row.eta_sq < 0.2


class TestLeakage:
    def test_matches_python(self, spark):
        import hashlib

        import re

        docs = {
            r.doc_id: r.text
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text")
            .collect()
            if r.text is not None
        }
        salted = dict(docs)
        for did, text in docs.items():
            if did % 10 == 3:
                salted[did + 100000] = text
        norm = lambda t: re.sub(r"\s+", " ", t).strip().lower()
        fp = {
            did: hashlib.md5(norm(t).encode()).hexdigest()
            for did, t in salted.items()
        }
        is_train = lambda did: (
            int(hashlib.md5(f"{did}:0".encode()).hexdigest()[:15], 16)
            % P21._LEAK_BUCKETS
            < P21._LEAK_TRAIN_CUT
        )
        train_fps = defaultdict(list)
        for did in salted:
            if is_train(did):
                train_fps[fp[did]].append(did)
        want = {}
        for did in salted:
            if not is_train(did) and fp[did] in train_fps:
                ms = train_fps[fp[did]]
                want[did] = (len(ms), min(ms))
        got = {
            r.test_doc_id: (r.n_train_dups, r.min_train_doc)
            for r in P21.q_leakage_traintest_overlap(spark, SF).collect()
        }
        assert got == want
        assert got  # planted twins guarantee real positives

    def test_no_false_positives_on_unique_texts(self, spark):
        """Every reported pair really shares identical normalized
        text."""
        import re

        docs = {
            r.doc_id: r.text
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text")
            .collect()
            if r.text is not None
        }
        norm = lambda t: re.sub(r"\s+", " ", t).strip().lower()
        for r in P21.q_leakage_traintest_overlap(spark, SF).collect():
            t_test = docs[r.test_doc_id % 100000]
            t_train = docs[r.min_train_doc % 100000]
            assert norm(t_test) == norm(t_train)
