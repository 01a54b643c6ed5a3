"""Round-5 wave-53 semantics: CEM ATT, IPF raking
(datafusion_archive_spark/queries/pipeline55.py)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline55 as P55
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


class TestCem:
    def test_matches_python(self, spark):
        rows = load_events(spark, SF).collect()
        first = {}
        for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
            first.setdefault(r.user_id, r.event_type)
        treated = {u for u, et in first.items() if et == "signup"}
        per = defaultdict(lambda: [0, 0.0])
        for r in rows:
            pre = str(r.ts)[:10] < P55._SPLIT
            if r.event_type == "view" and pre:
                per[r.user_id][0] += 1
            elif r.event_type == "purchase" and not pre:
                per[r.user_id][1] += float(r.value)
            else:
                per[r.user_id]  # materialize every user
        cells = defaultdict(lambda: defaultdict(list))
        for u, (views, y) in per.items():
            s = min(views, P55._CEM_CAP)
            cells[s][1 if u in treated else 0].append(y)
        num = den = nt = nc = used = 0
        for s, arms in cells.items():
            if 1 not in arms or 0 not in arms:
                continue
            used += 1
            mt = sum(arms[1]) / len(arms[1])
            mc = sum(arms[0]) / len(arms[0])
            num += (mt - mc) * len(arms[1])
            den += len(arms[1])
            nt += len(arms[1])
            nc += len(arms[0])
        r = P55.q_cem_stratified_ate(spark, SF).collect()[0]
        assert r.n_strata_used == used
        assert (r.n_matched_treated, r.n_matched_control) == (nt, nc)
        assert r.att == pytest.approx(round(num / den, 4), abs=1e-3)


class TestRaking:
    def test_matches_python_ipf(self, spark):
        cust = {
            r.c_custkey: r.c_nationkey
            for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
        }
        w = defaultdict(float)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            w[(cust[r.o_custkey], r.o_orderpriority)] += 1.0
        nat_n = defaultdict(int)
        for nk in cust.values():
            nat_n[nk] += 1
        tot_c = sum(nat_n.values())
        total = sum(w.values())
        rows = sorted({i for i, _ in w})
        cols = sorted({j for _, j in w})
        for _ in range(P55._IPF_SWEEPS):
            for i in rows:
                s = sum(w[(i, j)] for j in cols if (i, j) in w)
                tgt = nat_n[i] / tot_c * total
                for j in cols:
                    if (i, j) in w:
                        w[(i, j)] *= tgt / s
            for j in cols:
                s = sum(w[(i, j)] for i in rows if (i, j) in w)
                for i in rows:
                    if (i, j) in w:
                        w[(i, j)] *= (total / 5.0) / s
        got = {r.priority: r for r in
               P55.q_raking_ipf(spark, SF).collect()}
        assert set(got) == set(cols)
        for j in cols:
            share = sum(w[(i, j)] for i in rows if (i, j) in w) / total
            r = got[j]
            assert r.target_share == 0.2
            assert r.achieved_share == pytest.approx(
                round(share, 6), abs=1e-6
            )
            # after the final column sweep every column hits target
            assert abs(r.achieved_share - 0.2) < 1e-6
        # IPF converges: worst row error small after 3 sweeps
        assert max(r.max_row_err for r in got.values()) < 0.05
