"""Round-5 wave-21 semantics: cohort LTV, repeat purchases, HHI,
seasonal outliers, missing days
(datafusion_archive_spark/queries/pipeline23.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from datafusion_archive_spark.queries import pipeline23 as P23

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").collect()


class TestCohortLtv:
    def test_matches_python(self, spark):
        rows = _orders(spark)
        first = {}
        for r in rows:
            y = r.o_orderdate.year
            first[r.o_custkey] = min(first.get(r.o_custkey, y), y)
        sizes = defaultdict(int)
        for c in first.values():
            sizes[c] += 1
        rev = defaultdict(float)
        for r in rows:
            c = first[r.o_custkey]
            rev[(c, r.o_orderdate.year - c)] = round(
                rev[(c, r.o_orderdate.year - c)] + r.o_totalprice, 2
            )
        got = {
            (r.cohort, r.offset): r
            for r in P23.q_cohort_ltv_cumulative(spark, SF).collect()
        }
        assert set(got) == set(rev)
        for cohort in sizes:
            cum = 0.0
            for off in sorted(o for c, o in rev if c == cohort):
                cum += rev[(cohort, off)]
                g = got[(cohort, off)]
                assert g.n_customers == sizes[cohort]
                assert math.isclose(g.rev, rev[(cohort, off)], abs_tol=0.02)
                assert math.isclose(
                    g.cum_ltv_per_customer, cum / sizes[cohort], abs_tol=0.02
                )

    def test_ltv_monotone_within_cohort(self, spark):
        rows = P23.q_cohort_ltv_cumulative(spark, SF).collect()
        by_cohort = defaultdict(list)
        for r in rows:
            by_cohort[r.cohort].append((r.offset, r.cum_ltv_per_customer))
        for c, pts in by_cohort.items():
            pts.sort()
            for (o1, v1), (o2, v2) in zip(pts, pts[1:]):
                assert v2 >= v1 - 1e-9, c


class TestRepeatRate:
    def test_matches_python(self, spark):
        per = defaultdict(list)
        for r in _orders(spark):
            per[r.o_custkey].append((r.o_orderdate.date(), r.o_orderkey))
        n_rep = 0
        for ds in per.values():
            ds.sort()
            if len(ds) >= 2 and (ds[1][0] - ds[0][0]).days <= P23._REPEAT_DAYS:
                n_rep += 1
        row = P23.q_repeat_purchase_rate(spark, SF).collect()[0]
        assert row.n_customers == len(per)
        assert row.n_repeaters == n_rep
        assert math.isclose(row.repeat_rate, n_rep / len(per), abs_tol=1e-5)


class TestHhi:
    def test_matches_python(self, spark):
        cells = defaultdict(float)
        for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
            cells[(r.l_partkey, r.l_suppkey)] = round(
                cells[(r.l_partkey, r.l_suppkey)] + r.l_extendedprice, 2
            )
        parts = defaultdict(lambda: [0.0, 0])
        for (pk, _), v in cells.items():
            parts[pk][0] += v
            parts[pk][1] += 1
        hhi = {
            pk: sum(
                (v / parts[pk][0]) ** 2
                for (p2, _), v in cells.items()
                if p2 == pk
            )
            for pk in parts
            if parts[pk][1] >= 2
        }
        top = sorted(hhi.items(), key=lambda kv: (-kv[1], kv[0]))[
            : P23._HHI_TOPK
        ]
        got = [(r.l_partkey, r.hhi) for r in P23.q_supplier_share_hhi(spark, SF).collect()]
        assert [g[0] for g in got] == [t[0] for t in top]
        for (gp, gh), (tp, th) in zip(got, top):
            assert math.isclose(gh, th, abs_tol=1e-4), gp
            # HHI bounds for n>=2 suppliers: (1/n, 1]
            n = parts[gp][1]
            assert 1 / n - 1e-9 <= gh <= 1 + 1e-9


class TestSeasonalOutliers:
    def test_matches_python(self, spark):
        daily = defaultdict(float)
        for r in _orders(spark):
            d = r.o_orderdate.date()
            daily[d] = round(daily[d] + r.o_totalprice, 2)
        prof = defaultdict(list)
        for d, v in daily.items():
            prof[d.isoweekday()].append(v)
        want = {}
        for d, v in daily.items():
            xs = prof[d.isoweekday()]
            mu, sd = float(np.mean(xs)), float(np.std(xs, ddof=1))
            z = (v - mu) / sd
            if abs(z) > P23._SEAS_Z:
                want[d.strftime("%Y-%m-%d")] = z
        got = {
            r.day: r.z
            for r in P23.q_seasonal_adjusted_outliers(spark, SF).collect()
        }
        assert set(got) == set(want)
        for d in want:
            assert math.isclose(got[d], want[d], abs_tol=1e-3), d


class TestMissingDays:
    def test_matches_python(self, spark):
        days = {r.o_orderdate.date() for r in _orders(spark)}
        lo, hi = min(days), max(days)
        import datetime

        expected = defaultdict(int)
        missing = defaultdict(int)
        d = lo
        while d <= hi:
            expected[d.year] += 1
            if d not in days:
                missing[d.year] += 1
            d += datetime.timedelta(days=1)
        got = {r.year: r for r in P23.q_missing_days_report(spark, SF).collect()}
        assert set(got) == set(expected)
        for y in expected:
            assert got[y].n_expected == expected[y]
            assert got[y].n_missing == missing[y]
            assert math.isclose(
                got[y].missing_ratio, missing[y] / expected[y], abs_tol=1e-6
            )
