"""Round-5 wave-51 semantics: Wasserstein drift, newsvendor stocking
(datafusion_archive_spark/queries/pipeline53.py)."""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pytest

from datafusion_archive_spark.queries import pipeline53 as P53

SF = "/root/testdata/sf0.001"


def _r(x, nd):
    """round-half-up, matching Spark/DuckDB double rounding (Python's
    built-in round is banker's and disagrees at exact half-steps,
    e.g. 1/32 at 4dp)."""
    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


class TestWasserstein:
    def test_matches_python(self, spark):
        a, b = [], []
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            d = r.o_orderdate
            yr = d.year if hasattr(d, "year") else d
            if yr == 1997:
                a.append(float(r.o_totalprice))
            elif yr == 1998:
                b.append(float(r.o_totalprice))
        support = sorted(set(a) | set(b))
        n1, n2 = len(a), len(b)
        sa, sb = sorted(a), sorted(b)
        import bisect

        w1 = 0.0
        ks = 0.0
        for v, nxt in zip(support, support[1:] + [None]):
            f1 = bisect.bisect_right(sa, v) / n1
            f2 = bisect.bisect_right(sb, v) / n2
            ks = max(ks, abs(f1 - f2))
            if nxt is not None:
                w1 += abs(f1 - f2) * (nxt - v)
        r = P53.q_wasserstein_drift(spark, SF).collect()[0]
        assert (r.n_1997, r.n_1998) == (n1, n2)
        assert r.w1_dollars == pytest.approx(round(w1, 2), abs=0.05)
        assert r.ks_stat == pytest.approx(round(ks, 6), abs=1e-6)

    def test_w1_dominates_mean_shift(self, spark):
        # W1 >= |mean1 - mean2| for any two distributions
        a, b = [], []
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            d = r.o_orderdate
            yr = d.year if hasattr(d, "year") else d
            if yr == 1997:
                a.append(float(r.o_totalprice))
            elif yr == 1998:
                b.append(float(r.o_totalprice))
        shift = abs(sum(a) / len(a) - sum(b) / len(b))
        r = P53.q_wasserstein_drift(spark, SF).collect()[0]
        assert r.w1_dollars >= shift - 0.01


class TestNewsvendor:
    def test_matches_python(self, spark):
        cust = {
            r.c_custkey: r.c_nationkey
            for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
        }
        nation = {
            r.n_nationkey: r.n_name
            for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
        }
        dem = defaultdict(lambda: defaultdict(int))
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            dem[nation[cust[r.o_custkey]]][r.o_orderdate] += 1
        got = {r.nation: r for r in
               P53.q_newsvendor_stocking(spark, SF).collect()}
        assert set(got) == set(dem)
        for nm, byday in dem.items():
            ds = sorted(byday.values())
            n = len(ds)
            # smallest q with ecdf(q) >= CR (cume_dist semantics)
            qstar = next(
                d for i, d in enumerate(ds)
                if (i + 1 + sum(1 for x in ds[i + 1:] if x == d)) / n
                >= P53._CR
            )
            r = got[nm]
            assert r.q_star == qstar
            sl = sum(1 for d in ds if d <= qstar) / n
            assert r.service_level == pytest.approx(round(sl, 6),
                                                    abs=1e-6)
            assert r.service_level >= P53._CR
            lo = sum(max(qstar - d, 0) for d in ds) / n
            sh = sum(max(d - qstar, 0) for d in ds) / n
            assert r.avg_leftover == pytest.approx(_r(lo, 4), abs=1e-6)
            assert r.avg_shortage == pytest.approx(_r(sh, 4), abs=1e-6)
