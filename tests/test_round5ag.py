"""Round-5 wave-38 semantics: Spearman rho, Kendall tau-b
(datafusion_archive_spark/queries/pipeline40.py)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline40 as P40

SF = "/root/testdata/sf0.001"


def _frac_ranks(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        avg = (i + 1 + j) / 2.0  # mean of positions i+1..j
        for k in range(i, j):
            ranks[order[k]] = avg
        i = j
    return ranks


def _pearson(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sxx = sum((x - mx) ** 2 for x in xs)
    syy = sum((y - my) ** 2 for y in ys)
    return sxy / math.sqrt(sxx * syy)


class TestSpearman:
    def test_matches_python(self, spark):
        agg = defaultdict(lambda: [0, 0.0])
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            a = agg[r.o_custkey]
            a[0] += 1
            a[1] += float(r.o_totalprice)
        xs = [v[0] for v in agg.values()]
        ys = [v[1] for v in agg.values()]
        rho = _pearson(_frac_ranks(xs), _frac_ranks(ys))
        r = P40.q_spearman_rank_corr(spark, SF).collect()[0]
        assert r.n_customers == len(agg)
        assert r.spearman_rho == pytest.approx(round(rho, 6), abs=2e-6)

    def test_tie_awareness(self, spark):
        # order counts are small ints -> heavy ties; fractional ranks
        # must average within tie groups (sum of ranks is invariant)
        xs = [1, 2, 2, 2, 5]
        assert _frac_ranks(xs) == [1.0, 3.0, 3.0, 3.0, 5.0]


class TestKendall:
    def test_matches_python(self, spark):
        cnt = Counter()
        tot = defaultdict(float)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            cnt[r.o_orderdate] += 1
            tot[r.o_orderdate] += float(r.o_totalprice)
        days = sorted(cnt)
        pts = [(float(cnt[d]), round(tot[d] / cnt[d], 2)) for d in days]
        P = Q = n1 = n2 = 0
        n = len(pts)
        for i in range(n):
            for j in range(i + 1, n):
                dx = pts[j][0] - pts[i][0]
                dy = pts[j][1] - pts[i][1]
                if dx == 0:
                    n1 += 1
                if dy == 0:
                    n2 += 1
                s = (dx > 0) - (dx < 0)
                t = (dy > 0) - (dy < 0)
                if s * t > 0:
                    P += 1
                elif s * t < 0:
                    Q += 1
        n0 = n * (n - 1) // 2
        tau = (P - Q) / math.sqrt((n0 - n1) * (n0 - n2))
        r = P40.q_kendall_tau_daily(spark, SF).collect()[0]
        assert (r.concordant, r.discordant) == (P, Q)
        assert r.tau_b == pytest.approx(round(tau, 6), abs=1e-6)
