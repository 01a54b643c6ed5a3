"""Round-5 wave-67 semantics: VaR/ES, Sortino/omega
(datafusion_archive_spark/queries/pipeline69.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline69 as P69

SF = "/root/testdata/sf0.001"


def _returns(spark):
    daily = defaultdict(float)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        daily[r.o_orderdate] += float(r.o_totalprice)
    ys = [daily[d] for d in sorted(daily)]
    return [b / a - 1.0 for a, b in zip(ys, ys[1:])]


def _q(xs, p):
    xs = sorted(xs)
    h = (len(xs) - 1) * p
    lo = int(math.floor(h))
    hi = min(lo + 1, len(xs) - 1)
    return xs[lo] + (h - lo) * (xs[hi] - xs[lo])


class TestVarEs:
    def test_matches_python(self, spark):
        rets = _returns(spark)
        losses = [-r for r in rets]
        v95, v99 = _q(losses, 0.95), _q(losses, 0.99)
        es95 = sum(x for x in losses if x >= v95) / sum(
            1 for x in losses if x >= v95
        )
        es99 = sum(x for x in losses if x >= v99) / sum(
            1 for x in losses if x >= v99
        )
        r = P69.q_var_expected_shortfall(spark, SF).collect()[0]
        assert r.n_days == len(rets)
        assert r.var_95 == pytest.approx(round(v95, 6), abs=1e-5)
        assert r.es_95 == pytest.approx(round(es95, 6), abs=1e-5)
        assert r.var_99 == pytest.approx(round(v99, 6), abs=1e-5)
        assert r.es_99 == pytest.approx(round(es99, 6), abs=1e-5)
        # coherence ordering: ES >= VaR at each level; 99 >= 95
        assert r.es_95 >= r.var_95 and r.es_99 >= r.var_99
        assert r.var_99 >= r.var_95


class TestSortino:
    def test_matches_python(self, spark):
        rets = _returns(spark)
        n = len(rets)
        mean = sum(rets) / n
        dd = math.sqrt(sum(min(r, 0.0) ** 2 for r in rets) / n)
        gains = sum(r for r in rets if r > 0)
        losses = -sum(r for r in rets if r < 0)
        r = P69.q_sortino_downside_risk(spark, SF).collect()[0]
        assert r.n_days == n
        assert r.n_gain_days == sum(1 for x in rets if x > 0)
        assert r.n_loss_days == sum(1 for x in rets if x < 0)
        assert r.mean_return == pytest.approx(round(mean, 6), abs=1e-6)
        assert r.downside_dev == pytest.approx(round(dd, 6), abs=1e-6)
        assert r.sortino == pytest.approx(round(mean / dd, 6), abs=1e-4)
        assert r.omega == pytest.approx(
            round(gains / losses, 6), abs=1e-4
        )
        # omega > 1 iff mean > 0 (target-0 identity)
        assert (r.omega > 1) == (r.mean_return > 0)
