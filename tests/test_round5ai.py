"""Round-5 wave-40 semantics: 3-set Venn decomposition,
Cochran–Armitage trend (datafusion_archive_spark/queries/pipeline42.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline42 as P42

SF = "/root/testdata/sf0.001"


def _flags(spark):
    per = defaultdict(lambda: [0, 0, 0])
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        f = per[r.o_custkey]
        if r.o_orderpriority == "1-URGENT":
            f[0] = 1
        if float(r.o_totalprice) > P42._BIG_ORDER:
            f[1] = 1
        d = r.o_orderdate
        if (d.year if hasattr(d, "year") else d) == 1997:
            f[2] = 1
    return per


class TestVenn:
    def test_matches_python_and_inclusion_exclusion(self, spark):
        per = _flags(spark)
        cells = defaultdict(int)
        for f in per.values():
            cells[tuple(f)] += 1
        got = {
            (r.in_urgent, r.in_big, r.in_1997): r.n_customers
            for r in P42.q_segment_overlap_venn(spark, SF).collect()
        }
        assert got == dict(cells)
        # inclusion-exclusion: |A∪B∪C| from cells equals customers
        # with any flag set
        union = sum(v for k, v in got.items() if any(k))
        n_a = sum(v for k, v in got.items() if k[0])
        n_b = sum(v for k, v in got.items() if k[1])
        n_c = sum(v for k, v in got.items() if k[2])
        n_ab = sum(v for k, v in got.items() if k[0] and k[1])
        n_ac = sum(v for k, v in got.items() if k[0] and k[2])
        n_bc = sum(v for k, v in got.items() if k[1] and k[2])
        n_abc = got.get((1, 1, 1), 0)
        assert union == n_a + n_b + n_c - n_ab - n_ac - n_bc + n_abc


class TestCochranArmitage:
    def test_matches_python(self, spark):
        per_year = defaultdict(lambda: [0, 0])
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            d = r.o_orderdate
            yr = d.year if hasattr(d, "year") else d
            per_year[yr][0] += 1
            if r.o_orderpriority == "1-URGENT":
                per_year[yr][1] += 1
        y0 = min(per_year)
        nt = sum(v[0] for v in per_year.values())
        yt = sum(v[1] for v in per_year.values())
        ns = sum(v[0] * (yr - y0) for yr, v in per_year.items())
        nss = sum(v[0] * (yr - y0) ** 2 for yr, v in per_year.items())
        ys = sum(v[1] * (yr - y0) for yr, v in per_year.items())
        p = yt / nt
        z = (ys - p * ns) / math.sqrt(p * (1 - p) * (nss - ns * ns / nt))
        r = P42.q_trend_test_ca(spark, SF).collect()[0]
        assert r.n_groups == len(per_year)
        assert r.p_overall == pytest.approx(round(p, 6), abs=1e-9)
        assert r.z_trend == pytest.approx(round(z, 6), abs=1e-6)
        assert 0.0 <= r.p_two_sided <= 1.0
