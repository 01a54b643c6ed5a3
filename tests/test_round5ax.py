"""Round-5 wave-55 semantics: k-anonymity audit, point-in-polygon
(datafusion_archive_spark/queries/pipeline57.py)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline57 as P57

SF = "/root/testdata/sf0.001"


class TestKAnonymity:
    def test_matches_python(self, spark):
        cust = {
            r.c_custkey: r.c_nationkey
            for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
        }
        groups = defaultdict(lambda: [0, set()])
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            d = r.o_orderdate
            key = (
                cust[r.o_custkey],
                (d.year, d.month),
                r.o_orderpriority,
            )
            groups[key][0] += 1
            groups[key][1].add(r.o_orderstatus)
        sizes = [v[0] for v in groups.values()]
        small = sum(s for s in sizes if s < P57._K_THRESHOLD)
        r = P57.q_k_anonymity_audit(spark, SF).collect()[0]
        assert r.n_groups == len(groups)
        assert r.n_rows == sum(sizes)
        assert r.k_anonymity == min(sizes)
        assert r.pct_rows_below_k == pytest.approx(
            round(small / sum(sizes), 6), abs=1e-6
        )
        assert r.min_l_diversity == min(
            len(v[1]) for v in groups.values()
        )


def _pt(key, seed):
    h = hashlib.md5(f"{key}:{seed}".encode()).hexdigest()
    return int(h[:15], 16) / float(1 << 60) * 10.0


def _inside(lat, lon):
    poly = P57._POLY
    c = 0
    for (x1, y1), (x2, y2) in zip(poly, poly[1:] + poly[:1]):
        if (y1 > lat) != (y2 > lat) and lon < (x2 - x1) * (
            lat - y1
        ) / (y2 - y1) + x1:
            c += 1
    return c % 2 == 1


class TestPointInPolygon:
    def test_matches_python_raycast(self, spark):
        from datafusion_archive_spark.queries.pipeline10 import (
            _GEO_SEED_LAT,
            _GEO_SEED_LON,
        )

        per = defaultdict(lambda: [0, 0])
        for r in spark.read.parquet(f"{SF}/supplier.parquet").collect():
            lat = _pt(r.s_suppkey, _GEO_SEED_LAT)
            lon = _pt(r.s_suppkey, _GEO_SEED_LON)
            per[r.s_nationkey][0] += 1
            per[r.s_nationkey][1] += _inside(lat, lon)
        got = {r.nationkey: r for r in
               P57.q_point_in_polygon_tag(spark, SF).collect()}
        assert set(got) == set(per)
        for nk, (n, ins) in per.items():
            r = got[nk]
            assert (r.n_suppliers, r.n_inside) == (n, ins)
            assert r.inside_share == pytest.approx(
                round(ins / n, 6), abs=1e-6
            )

    def test_polygon_area_sanity(self, spark):
        # inside share across ALL suppliers should be near the
        # polygon's area fraction of the 10x10 space (shoelace)
        poly = P57._POLY
        area = 0.0
        for (x1, y1), (x2, y2) in zip(poly, poly[1:] + poly[:1]):
            area += x1 * y2 - x2 * y1
        frac = abs(area) / 2.0 / 100.0
        got = P57.q_point_in_polygon_tag(spark, SF).collect()
        n = sum(r.n_suppliers for r in got)
        ins = sum(r.n_inside for r in got)
        assert abs(ins / n - frac) < 0.25
