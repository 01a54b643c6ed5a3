"""Round-5 wave-24 semantics: array HOFs, weighted quartiles, 2-D
histogram (datafusion_archive_spark/queries/pipeline26.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from datafusion_archive_spark.plans import summarize
from datafusion_archive_spark.queries import pipeline26 as P26

SF = "/root/testdata/sf0.001"


class TestArrayHof:
    def test_matches_numpy(self, spark):
        vecs = {
            r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
        }
        got = {r.vec_id: r for r in P26.q_array_hof_ops(spark, SF).collect()}
        assert set(got) == set(vecs)
        for vid, v in vecs.items():
            r = got[vid]
            assert r.n_pos == int((v > 0).sum())
            assert r.in_unit_range == bool(((v >= -1) & (v <= 1)).all())
            assert math.isclose(
                r.top3_sum, float(np.sort(v)[-3:].sum()), abs_tol=1e-4
            )
            assert math.isclose(
                r.dot_reversed, float((v * v[::-1]).sum()), abs_tol=1e-4
            )

    def test_map_only(self, spark):
        s = summarize(P26.q_array_hof_ops(spark, SF))
        assert s.n_hash_exchanges == 0
        assert not s.joins
        assert "Window" not in s.raw


class TestWeightedQuartiles:
    def test_matches_python(self, spark):
        cells = defaultdict(lambda: defaultdict(int))
        for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
            cells[r.l_returnflag][r.l_extendedprice] += int(r.l_quantity)
        got = {r.l_returnflag: r for r in P26.q_weighted_quartiles(spark, SF).collect()}
        assert set(got) == set(cells)
        for flag, wts in cells.items():
            total = sum(wts.values())
            cum = 0
            q = {}
            for price in sorted(wts):
                cum += wts[price]
                for num, name in ((1, "p25"), (2, "p50"), (3, "p75")):
                    if name not in q and cum * 4 >= total * num:
                        q[name] = price
            r = got[flag]
            assert r.total_weight == total
            for name in ("p25", "p50", "p75"):
                assert getattr(r, name) == q[name], (flag, name)
            assert r.p25 <= r.p50 <= r.p75

    def test_p50_equals_weighted_median_query(self, spark):
        from datafusion_archive_spark.queries.pipeline11 import (
            q_weighted_median,
        )

        med = {
            r.l_returnflag: r.weighted_median_price
            for r in q_weighted_median(spark, SF).collect()
        }
        quart = {
            r.l_returnflag: r.p50
            for r in P26.q_weighted_quartiles(spark, SF).collect()
        }
        assert med == quart


class TestHistogram2d:
    def test_matches_python(self, spark):
        width = (P26._H2_PRICE_HI - P26._H2_PRICE_LO) / P26._H2_PRICE_BINS
        want = defaultdict(int)
        for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
            b = int((r.l_extendedprice - P26._H2_PRICE_LO) // width)
            b = min(max(b, 0), P26._H2_PRICE_BINS - 1)
            want[(int(r.l_quantity), b)] += 1
        got = {
            (r.quantity, r.price_band): r.n
            for r in P26.q_histogram_2d(spark, SF).collect()
        }
        assert got == dict(want)
        assert sum(got.values()) == sum(want.values())
