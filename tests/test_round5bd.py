"""Round-5 wave-61 semantics: matrix-profile motifs and discords
(datafusion_archive_spark/queries/pipeline63.py)."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pytest

from datafusion_archive_spark.queries import pipeline63 as P63

SF = "/root/testdata/sf0.001"


def _profile(spark):
    daily = defaultdict(Decimal)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        d = r.o_orderdate
        # replicate the query's decimal(18,2) sum + half-up rounding
        daily[d.date() if hasattr(d, "date") else d] += Decimal(
            repr(float(r.o_totalprice))
        ).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    days = sorted(daily)
    ys = [
        float(daily[d].quantize(Decimal(1), rounding=ROUND_HALF_UP))
        for d in days
    ]
    w = P63._W
    subs = [
        (days[i], ys[i : i + w])
        for i in range(len(ys) - w + 1)
    ]
    pairs = []
    for i in range(len(subs)):
        for j in range(i + w, len(subs)):
            dist = math.sqrt(
                sum(
                    (a - b) ** 2
                    for a, b in zip(subs[i][1], subs[j][1])
                )
            )
            pairs.append((subs[i][0], subs[j][0], i, j, dist))
    return subs, pairs


class TestMatrixProfile:
    def test_motifs_match(self, spark):
        subs, pairs = self._cached(spark)
        want = sorted(
            ((round(d, 2), da, db) for da, db, _, _, d in pairs)
        )[: P63._TOP]
        got = P63.q_matrix_profile_motifs(spark, SF).collect()

        def _d(x):
            return x.date() if hasattr(x, "date") else x

        got_t = sorted(
            (r.dist, _d(r.week_a_start), _d(r.week_b_start))
            for r in got
        )
        assert [
            (round(d, 2), a, b) for d, a, b in got_t
        ] == [(d, a, b) for d, a, b in want]

    def test_discords_match(self, spark):
        subs, pairs = self._cached(spark)
        nn = defaultdict(lambda: float("inf"))
        for da, db, i, j, d in pairs:
            nn[da] = min(nn[da], d)
            nn[db] = min(nn[db], d)
        want = sorted(
            ((-round(v, 2), k) for k, v in nn.items())
        )[: P63._TOP]
        got = P63.q_matrix_profile_discords(spark, SF).collect()

        def _d(x):
            return x.date() if hasattr(x, "date") else x

        got_t = [(-r.nn_dist, _d(r.week_start)) for r in got]
        assert got_t == [(v, k) for v, k in want]

    _cache = None

    def _cached(self, spark):
        if TestMatrixProfile._cache is None:
            TestMatrixProfile._cache = _profile(spark)
        return TestMatrixProfile._cache
