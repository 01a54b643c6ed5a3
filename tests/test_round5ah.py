"""Round-5 wave-39 semantics: jackknife ratio SE, rise-drop pattern
(datafusion_archive_spark/queries/pipeline41.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline41 as P41

SF = "/root/testdata/sf0.001"


class TestJackknife:
    def test_matches_python(self, spark):
        blocks = defaultdict(lambda: [0.0, 0.0])
        for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
            b = blocks[r.l_shipdate]
            b[0] += float(r.l_extendedprice)
            b[1] += float(r.l_quantity)
        srev = sum(b[0] for b in blocks.values())
        sqty = sum(b[1] for b in blocks.values())
        n = len(blocks)
        loo = [(srev - b[0]) / (sqty - b[1]) for b in blocks.values()]
        mean = sum(loo) / n
        se = math.sqrt((n - 1) / n * sum((r - mean) ** 2 for r in loo))
        r = P41.q_jackknife_ratio_se(spark, SF).collect()[0]
        assert r.n_blocks == n
        assert r.ratio_full == pytest.approx(round(srev / sqty, 6), abs=1e-6)
        assert r.se_jack == pytest.approx(se, abs=1e-7)

    def test_se_shrinks_with_blocks(self, spark):
        # delete-one-day SE must be far below the ratio itself
        r = P41.q_jackknife_ratio_se(spark, SF).collect()[0]
        assert 0 < r.se_jack < 0.05 * r.ratio_full


class TestRiseDrop:
    def test_matches_python_scan(self, spark):
        daily = defaultdict(float)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            daily[r.o_orderdate] += float(r.o_totalprice)
        days = sorted(daily)
        revs = [daily[d] for d in days]
        want = []
        n = len(revs)
        run = 0
        for t in range(1, n):
            if revs[t] > revs[t - 1]:
                run += 1
            else:
                run = 0
            if (
                run >= P41._RISE_MIN
                and t + 1 < n
                and revs[t + 1] / revs[t] - 1.0 < -P41._DROP_PCT
            ):
                want.append(
                    (days[t - run], days[t], run, round(revs[t], 2))
                )
        got = P41.q_pattern_rise_drop(spark, SF).collect()
        # compare as date tuples (parquet may surface datetimes)
        def _d(x):
            return x.date() if hasattr(x, "date") else x

        got_t = [
            (_d(r.start_date), _d(r.peak_date), r.rise_steps,
             round(r.peak_rev, 2))
            for r in got
        ]
        want_t = [(_d(a), _d(b), c, v) for a, b, c, v in want]
        assert got_t == want_t
        for r in got:
            assert r.drop_pct < -100.0 * P41._DROP_PCT
