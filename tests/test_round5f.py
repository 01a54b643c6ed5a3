"""Round-5 wave-9 semantics: interval union, weighted median, moving
correlation (datafusion_archive_spark/queries/pipeline11.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from datafusion_archive_spark.plans import summarize
from datafusion_archive_spark.queries import pipeline11 as P11
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


class TestIntervalUnion:
    def test_matches_python_sweep(self, spark):
        ivs = defaultdict(list)
        for r in load_events(spark, SF).collect():
            st = int(r.ts.timestamp() * 1_000_000)
            ivs[r.user_id].append((st, st + P11._INTERVAL_US, r.event_id))
        want = {}
        for uid, xs in ivs.items():
            xs.sort(key=lambda t: (t[0], t[2]))
            islands = []
            cur_lo, cur_hi = None, None
            for st, en, _ in xs:
                if cur_hi is None or st > cur_hi:
                    if cur_hi is not None:
                        islands.append(cur_hi - cur_lo)
                    cur_lo, cur_hi = st, en
                else:
                    cur_hi = max(cur_hi, en)
            islands.append(cur_hi - cur_lo)
            want[uid] = (len(islands), sum(islands))
        got = {
            r.user_id: (r.n_islands, r.covered_us)
            for r in P11.q_interval_union_time(spark, SF).collect()
        }
        assert got == want

    def test_never_exceeds_naive_sum(self, spark):
        """Union coverage ≤ n_events × interval length, with equality
        only if no intervals overlap."""
        n_by_user = defaultdict(int)
        for r in load_events(spark, SF).select("user_id").collect():
            n_by_user[r.user_id] += 1
        for r in P11.q_interval_union_time(spark, SF).collect():
            assert r.covered_us <= n_by_user[r.user_id] * P11._INTERVAL_US
            assert r.covered_us >= P11._INTERVAL_US


class TestWeightedMedian:
    def test_matches_python(self, spark):
        data = defaultdict(list)
        for r in (
            spark.read.parquet(f"{SF}/lineitem.parquet")
            .select("l_returnflag", "l_extendedprice", "l_quantity")
            .collect()
        ):
            data[r.l_returnflag].append((r.l_extendedprice, int(r.l_quantity)))
        got = {
            r.l_returnflag: r
            for r in P11.q_weighted_median(spark, SF).collect()
        }
        for flag, pts in data.items():
            by_val = defaultdict(int)
            for v, w in pts:
                by_val[v] += w
            total = sum(by_val.values())
            cum = 0
            med = None
            for v in sorted(by_val):
                cum += by_val[v]
                if cum * 2 >= total:
                    med = v
                    break
            r = got[flag]
            assert r.weighted_median_price == med
            assert r.total_weight == total

    def test_result_is_driver_literal(self, spark):
        """Round 8 moved the median onto the weighted histogram
        search (operators/quantiles): the heavy passes run inside the
        search as distributed aggregates and only ≤2 scalars per flag
        reach the driver, so the RESULT plan is a literal frame with
        no scan at all (the old pin asserted the retired sweep's
        one-scan shape)."""
        s = summarize(P11.q_weighted_median(spark, SF))
        assert s.n_scans == 0 and "ExistingRDD" in s.raw


class TestMovingCorr:
    def test_matches_python(self, spark):
        import statistics

        rows = sorted(
            P11.q_moving_corr(spark, SF).collect(), key=lambda r: r.day
        )
        by_year = defaultdict(list)
        for r in rows:
            by_year[r.day[:4]].append(r)
        # revenue per day recomputed from orders
        rev = defaultdict(float)
        cnt = defaultdict(int)
        for o in spark.read.parquet(f"{SF}/orders.parquet").collect():
            d = o.o_orderdate.date().isoformat()
            rev[d] += o.o_totalprice
            cnt[d] += 1
        for year, rs in by_year.items():
            xs = [float(cnt[r.day]) for r in rs]
            ys = [rev[r.day] for r in rs]
            for i, r in enumerate(rs):
                lo = max(0, i - 29)
                wx, wy = xs[lo : i + 1], ys[lo : i + 1]
                if len(wx) < 2 or len(set(wx)) == 1 or len(set(wy)) == 1:
                    assert r.corr_30d is None
                    continue
                want = statistics.correlation(wx, wy)
                assert math.isclose(r.corr_30d, want, abs_tol=1e-4), r.day
