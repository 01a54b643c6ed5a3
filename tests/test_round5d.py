"""Round-5 wave-6 semantics: regression/bitwise aggregates, rolling
median windows, data-quality suite, sentence stats, pair rules,
gaps-and-islands, bloom-prefilter semi join
(datafusion_archive_spark/queries/pipeline8.py)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from functools import reduce

from pyspark.sql import functions as F

from datafusion_archive_spark.plans import summarize
from datafusion_archive_spark.queries import pipeline8 as P8

SF = "/root/testdata/sf0.001"


class TestRegressionAggs:
    def test_matches_closed_form(self, spark):
        rows = {r.l_returnflag: r for r in P8.q_regression_aggs(spark, SF).collect()}
        data = defaultdict(list)
        for r in (
            spark.read.parquet(f"{SF}/lineitem.parquet")
            .select("l_returnflag", "l_quantity", "l_extendedprice")
            .collect()
        ):
            data[r.l_returnflag].append((r.l_quantity, r.l_extendedprice))
        for flag, pts in data.items():
            n = len(pts)
            sx = sum(x for x, _ in pts)
            sy = sum(y for _, y in pts)
            sxx = sum(x * x for x, _ in pts)
            sxy = sum(x * y for x, y in pts)
            slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            intercept = sy / n - slope * sx / n
            got = rows[flag]
            assert got.n_pairs == n
            assert math.isclose(got.slope, slope, rel_tol=0, abs_tol=0.006)
            assert math.isclose(
                got.intercept, intercept, rel_tol=0, abs_tol=0.006
            )
            assert 0.0 <= got.r2 <= 1.0


class TestRollingMedian:
    def test_matches_trailing_median(self, spark):
        import pandas as pd

        got = P8.q_window_rolling_median(spark, SF).toPandas()
        got = got.sort_values("day").reset_index(drop=True)
        got["year"] = got["day"].str.slice(0, 4)
        for _, grp in got.groupby("year"):
            revs = list(grp["revenue"])
            for i, (_, row) in enumerate(grp.iterrows()):
                window = revs[max(0, i - 6) : i + 1]
                assert math.isclose(
                    row["med_7d"],
                    float(pd.Series(window).median()),
                    abs_tol=1e-3,
                ), row["day"]
                assert math.isclose(
                    row["avg_7d"], sum(window) / len(window), abs_tol=1e-3
                )

    def test_window_runs_on_daily_grid(self, spark):
        """The sort must be over the aggregated daily rows, not the
        fact scan: exactly one scan, and the plan aggregates before
        the Window (no second pass over orders)."""
        s = summarize(P8.q_window_rolling_median(spark, SF))
        assert len(s.read_schemas) == 1


class TestBitwiseAggs:
    def test_matches_python_fold(self, spark):
        got = {
            r.o_orderpriority: r
            for r in P8.q_bitwise_aggs(spark, SF).collect()
        }
        flags = defaultdict(list)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            f_ = (
                (1 if r.o_orderstatus == "F" else 0)
                + (2 if r.o_orderstatus == "O" else 0)
                + (4 if r.o_totalprice > 150000.0 else 0)
                + (8 if r.o_orderdate.month <= 6 else 0)
            )
            flags[r.o_orderpriority].append(f_)
        for prio, fs in flags.items():
            r = got[prio]
            assert r.bits_all == reduce(lambda a, b: a & b, fs)
            assert r.bits_any == reduce(lambda a, b: a | b, fs)
            assert r.bits_parity == reduce(lambda a, b: a ^ b, fs)
            assert r.n_orders == len(fs)


class TestDataQuality:
    def test_verdicts(self, spark):
        rows = {r.check: r for r in P8.q_data_quality_checks(spark, SF).collect()}
        assert set(rows) == {name for name, _ in P8._DQ_CHECKS}
        for r in rows.values():
            assert 0.0 <= r.metric <= 1.0
        # the synthetic tables satisfy the contract
        assert rows["uniqueness_orderkey"].metric == 1.0
        assert rows["uniqueness_orderkey"].passed
        assert rows["accepted_values_status"].passed

    def test_single_scan(self, spark):
        s = summarize(P8.q_data_quality_checks(spark, SF))
        assert len(s.read_schemas) == 1


class TestTextSentences:
    def test_matches_python_segmentation(self, spark):
        got = {r.lang: r for r in P8.q_text_sentences(spark, SF).collect()}
        agg = defaultdict(lambda: [0, 0, 0])  # n, total_words, max
        for r in (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("lang", "text")
            .collect()
        ):
            if r.text is None:
                continue
            for s in re.split(r"[.!?]+", r.text):
                s = s.strip(" ")
                if not s:
                    continue
                w = len(re.split(r"\s+", s))
                a = agg[r.lang]
                a[0] += 1
                a[1] += w
                a[2] = max(a[2], w)
        for lang, (n, tw, mx) in agg.items():
            r = got[lang]
            assert r.n_sentences == n
            assert r.total_words == tw
            assert r.max_words == mx
            assert math.isclose(r.avg_words, tw / n, abs_tol=1e-5)


class TestAssocRules:
    def test_matches_bruteforce(self, spark):
        items = set(
            (r.l_orderkey, r.l_partkey)
            for r in spark.read.parquet(f"{SF}/lineitem.parquet")
            .select("l_orderkey", "l_partkey")
            .collect()
        )
        item_n = Counter(p for _, p in items)
        baskets = defaultdict(set)
        for ok, p in items:
            if item_n[p] >= P8._PAIR_MIN_ITEM:
                baskets[ok].add(p)
        n_baskets = len({ok for ok, _ in items})
        pair_n = Counter()
        for ps in baskets.values():
            sp = sorted(ps)
            for i, a in enumerate(sp):
                for b in sp[i + 1 :]:
                    pair_n[(a, b)] += 1
        want = {
            (a, b): c
            for (a, b), c in pair_n.items()
            if c >= P8._PAIR_MIN_SUPPORT
        }
        got = P8.q_assoc_rules_pairs(spark, SF).collect()
        assert {(r.part_a, r.part_b): r.pair_n for r in got} == want
        for r in got:
            assert r.n_a == item_n[r.part_a]
            assert math.isclose(r.conf_a_b, r.pair_n / r.n_a, abs_tol=1e-5)
            assert math.isclose(
                r.lift,
                r.pair_n * n_baskets / (r.n_a * r.n_b),
                abs_tol=1e-5,
            )

    def test_no_cartesian(self, spark):
        """The only nested-loop join allowed is the 1-row
        basket-count broadcast; the pair self-join must hash."""
        s = summarize(P8.q_assoc_rules_pairs(spark, SF))
        assert "CartesianProduct" not in s.joins
        assert s.joins.count("BroadcastNestedLoopJoin") <= 1
        assert "BroadcastHashJoin" in s.joins or "SortMergeJoin" in s.joins


class TestGapsIslands:
    def test_matches_python_islands(self, spark):
        days = defaultdict(set)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            days[r.o_orderpriority].add(r.o_orderdate.date())
        got = {r.o_orderpriority: r for r in P8.q_gaps_islands(spark, SF).collect()}
        for prio, ds in days.items():
            sd = sorted(ds)
            streaks = [1]
            for a, b in zip(sd, sd[1:]):
                if (b - a).days == 1:
                    streaks[-1] += 1
                else:
                    streaks.append(1)
            r = got[prio]
            assert r.n_islands == len(streaks)
            assert r.longest_streak == max(streaks)
            assert r.active_days == len(sd)


class TestBloomPrefilter:
    def test_equals_plain_semi_join(self, spark):
        got = {
            r.l_returnflag: (r.n_items, float(r.revenue))
            for r in P8.q_bloom_prefilter_semi_join(spark, SF).collect()
        }
        l = spark.read.parquet(f"{SF}/lineitem.parquet")
        s = spark.read.parquet(f"{SF}/supplier.parquet")
        n = spark.read.parquet(f"{SF}/nation.parquet")
        keys = (
            s.join(n, s.s_nationkey == n.n_nationkey)
            .filter(F.col("n_name") == "NATION_9")
            .select("s_suppkey")
        )
        want = {
            r.l_returnflag: (r.n, round(r.rev, 2))
            for r in l.join(
                keys, l.l_suppkey == keys.s_suppkey, "left_semi"
            )
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_extendedprice").alias("rev"),
            )
            .collect()
        }
        assert set(got) == set(want)
        for k, (n_items, rev) in got.items():
            assert n_items == want[k][0]
            assert math.isclose(rev, want[k][1], abs_tol=0.02)

    def test_fact_side_never_shuffles_to_join(self, spark):
        """All three probe/verify joins must broadcast the small side;
        a SortMergeJoin here would shuffle the full fact table and
        defeat the prefilter."""
        s = summarize(P8.q_bloom_prefilter_semi_join(spark, SF))
        assert all("Broadcast" in j for j in s.joins), s.joins
        assert "SortMergeJoin" not in " ".join(s.joins)
