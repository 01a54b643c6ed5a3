"""Round-5 wave-4 semantics: semantic dedup, skyline, SCD2, time
decay, shard manifests, rolling anomalies
(datafusion_archive_spark/queries/pipeline6.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datafusion_archive_spark.operators import skyline
from datafusion_archive_spark.plans import summarize
from datafusion_archive_spark.queries import pipeline6 as P6

SF = "/root/testdata/sf0.001"


class TestSkyline:
    def _brute(self, pts):
        out = []
        for x, y in pts:
            dominated = any(
                (x2 <= x and y2 >= y) and (x2 < x or y2 > y)
                for x2, y2 in pts
            )
            if not dominated:
                out.append((x, y))
        return sorted(out)

    def test_matches_bruteforce(self, spark):
        got = sorted(
            (r.order_date, r.total_price)
            for r in P6.q_skyline_orders(spark, SF).collect()
        )
        pts = {
            (r.o_orderdate, r.o_totalprice)
            for r in spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderdate", "o_totalprice")
            .collect()
        }
        assert got == self._brute(list(pts))

    def test_bucketing_invariance(self, spark):
        """Correctness must not depend on phase-1 partitioning (the
        superset property) — 1 bucket and 64 buckets agree."""
        o = spark.read.parquet(f"{SF}/orders.parquet").select(
            F.col("o_orderdate").alias("x"), F.col("o_totalprice").alias("y")
        )
        a = sorted(map(tuple, skyline.skyline_2d(o, "x", "y", buckets=1).collect()))
        b = sorted(map(tuple, skyline.skyline_2d(o, "x", "y", buckets=64).collect()))
        assert a == b

    def test_no_cartesian(self, spark):
        s = summarize(P6.q_skyline_orders(spark, SF))
        assert "CartesianProduct" not in s.joins
        assert "BroadcastNestedLoopJoin" not in s.joins


class TestSemanticDedup:
    def test_exactly_planted_twins_removed(self, spark):
        rows = P6.q_semantic_dedup_clusters(spark, SF).collect()
        base = spark.read.parquet(f"{SF}/embeddings.parquet")
        n_base = base.count()
        n_planted = base.filter(F.col("vec_id") % 20 == 0).count()
        assert sum(r.n_members for r in rows) == n_base + n_planted
        # uniform-random base vectors never clear 0.9; every planted
        # twin has its lower-id original in the same cluster
        assert sum(r.n_removed for r in rows) == n_planted
        assert all(r.n_kept == r.n_members - r.n_removed for r in rows)

    def test_cluster_join_is_equi_not_cartesian(self, spark):
        s = summarize(P6.q_semantic_dedup_clusters(spark, SF))
        assert "CartesianProduct" not in s.joins


class TestScd2:
    def test_intervals_tile_each_user_history(self, spark):
        rows = P6.q_scd2_event_state(spark, SF).collect()
        by_user = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r)
        ev = (
            spark.read.parquet(f"{SF}/events.parquet")
            .groupBy("user_id")
            .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"),
                 F.count("*").alias("n"))
            .collect()
        )
        spans = {r.user_id: r for r in ev}
        for uid, ivs in by_user.items():
            ivs.sort(key=lambda r: r.valid_from)
            # runs collapse: adjacent intervals never share a state
            for a, b in zip(ivs, ivs[1:]):
                assert a.event_type != b.event_type
                assert a.valid_to == b.valid_from  # gap-free tiling
            assert sum(iv.is_current for iv in ivs) == 1
            assert ivs[-1].is_current and ivs[-1].valid_to is None
            assert ivs[0].valid_from == spans[uid].lo
            assert len(ivs) <= spans[uid].n

    def test_single_exchange(self, spark):
        s = summarize(P6.q_scd2_event_state(spark, SF))
        assert s.n_hash_exchanges == 1, (
            "lag, change filter, and lead must share the user_id "
            "partitioning:\n" + s.raw
        )


class TestTimeDecay:
    def test_matches_manual_recompute(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet").collect()
        mx = max(r.ts for r in ev)
        lam = math.log(2.0) / (7.0 * 86400.0)
        manual = {}
        for r in ev:
            w = math.exp(-lam * (mx - r.ts).total_seconds())
            n, dv, dc = manual.get(r.event_type, (0, 0.0, 0.0))
            manual[r.event_type] = (n + 1, dv + w * r.value, dc + w)
        got = P6.q_time_decay_agg(spark, SF).collect()
        assert len(got) == len(manual)
        for r in got:
            n, dv, dc = manual[r.event_type]
            assert r.n_events == n
            assert r.decayed_value == pytest.approx(dv, abs=1e-3)
            assert r.decayed_count == pytest.approx(dc, abs=1e-3)
            # decay strictly discounts: 0 < decayed_count < n
            assert 0 < r.decayed_count < n

    def test_anchor_is_broadcast_not_collected(self, spark):
        s = summarize(P6.q_time_decay_agg(spark, SF))
        assert "BroadcastNestedLoopJoin" in s.joins or "BroadcastHashJoin" in s.joins
        assert "SortMergeJoin" not in s.joins


class TestShardManifest:
    def test_partition_of_corpus_and_determinism(self, spark):
        rows = P6.q_shard_manifest(spark, SF).collect()
        d = spark.read.parquet(f"{SF}/documents.parquet")
        assert sum(r.n_docs for r in rows) == d.count()
        assert sum(r.total_chars for r in rows) == (
            d.agg(F.sum("n_chars")).collect()[0][0]
        )
        assert all(0 <= r.shard < 16 for r in rows)
        again = P6.q_shard_manifest(spark, SF).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    def test_map_only_plus_single_agg(self, spark):
        s = summarize(P6.q_shard_manifest(spark, SF))
        assert s.n_hash_exchanges == 1, s.raw
        assert not s.joins


class TestAnomalyZscore:
    def test_matches_manual_rolling_window(self, spark):
        ev = sorted(
            spark.read.parquet(f"{SF}/events.parquet").collect(),
            key=lambda r: (r.user_id, r.ts, r.event_id),
        )
        manual = {}
        hist = {}
        for r in ev:
            h = hist.setdefault(r.user_id, [])
            prior = h[-20:]
            el = an = 0
            if len(prior) >= 10:
                mean = sum(prior) / len(prior)
                var = sum((v - mean) ** 2 for v in prior) / (len(prior) - 1)
                sd = math.sqrt(var)
                if sd > 0:
                    el = 1
                    an = int(abs((r.value - mean) / sd) >= 2.5)
            e0, a0 = manual.get(r.event_type, (0, 0))
            manual[r.event_type] = (e0 + el, a0 + an)
            h.append(r.value)
        got = {
            r.event_type: (r.n_eligible, r.n_anomalies)
            for r in P6.q_events_anomaly_zscore(spark, SF).collect()
        }
        assert got == manual

    def test_one_window_exchange_plus_final_agg(self, spark):
        s = summarize(P6.q_events_anomaly_zscore(spark, SF))
        assert s.n_hash_exchanges <= 2, s.raw
        assert not s.joins


class TestWindowRange1h:
    def test_matches_manual_time_frame(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet").collect()
        by_user = {}
        for r in ev:
            by_user.setdefault(r.user_id, []).append(r)
        manual = {}
        for rows in by_user.values():
            rows.sort(key=lambda r: r.ts)
            for r in rows:
                inc = [
                    x.value for x in rows
                    if 0 <= (r.ts - x.ts).total_seconds() <= 3600
                ]
                manual[r.event_id] = (round(sum(inc), 4), len(inc))
        from datafusion_archive_spark.queries import windows2
        got = {
            r.event_id: (r.sum_1h, r.n_1h)
            for r in windows2.q_window_range_1h(spark, SF).collect()
        }
        assert set(got) == set(manual)
        for eid, (s, n) in got.items():
            assert n == manual[eid][1]
            assert s == pytest.approx(manual[eid][0], abs=1e-3)

    def test_single_exchange(self, spark):
        from datafusion_archive_spark.queries import windows2
        s = summarize(windows2.q_window_range_1h(spark, SF))
        assert s.n_hash_exchanges == 1, s.raw
        assert not s.joins


class TestBpeEncode:
    @staticmethod
    def _ref_encode(word, merges):
        syms = list(word) + ["</w>"]
        for _, left, right, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def test_matches_python_reference_on_corpus(self, spark):
        from datafusion_archive_spark.functions import text as TX
        from datafusion_archive_spark.operators import bpe

        d = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
        merges = bpe.bpe_merges(bpe.word_frequencies(d), n_merges=6)
        assert merges
        got = {
            r.doc_id: (list(r.tokens), r.n_tokens)
            for r in bpe.bpe_encode(d, merges).collect()
        }
        norm = {
            r.doc_id: r.norm
            for r in d.select(
                "doc_id", TX.normalize_text(F.col("text")).alias("norm")
            ).collect()
        }
        assert set(got) == set(norm)
        for doc_id, text in norm.items():
            want = []
            for w in text.split(" "):
                if w:
                    want.extend(self._ref_encode(w, merges))
            toks, n = got[doc_id]
            assert toks == want, doc_id
            assert n == len(want)

    def test_merges_shrink_token_count(self, spark):
        """Every merge application can only shorten the encoding —
        n_tokens under trained merges <= chars+words baseline."""
        from datafusion_archive_spark.operators import bpe

        d = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
        merges = bpe.bpe_merges(bpe.word_frequencies(d), n_merges=6)
        with_merges = (
            bpe.bpe_encode(d, merges)
            .agg(F.sum("n_tokens"))
            .collect()[0][0]
        )
        without = (
            bpe.bpe_encode(d, [])
            .agg(F.sum("n_tokens"))
            .collect()[0][0]
        )
        assert with_merges < without

    def test_encode_is_map_only(self, spark):
        from datafusion_archive_spark.operators import bpe

        d = spark.read.parquet(f"{SF}/documents.parquet")
        s = summarize(bpe.bpe_encode(d, [(0, "e", "</w>", 1)]))
        assert s.n_hash_exchanges == 0, s.raw
        assert not s.joins


class TestClassRebalance:
    def test_every_class_hits_minority_size(self, spark):
        from datafusion_archive_spark.queries import pipeline7 as P7
        rows = P7.q_class_rebalance(spark, SF).collect()
        target = min(r.n_before for r in rows)
        assert all(r.n_kept == target for r in rows)
        assert all(r.n_before >= r.n_kept for r in rows)
        again = P7.q_class_rebalance(spark, SF).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


class TestTemporalSplit:
    def test_last_k_membership(self, spark):
        from datafusion_archive_spark.queries import pipeline7 as P7
        rows = P7.q_temporal_split_last_k(spark, SF).collect()
        ev = spark.read.parquet(f"{SF}/events.parquet").collect()
        n_users = len({r.user_id for r in ev})
        test_events = sum(r.n_events for r in rows if r.split == "test")
        train_events = sum(r.n_events for r in rows if r.split == "train")
        assert test_events + train_events == len(ev)
        # every user contributes exactly min(2, their events) test rows
        per_user = {}
        for r in ev:
            per_user[r.user_id] = per_user.get(r.user_id, 0) + 1
        assert test_events == sum(min(2, n) for n in per_user.values())
        assert n_users >= max(
            r.n_users for r in rows
        )


class TestHoppingDistinct:
    def test_matches_manual_windows(self, spark):
        from datafusion_archive_spark.queries import pipeline7 as P7
        ev = spark.read.parquet(f"{SF}/events.parquet").collect()
        manual = {}
        for r in ev:
            sec = int(r.ts.timestamp())
            s2 = sec // 1800 * 1800
            for s in (s2 - 1800, s2):
                manual.setdefault(s, set()).add(r.user_id)
        got = {
            r.window_start: r.n_users
            for r in P7.q_events_hopping_distinct_users(spark, SF).collect()
        }
        import datetime
        want = {
            datetime.datetime.utcfromtimestamp(s).strftime(
                "%Y-%m-%d %H:%M:%S"
            ): len(users)
            for s, users in manual.items()
        }
        assert got == want


class TestShareShift:
    def test_shares_sum_to_one_and_delta_consistent(self, spark):
        from datafusion_archive_spark.queries import pipeline7 as P7
        rows = P7.q_sales_share_shift(spark, SF).collect()
        by_year = {}
        for r in rows:
            by_year.setdefault(r.year, []).append(r)
        for year, rs in by_year.items():
            assert sum(r.share for r in rs) == pytest.approx(1.0, abs=1e-4)
        by_nation = {}
        for r in rows:
            by_nation.setdefault(r.nation, []).append(r)
        for nation, rs in by_nation.items():
            rs.sort(key=lambda r: r.year)
            assert rs[0].share_delta is None
            for a, b in zip(rs, rs[1:]):
                assert b.share_delta == pytest.approx(
                    b.share - a.share, abs=2e-6
                )

    def test_dims_broadcast(self, spark):
        from datafusion_archive_spark.queries import pipeline7 as P7
        s = summarize(P7.q_sales_share_shift(spark, SF))
        assert "BroadcastHashJoin" in s.joins
        assert "SortMergeJoin" not in s.joins
