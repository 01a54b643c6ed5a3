"""Round-5 wave-8 semantics: RRF fusion, median/mode, sentence-level
dedup, grid spatial join, running distinct
(datafusion_archive_spark/queries/pipeline10.py)."""

from __future__ import annotations

import math
import re
from collections import defaultdict

from pyspark.sql import functions as F

from datafusion_archive_spark.plans import summarize
from datafusion_archive_spark.queries import pipeline10 as P10

SF = "/root/testdata/sf0.001"


class TestRRF:
    def test_fusion_arithmetic(self, spark):
        rows = P10.q_rrf_fusion(spark, SF).collect()
        assert rows
        k = P10._RRF_K
        both = single = 0
        for r in rows:
            want = (1.0 / (k + r.r_lex) if r.r_lex is not None else 0.0) + (
                1.0 / (k + r.r_sem) if r.r_sem is not None else 0.0
            )
            assert math.isclose(r.rrf, want, abs_tol=1e-5)
            if r.r_lex is not None and r.r_sem is not None:
                both += 1
            else:
                single += 1
        # the full-outer join keeps single-list docs
        assert single > 0

    def test_rank_depth_respected(self, spark):
        for r in P10.q_rrf_fusion(spark, SF).collect():
            for v in (r.r_lex, r.r_sem):
                assert v is None or 1 <= v <= P10._RRF_DEPTH


class TestMedianMode:
    def test_matches_python(self, spark):
        import statistics

        got = {r.l_returnflag: r for r in P10.q_median_mode_aggs(spark, SF).collect()}
        data = defaultdict(lambda: ([], [], []))
        for r in (
            spark.read.parquet(f"{SF}/lineitem.parquet")
            .select("l_returnflag", "l_quantity", "l_extendedprice", "l_linenumber")
            .collect()
        ):
            q, p, ln = data[r.l_returnflag]
            q.append(r.l_quantity)
            p.append(r.l_extendedprice)
            ln.append(r.l_linenumber)
        for flag, (q, p, ln) in data.items():
            r = got[flag]
            assert math.isclose(r.med_qty, statistics.median(q), abs_tol=1e-3)
            assert math.isclose(r.med_price, statistics.median(p), abs_tol=1e-3)
            assert r.mode_line == statistics.mode(ln)
            assert r.n == len(q)


class TestSentenceDedup:
    def test_planted_duplicates_found(self, spark):
        rows = P10.q_dedup_sentences_cross_doc(spark, SF).collect()
        assert rows
        for r in rows:
            assert r.n_docs >= 2
            assert r.n_occurrences >= r.n_docs
        # a planted copy means its original's sentences are shared;
        # first_doc is always the original (plant ids are offset)
        assert all(r.first_doc < P10._SENT_PLANT_OFFSET for r in rows)

    def test_matches_python(self, spark):
        docs = {
            r.doc_id: r.text
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text")
            .collect()
            if r.text is not None
        }
        planted = dict(docs)
        for did in list(docs):
            if did < P10._SENT_PLANT_IDS:
                planted[did + P10._SENT_PLANT_OFFSET] = docs[did]
        by_sent = defaultdict(set)
        occ = defaultdict(int)
        for did, text in planted.items():
            for s in re.split(r"[.!?]+", text):
                s = s.strip(" ")
                if len(s) >= P10._SENT_MIN_CHARS:
                    by_sent[s].add(did)
                    occ[s] += 1
        want_docs = sorted(
            len(ds) for ds in by_sent.values() if len(ds) >= 2
        )
        got = P10.q_dedup_sentences_cross_doc(spark, SF).collect()
        assert sorted(r.n_docs for r in got) == want_docs


class TestGeoGridJoin:
    def test_matches_bruteforce(self, spark):
        got = {
            (r.c_custkey, r.s_suppkey): r.dist
            for r in P10.q_geo_grid_join(spark, SF).collect()
        }
        custs = [
            r.c_custkey
            for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
        ]
        supps = [
            r.s_suppkey
            for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()
        ]

        # recompute coordinates through the same operator column on a
        # tiny frame (the hash is the portable md5 family)
        def coords(keys, prefix):
            df = spark.createDataFrame(
                [(k,) for k in keys], [f"{prefix}_key"]
            ).select(
                f"{prefix}_key",
                *P10._synth_point(F.col(f"{prefix}_key"), prefix),
            )
            return {
                r[0]: (r[1], r[2]) for r in df.collect()
            }

        cpts = coords(custs, "c")
        spts = coords(supps, "s")
        r2 = P10._GEO_RADIUS**2
        want = {}
        for ck, (clat, clon) in cpts.items():
            for sk, (slat, slon) in spts.items():
                d2 = (clat - slat) ** 2 + (clon - slon) ** 2
                if d2 < r2:
                    want[(ck, sk)] = round(math.sqrt(d2), 6)
        assert set(got) == set(want)
        for k, d in got.items():
            assert math.isclose(d, want[k], abs_tol=1e-6)

    def test_no_cartesian(self, spark):
        s = summarize(P10.q_geo_grid_join(spark, SF))
        assert "CartesianProduct" not in s.joins
        assert "BroadcastNestedLoopJoin" not in s.joins


class TestRunningDistinct:
    def test_matches_python(self, spark):
        from datafusion_archive_spark.queries.timeseries import load_events

        events = sorted(
            (
                (r.user_id, r.ts, r.event_id, r.event_type)
                for r in load_events(spark, SF).collect()
            ),
        )
        want = {}
        seen = defaultdict(set)
        for uid, ts, eid, etype in events:
            seen[uid].add(etype)
            want[eid] = len(seen[uid])
        got = {
            r.event_id: r.n_types_seen
            for r in P10.q_window_running_distinct(spark, SF).collect()
        }
        assert got == want
