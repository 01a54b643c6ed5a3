"""Round-5 wave-33 semantics: BH-FDR tests, capture-recapture
(datafusion_archive_spark/queries/pipeline35.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from datafusion_archive_spark.queries import pipeline35 as P35
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


def _phi_sf(z):
    """Same A&S 7.1.26 polynomial the query uses, in plain Python."""
    x = abs(z) / math.sqrt(2.0)
    t = 1.0 / (1.0 + P35._AS_P * x)
    poly = sum(c * t ** (i + 1) for i, c in enumerate(P35._AS))
    erf = 1.0 - poly * math.exp(-x * x)
    return (1.0 - erf) / 2.0


class TestFdrBh:
    def test_matches_python(self, spark):
        cust = {
            r.c_custkey: r.c_nationkey
            for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
        }
        nation = {
            r.n_nationkey: r.n_name
            for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
        }
        agg = defaultdict(lambda: [0.0, 0.0])
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            a = agg[nation[cust[r.o_custkey]]]
            a[0] += 1
            a[1] += 1.0 if r.o_orderpriority == "1-URGENT" else 0.0
        nt = sum(v[0] for v in agg.values())
        yt = sum(v[1] for v in agg.values())
        m = len(agg)
        tests = {}
        for nm, (ni, yi) in agg.items():
            p1 = yi / ni
            p2 = (yt - yi) / (nt - ni)
            pp = yt / nt
            z = (p1 - p2) / math.sqrt(
                pp * (1 - pp) * (1 / ni + 1 / (nt - ni))
            )
            tests[nm] = (z, 2.0 * _phi_sf(z))
        order = sorted(tests, key=lambda nm: (tests[nm][1], nm))
        cut = 0
        for i, nm in enumerate(order, 1):
            if tests[nm][1] <= P35._FDR_Q * i / m:
                cut = i
        got = {r.nation: r for r in P35.q_fdr_bh_nation_tests(spark, SF).collect()}
        assert set(got) == set(tests)
        for i, nm in enumerate(order, 1):
            r = got[nm]
            assert math.isclose(r.z, tests[nm][0], abs_tol=1e-4), nm
            assert math.isclose(r.p_value, tests[nm][1], abs_tol=1e-4), nm
            assert r.bh_rank == i
            assert r.significant == (i <= cut), nm
        # p-values live in [0, 1] and the polynomial is sane
        assert all(0 <= r.p_value <= 1 for r in got.values())

    def test_bh_no_more_discoveries_than_uncorrected(self, spark):
        rows = P35.q_fdr_bh_nation_tests(spark, SF).collect()
        n_disc = sum(1 for r in rows if r.significant)
        n_raw = sum(1 for r in rows if r.p_value <= 0.05)
        assert n_disc <= max(n_raw, 1) + len(rows) * 0  # BH ≤ liberal raw count bound
        assert n_disc <= len(rows)


class TestCaptureRecapture:
    def test_matches_python(self, spark):
        users = defaultdict(lambda: [0, 0])
        for r in load_events(spark, SF).collect():
            if r.event_type == "click":
                users[r.user_id][0] = 1
            elif r.event_type == "purchase":
                users[r.user_id][1] = 1
            else:
                users[r.user_id]  # materialize the user regardless
        n1 = sum(v[0] for v in users.values())
        n2 = sum(v[1] for v in users.values())
        mm = sum(1 for v in users.values() if v[0] and v[1])
        row = P35.q_capture_recapture_users(spark, SF).collect()[0]
        assert row.true_users == len(users)
        assert row.n_capture1 == n1
        assert row.n_capture2 == n2
        assert row.n_overlap == mm
        assert math.isclose(row.lincoln_petersen, n1 * n2 / mm, abs_tol=0.01)
        assert math.isclose(
            row.chapman, (n1 + 1) * (n2 + 1) / (mm + 1) - 1, abs_tol=0.01
        )
        # high-activity synthetic users: the estimate must land near
        # the truth (captures ≈ independent near-complete samples)
        assert abs(row.lincoln_petersen - row.true_users) < 0.2 * row.true_users


class TestVariant:
    """Wave-34 addendum: Spark 4 VARIANT semantics
    (datafusion_archive_spark/queries/pipeline36.py)."""

    def test_matches_python(self, spark):
        import json

        from datafusion_archive_spark.queries import pipeline36 as P36

        agg = defaultdict(list)
        missing = defaultdict(int)
        for r in load_events(spark, SF).collect():
            try:
                k = json.loads(r.props)["k"] if r.props else None
            except (json.JSONDecodeError, KeyError, TypeError):
                k = None
            if k is None:
                missing[r.event_type] += 1
            else:
                agg[r.event_type].append(k)
        got = {r.event_type: r for r in P36.q_variant_extraction(spark, SF).collect()}
        assert set(got) == set(agg) | set(missing)
        for et, ks in agg.items():
            r = got[et]
            assert r.n_with_k == len(ks)
            assert r.n_missing == missing.get(et, 0)
            assert r.min_k == min(ks)
            assert r.max_k == max(ks)
            assert math.isclose(r.avg_k, sum(ks) / len(ks), abs_tol=1e-3)

    def test_variant_handles_malformed_payloads(self, spark):
        """try_parse_json + variant_get must NULL (not fail) on junk,
        missing keys, and NULL payloads."""
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("{not json",), ('{"other": 1}',), (None,), ('{"k": 7}',)],
            "props string",
        )
        out = df.select(
            F.variant_get(
                F.try_parse_json(F.col("props")), "$.k", "int"
            ).alias("k")
        ).collect()
        assert [r.k for r in out] == [None, None, None, 7]
