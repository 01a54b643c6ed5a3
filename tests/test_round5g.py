"""Round-5 wave-10 semantics: A/B z-test, contingency statistics,
two-sample KS (datafusion_archive_spark/queries/pipeline12.py)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from datafusion_archive_spark.queries import pipeline12 as P12
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


class TestABTest:
    def test_matches_python(self, spark):
        # rebuild assignment through the operator's own hash column
        # (portable md5 family), conversions in pure python
        from pyspark.sql import functions as F

        from datafusion_archive_spark.functions import text as TX

        users = sorted(
            {r.user_id for r in load_events(spark, SF).select("user_id").collect()}
        )
        hdf = spark.createDataFrame(
            [(u,) for u in users], ["user_id"]
        ).select(
            "user_id",
            (
                TX.hash64(F.col("user_id").cast("string"), P12._AB_SEED) % 2
            ).alias("h"),
        )
        variant = {r.user_id: "A" if r.h == 0 else "B" for r in hdf.collect()}
        conv = defaultdict(int)
        for r in load_events(spark, SF).collect():
            if (
                r.event_type == P12._AB_CONVERSION_EVENT
                and r.value > P12._AB_CONVERSION_MIN_VALUE
            ):
                conv[r.user_id] = 1
        n = Counter(variant.values())
        c = Counter(v for u, v in variant.items() if conv[u])
        row = P12.q_ab_test_ztest(spark, SF).collect()[0]
        assert (row.n_a, row.n_b) == (n["A"], n["B"])
        assert (row.conv_a, row.conv_b) == (c["A"], c["B"])
        p_a, p_b = c["A"] / n["A"], c["B"] / n["B"]
        pooled = (c["A"] + c["B"]) / (n["A"] + n["B"])
        se = math.sqrt(
            pooled * (1 - pooled) * (1 / n["A"] + 1 / n["B"])
        )
        z = (p_a - p_b) / se
        assert math.isclose(row.z, z, abs_tol=1e-5)
        assert row.significant_95 == (abs(z) > P12._AB_Z_CRIT)


class TestContingency:
    def test_matches_python(self, spark):
        cells = Counter()
        for r in (
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderstatus", "o_orderpriority")
            .collect()
        ):
            cells[(r.o_orderstatus, r.o_orderpriority)] += 1
        n = sum(cells.values())
        rows = Counter()
        cols = Counter()
        for (s, p), c in cells.items():
            rows[s] += c
            cols[p] += c
        chi2 = mi = 0.0
        for (s, p), c in cells.items():
            e = rows[s] * cols[p] / n
            chi2 += (c - e) ** 2 / e
            pxy = c / n
            mi += pxy * math.log(pxy / ((rows[s] / n) * (cols[p] / n)))
        got = P12.q_contingency_stats(spark, SF).collect()[0]
        assert got.n_rows == n
        assert got.dof == (len(rows) - 1) * (len(cols) - 1)
        assert math.isclose(got.chi2, chi2, abs_tol=1e-3)
        assert math.isclose(got.mutual_info_nats, mi, abs_tol=1e-5)
        v = math.sqrt(chi2 / (n * (min(len(rows), len(cols)) - 1)))
        assert math.isclose(got.cramers_v, v, abs_tol=1e-5)

    def test_independence_sanity(self, spark):
        """Synthetic status/priority are near-independent: V well
        below 0.3 and MI tiny but non-negative."""
        got = P12.q_contingency_stats(spark, SF).collect()[0]
        assert 0.0 <= got.cramers_v < 0.3
        assert got.mutual_info_nats >= 0.0


class TestKS:
    def test_matches_python(self, spark):
        a, b = [], []
        for r in (
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderstatus", "o_totalprice")
            .collect()
        ):
            if r.o_orderstatus == P12._KS_GROUP_A:
                a.append(r.o_totalprice)
            elif r.o_orderstatus == P12._KS_GROUP_B:
                b.append(r.o_totalprice)
        a.sort()
        b.sort()
        values = sorted(set(a) | set(b))
        import bisect

        d = 0.0
        for v in values:
            f1 = bisect.bisect_right(a, v) / len(a)
            f2 = bisect.bisect_right(b, v) / len(b)
            d = max(d, abs(f1 - f2))
        got = P12.q_ks_test_two_sample(spark, SF).collect()[0]
        assert (got.n1, got.n2) == (len(a), len(b))
        assert math.isclose(got.d_stat, d, abs_tol=1e-5)
        crit = 1.358 * math.sqrt(
            (len(a) + len(b)) / (len(a) * len(b))
        )
        assert math.isclose(got.d_crit_95, crit, abs_tol=1e-5)
        assert got.reject_same_dist == (d > crit)

    def test_same_sample_gives_zero(self, spark):
        """KS of a distribution against itself is identically 0 —
        pin the sweep arithmetic, not just the testdata value."""
        from pyspark.sql import functions as F

        o = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .filter(F.col("o_orderstatus") == P12._KS_GROUP_A)
            .select("o_totalprice")
        )
        from pyspark.sql import Window

        by_val = o.groupBy(F.col("o_totalprice").alias("v")).agg(
            F.count(F.lit(1)).alias("ca")
        )
        w = Window.orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        tot = by_val.agg(F.sum("ca").alias("n1"))
        d = (
            by_val.withColumn("_f", F.sum("ca").over(w))
            .join(F.broadcast(tot))
            .agg(
                F.max(
                    F.abs(
                        F.col("_f") / F.col("n1")
                        - F.col("_f") / F.col("n1")
                    )
                ).alias("d")
            )
            .collect()[0]
            .d
        )
        assert d == 0.0
