"""Round-5 wave-27 semantics: integrity audit, exponential fit, Hill
tail index (datafusion_archive_spark/queries/pipeline29.py)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from datafusion_archive_spark.queries import pipeline29 as P29
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


class TestIntegrityAudit:
    def test_healthy_corpus_all_zero(self, spark):
        rows = {r["check"]: r.n_violations for r in P29.q_referential_integrity_audit(spark, SF).collect()}
        assert set(rows) == {
            "fk_orders_customer",
            "fk_lineitem_orders",
            "fk_lineitem_part",
            "fk_lineitem_supplier",
            "fk_customer_nation",
            "pk_orders_unique",
            "pk_customer_unique",
            "pk_part_unique",
        }
        assert all(v == 0 for v in rows.values()), rows

    def test_detects_planted_violations(self, spark, tmp_path):
        """Corrupt copies must flip the right rows: an orphaned order
        and a duplicated customer key."""
        from pyspark.sql import functions as F

        base = str(tmp_path / "corrupt")
        for t in ("orders", "lineitem", "customer", "part", "supplier", "nation"):
            df = spark.read.parquet(f"{SF}/{t}.parquet")
            if t == "orders":
                bad = df.limit(1).withColumn(
                    "o_custkey", F.lit(99_999_999)
                )
                df = df.unionByName(bad)
            if t == "customer":
                df = df.unionByName(df.limit(1))  # duplicate PK
            df.write.mode("overwrite").parquet(f"{base}/{t}.parquet")
        rows = {r["check"]: r.n_violations for r in P29.q_referential_integrity_audit(spark, base).collect()}
        assert rows["fk_orders_customer"] == 1
        assert rows["pk_customer_unique"] == 2  # both copies count
        assert rows["fk_lineitem_part"] == 0


class TestExponentialFit:
    def test_matches_python(self, spark):
        ev = sorted(
            load_events(spark, SF).collect(),
            key=lambda r: (r.ts, r.event_id),
        )
        import datetime

        def us(ts):
            td = ts - datetime.datetime(1970, 1, 1)
            return (
                td.days * 86_400_000_000
                + td.seconds * 1_000_000
                + td.microseconds
            )

        gaps = []
        for a, b in zip(ev, ev[1:]):
            g = (us(b.ts) - us(a.ts)) / 1e6
            if g > 0:
                gaps.append(g)
        mu = sum(gaps) / len(gaps)
        xs = np.sort(gaps)
        n = len(xs)
        fitted = 1 - np.exp(-xs / mu)
        ecdf_hi = np.arange(1, n + 1) / n
        ecdf_lo = np.arange(0, n) / n
        d = max(
            np.abs(ecdf_hi - fitted).max(), np.abs(ecdf_lo - fitted).max()
        )
        row = P29.q_exponential_fit_gaps(spark, SF).collect()[0]
        assert row.n_gaps == n
        assert math.isclose(row.mean_gap_s, mu, rel_tol=1e-6)
        # lambda is rounded to 6 dp and tiny in absolute terms
        assert math.isclose(row.lambda_hat, 1 / mu, abs_tol=1e-6)
        assert math.isclose(row.ks_distance, d, abs_tol=1e-4)
        assert 0 < row.ks_distance < 1


class TestHill:
    def test_matches_python(self, spark):
        xs = sorted(
            (
                (r.o_totalprice, r.o_orderkey)
                for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
            ),
            key=lambda t: (-t[0], t[1]),
        )[: P29._HILL_K + 1]
        xk = xs[-1][0]
        tail = [x for x, _ in xs if x > xk]
        alpha = len(tail) / sum(math.log(x / xk) for x in tail)
        row = P29.q_hill_tail_index(spark, SF).collect()[0]
        assert row.k == len(tail)
        assert math.isclose(row.threshold, xk, abs_tol=0.01)
        assert math.isclose(row.hill_alpha, alpha, rel_tol=1e-5)
        # bounded-support synthetic prices: the "tail" is light,
        # i.e. far from the infinite-mean regime
        assert row.hill_alpha > 1
