"""Round-5 wave-15 semantics: Jaro-Winkler linkage, bootstrap CI,
seasonality profile, Lorenz curve
(datafusion_archive_spark/queries/pipeline17.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from datafusion_archive_spark.plans import summarize
from datafusion_archive_spark.queries import pipeline17 as P17

SF = "/root/testdata/sf0.001"


class TestJaroWinklerKernel:
    def test_textbook_values(self):
        # classic published examples — also what DuckDB returns
        assert math.isclose(
            P17._jaro("martha", "marhta"), 0.9444444444, abs_tol=1e-9
        )
        assert math.isclose(
            P17._jaro_winkler("martha", "marhta"), 0.9611111111, abs_tol=1e-9
        )
        assert math.isclose(
            P17._jaro("dixon", "dicksonx"), 0.7666666667, abs_tol=1e-9
        )
        assert math.isclose(
            P17._jaro_winkler("dixon", "dicksonx"), 0.8133333333, abs_tol=1e-9
        )
        assert P17._jaro_winkler("abc", "abc") == 1.0
        assert P17._jaro_winkler("ab", "ba") == 0.0
        assert P17._jaro_winkler("", "abc") == 0.0

    def test_boost_only_above_threshold(self):
        # identical prefix but low jaro: no winkler boost below 0.7
        a, b = "abcdefgh", "abzzzzzz"
        j = P17._jaro(a, b)
        assert j <= 0.7
        assert P17._jaro_winkler(a, b) == j

    def test_matches_duckdb_native(self):
        """Cross-implementation differential on arbitrary pairs."""
        import duckdb

        pairs = [
            ("small ring", "small gizmo"),
            ("red widget", "red bolt"),
            ("hot gear", "blue gear"),
            ("large plate", "large gizmo"),
            ("old bolt", "cold bolt"),
            ("x", "y"),
            ("prefix match", "prefix mismatch"),
        ]
        for a, b in pairs:
            want = duckdb.sql(
                f"SELECT jaro_winkler_similarity('{a}', '{b}')"
            ).fetchone()[0]
            assert math.isclose(
                P17._jaro_winkler(a, b), want, abs_tol=1e-9
            ), (a, b)


class TestLinkage:
    def test_blocking_and_threshold(self, spark):
        rows = P17.q_jaro_winkler_linkage(spark, SF).collect()
        assert rows
        for r in rows:
            assert r.name1 < r.name2
            assert r.name1.split(" ")[-1] == r.block
            assert r.name2.split(" ")[-1] == r.block
            assert r.jw >= 0.7
            assert math.isclose(
                r.jw, round(P17._jaro_winkler(r.name1, r.name2), 6),
                abs_tol=1e-9,
            )

    def test_runs_on_dictionary_not_rows(self, spark):
        """The pair count is bounded by distinct names, not part rows."""
        parts = spark.read.parquet(f"{SF}/part.parquet")
        n_names = parts.select("p_name").distinct().count()
        n_pairs = P17.q_jaro_winkler_linkage(spark, SF).count()
        assert n_pairs <= n_names * (n_names - 1) // 2


class TestBootstrap:
    def test_matches_python(self, spark):
        import hashlib

        rows = spark.read.parquet(f"{SF}/orders.parquet").collect()
        daily = defaultdict(float)
        epoch = __import__("datetime").date(1992, 1, 1)
        for r in rows:
            day = (r.o_orderdate.date() - epoch).days
            daily[day] = round(daily[day] + r.o_totalprice, 2)
        revs = [daily[d] for d in sorted(daily)]
        n = len(revs)
        means = []
        for rep in range(P17._BOOT_REPS):
            total = 0.0
            for slot in range(n):
                h = int(
                    hashlib.md5(f"{rep}:{slot}:0".encode()).hexdigest()[:15],
                    16,
                )
                total += revs[h % n]
            means.append(total / n)
        import numpy as np

        got = P17.q_bootstrap_ci_mean(spark, SF).collect()[0]
        assert got.n_days == n and got.n_reps == P17._BOOT_REPS
        assert math.isclose(got.mean_rev, sum(revs) / n, abs_tol=0.02)
        assert math.isclose(
            got.ci_lo, np.percentile(means, 2.5), abs_tol=0.02
        )
        assert math.isclose(
            got.ci_hi, np.percentile(means, 97.5), abs_tol=0.02
        )
        assert got.ci_lo <= got.mean_rev <= got.ci_hi


class TestSeasonalProfile:
    def test_matches_python(self, spark):
        from datafusion_archive_spark.queries.timeseries import load_events

        cells = defaultdict(int)
        for r in load_events(spark, SF).collect():
            cells[(r.ts.isoweekday(), r.ts.hour)] += 1
        tot = sum(cells.values())
        got = {
            (r.isodow, r.hour): r
            for r in P17.q_seasonal_profile_dow(spark, SF).collect()
        }
        assert set(got) == set(cells)
        for k, n in cells.items():
            assert got[k].n == n
            assert math.isclose(
                got[k].intensity_ratio, n / (tot / 168.0), abs_tol=1e-5
            )


class TestLorenz:
    def test_curve_properties(self, spark):
        rows = sorted(
            P17.q_lorenz_curve_deciles(spark, SF).collect(),
            key=lambda r: r.decile,
        )
        # cumulative shares are monotone, end at 1, and the curve is
        # below the diagonal (spend concentrates in upper deciles)
        assert math.isclose(rows[-1].cum_customer_share, 1.0, abs_tol=1e-6)
        assert math.isclose(rows[-1].cum_spend_share, 1.0, abs_tol=1e-6)
        for prev, cur in zip(rows, rows[1:]):
            assert cur.cum_customer_share >= prev.cum_customer_share
            assert cur.cum_spend_share >= prev.cum_spend_share
        for r in rows[:-1]:
            assert r.cum_spend_share <= r.cum_customer_share + 1e-9

    def test_matches_python(self, spark):
        import numpy as np

        rows = spark.read.parquet(f"{SF}/orders.parquet").collect()
        spend = defaultdict(float)
        for r in rows:
            spend[r.o_custkey] = round(spend[r.o_custkey] + r.o_totalprice, 2)
        xs = list(spend.values())
        cuts = np.percentile(xs, [10 * i for i in range(1, 10)])
        per = defaultdict(lambda: [0, 0.0])
        for x in xs:
            d = sum(1 for b in cuts if x > b)
            per[d][0] += 1
            per[d][1] += x
        got = {r.decile: r for r in P17.q_lorenz_curve_deciles(spark, SF).collect()}
        assert set(got) == set(per)
        for d, (n, s) in per.items():
            assert got[d].n_customers == n
            assert math.isclose(got[d].spend, s, abs_tol=0.05)
