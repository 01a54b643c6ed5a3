"""Round-5 wave-17 semantics: AUC-ROC, gains/lift, calibration,
correlation matrix, Theil index
(datafusion_archive_spark/queries/pipeline19.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from datafusion_archive_spark.plans import summarize
from datafusion_archive_spark.queries import pipeline19 as P19

SF = "/root/testdata/sf0.001"


def _scored(spark):
    out = []
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        out.append(
            (r.o_totalprice, 1 if r.o_orderpriority == "1-URGENT" else 0)
        )
    return out


class TestAuc:
    def test_matches_pair_counting(self, spark):
        """AUC by brute-force concordant-pair counting (ties = 1/2):
        the definitional formula the rank identity must equal."""
        data = _scored(spark)
        pos = [s for s, y in data if y == 1]
        neg = [s for s, y in data if y == 0]
        wins = sum(
            1.0 if p > n else (0.5 if p == n else 0.0)
            for p in pos
            for n in neg
        )
        want = wins / (len(pos) * len(neg))
        row = P19.q_auc_roc(spark, SF).collect()[0]
        assert row.n_pos == len(pos) and row.n_neg == len(neg)
        assert math.isclose(row.auc, want, abs_tol=1e-5)
        # synthetic label independent of price: AUC near 1/2
        assert 0.4 < row.auc < 0.6

    def test_rank_window_is_value_collapsed(self, spark):
        s = summarize(P19.q_auc_roc(spark, SF))
        assert s.raw.index("HashAggregate") < s.raw.index("Window")


class TestGains:
    def test_matches_python(self, spark):
        data = _scored(spark)
        scores = [s for s, _ in data]
        cuts = np.percentile(scores, [10 * i for i in range(1, 10)])
        per = defaultdict(lambda: [0, 0])
        for s, y in data:
            d = sum(1 for b in cuts if s <= b)  # descending deciles
            per[d][0] += 1
            per[d][1] += y
        tn = sum(v[0] for v in per.values())
        tp = sum(v[1] for v in per.values())
        got = {r.decile: r for r in P19.q_cumulative_gains(spark, SF).collect()}
        assert set(got) == set(per)
        cn = cp = 0
        for d in sorted(per):
            cn += per[d][0]
            cp += per[d][1]
            assert got[d].n == per[d][0]
            assert got[d].n_pos == per[d][1]
            assert math.isclose(got[d].cum_pop_share, cn / tn, abs_tol=1e-5)
            assert math.isclose(got[d].cum_gain, cp / tp, abs_tol=1e-5)
            assert math.isclose(
                got[d].lift, (cp / tp) / (cn / tn), abs_tol=1e-4
            )
        # full-population row closes at gain 1, lift 1
        last = got[max(per)]
        assert math.isclose(last.cum_gain, 1.0, abs_tol=1e-9)
        assert math.isclose(last.lift, 1.0, abs_tol=1e-9)


class TestCalibration:
    def test_matches_python(self, spark):
        cust = {
            r.c_custkey: r.c_nationkey
            for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
        }
        labeled = []
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            labeled.append(
                (cust[r.o_custkey], 1.0 if r.o_orderpriority == "1-URGENT" else 0.0)
            )
        agg = defaultdict(lambda: [0, 0.0])
        for nk, y in labeled:
            agg[nk][0] += 1
            agg[nk][1] += y
        prior = sum(v[1] for v in agg.values()) / sum(v[0] for v in agg.values())
        enc = {
            nk: (ny + P19._CAL_SMOOTH * prior) / (n + P19._CAL_SMOOTH)
            for nk, (n, ny) in agg.items()
        }
        cells = defaultdict(lambda: [0, 0.0, 0.0])
        for nk, y in labeled:
            p = enc[nk]
            b = sum(1 for c in P19._CAL_BINS if p > c)
            cells[b][0] += 1
            cells[b][1] += p
            cells[b][2] += y
        got = {r.bin: r for r in P19.q_calibration_curve(spark, SF).collect()}
        assert set(got) == set(cells)
        for b, (n, sp, sy) in cells.items():
            assert got[b].n == n
            assert math.isclose(got[b].mean_predicted, sp / n, abs_tol=1e-5)
            assert math.isclose(got[b].observed_rate, sy / n, abs_tol=1e-5)


class TestCorrMatrix:
    def test_matches_numpy(self, spark):
        rows = (
            spark.read.parquet(f"{SF}/lineitem.parquet")
            .select(*P19._CORR_COLS)
            .collect()
        )
        mat = np.array([[getattr(r, c) for c in P19._CORR_COLS] for r in rows])
        got = {
            (r.col1, r.col2): r.corr
            for r in P19.q_corr_matrix(spark, SF).collect()
        }
        assert len(got) == 6
        for i, a in enumerate(P19._CORR_COLS):
            for j in range(i + 1, len(P19._CORR_COLS)):
                b = P19._CORR_COLS[j]
                want = float(np.corrcoef(mat[:, i], mat[:, j])[0, 1])
                assert math.isclose(got[(a, b)], want, abs_tol=1e-5), (a, b)

    def test_no_join_single_reduce(self, spark):
        """All 6 pairs fold in one aggregate: no joins, and the only
        exchange is the global-agg SinglePartition gather."""
        s = summarize(P19.q_corr_matrix(spark, SF))
        assert not s.joins
        assert s.n_hash_exchanges == 0


class TestTheil:
    def test_matches_python(self, spark):
        spend = defaultdict(float)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            spend[r.o_custkey] = round(spend[r.o_custkey] + r.o_totalprice, 2)
        xs = list(spend.values())
        mu = sum(xs) / len(xs)
        t = sum((x / mu) * math.log(x / mu) for x in xs) / len(xs)
        row = P19.q_theil_index(spark, SF).collect()[0]
        assert row.n_customers == len(xs)
        assert math.isclose(row.mean_spend, mu, abs_tol=0.02)
        assert math.isclose(row.theil_t, t, abs_tol=1e-5)
        assert 0 <= row.theil_t <= math.log(len(xs))

    def test_windowless(self, spark):
        s = summarize(P19.q_theil_index(spark, SF))
        assert "Window" not in s.raw
