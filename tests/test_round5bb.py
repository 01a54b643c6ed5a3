"""Round-5 wave-59 semantics: Huber IRLS, lang-ID confusion
(datafusion_archive_spark/queries/pipeline61.py)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline61 as P61

SF = "/root/testdata/sf0.001"


class TestHuberIrls:
    def test_matches_python_irls(self, spark):
        daily = defaultdict(float)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            daily[r.o_orderdate] += float(r.o_totalprice)
        ys = [daily[d] for d in sorted(daily)]
        n = len(ys)
        ts = list(range(n))
        mt, my = sum(ts) / n, sum(ys) / n
        vt = sum((t - mt) ** 2 for t in ts) / (n - 1)
        cv = sum(
            (t - mt) * (y - my) for t, y in zip(ts, ys)
        ) / (n - 1)
        b = cv / vt
        a = my - b * mt
        ols_b = b
        resid = sorted(abs(y - (a + b * t)) for t, y in zip(ts, ys))
        mid = n // 2
        mad = (
            resid[mid]
            if n % 2
            else (resid[mid - 1] + resid[mid]) / 2
        )
        s = mad * P61._MAD_K
        for _ in range(P61._IRLS_ITERS):
            sw = swt = swy = swtt = swty = 0.0
            for t, y in zip(ts, ys):
                e = abs(y - (a + b * t))
                w = min(1.0, P61._HUBER_C * s / e) if e > 0 else 1.0
                sw += w
                swt += w * t
                swy += w * y
                swtt += w * t * t
                swty += w * t * y
            det = sw * swtt - swt * swt
            a = (swtt * swy - swt * swty) / det
            b = (sw * swty - swt * swy) / det
        r = P61.q_huber_irls_regression(spark, SF).collect()[0]
        assert r.n_days == n
        assert r.ols_slope == pytest.approx(round(ols_b, 4), abs=1e-2)
        assert r.huber_slope == pytest.approx(round(b, 4), abs=1e-2)
        assert r.huber_intercept == pytest.approx(round(a, 2), abs=0.5)
        assert r.robust_scale == pytest.approx(round(s, 2), abs=0.5)
        # weights live in (0, 1]
        assert 0.0 < r.mean_final_weight <= 1.0


class TestLangidConfusion:
    def test_shares_and_recall(self, spark):
        got = P61.q_langid_confusion_audit(spark, SF).collect()
        per_lang = defaultdict(float)
        for r in got:
            per_lang[r.lang] += r.share_of_declared
        # shares per declared language sum to 1
        for lang, tot in per_lang.items():
            assert tot == pytest.approx(1.0, abs=1e-5)
        # the marker classifier must beat chance on its own langs:
        # diagonal share > 0.5 for at least half the declared langs
        diag = [
            r.share_of_declared
            for r in got
            if r.lang == r.lang_pred
        ]
        assert diag and sum(s > 0.5 for s in diag) * 2 >= len(diag)

    def test_counts_match_python(self, spark):
        from datafusion_archive_spark.queries import llm

        preds = {
            r.doc_id: r.lang_pred
            for r in llm.q_text_lang_id(spark, SF).collect()
        }
        declared = {
            r.doc_id: r.lang
            for r in spark.read.parquet(
                f"{SF}/documents.parquet"
            ).collect()
            if r.text is not None
        }
        cells = defaultdict(int)
        for doc, lang in declared.items():
            cells[(lang, preds[doc])] += 1
        got = {(r.lang, r.lang_pred): r.n
               for r in P61.q_langid_confusion_audit(spark, SF).collect()}
        assert got == dict(cells)
