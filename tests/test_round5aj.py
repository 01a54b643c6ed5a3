"""Round-5 wave-41 semantics: Chao1/Good–Turing, Mann–Kendall
(datafusion_archive_spark/queries/pipeline43.py)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline43 as P43

SF = "/root/testdata/sf0.001"


class TestChao1:
    def test_matches_python(self, spark):
        freq = defaultdict(Counter)
        for r in (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("lang", "text")
            .collect()
        ):
            if r.text is None:
                continue
            norm = re.sub(r"\s+", " ", r.text).strip().lower()
            freq[r.lang].update(t for t in norm.split(" ") if t)
        got = {r.lang: r for r in
               P43.q_species_richness_chao1(spark, SF).collect()}
        assert set(got) == set(freq)
        for lang, cnt in freq.items():
            f1 = sum(1 for v in cnt.values() if v == 1)
            f2 = sum(1 for v in cnt.values() if v == 2)
            d = len(cnt)
            r = got[lang]
            assert (r.n_types, r.f1, r.f2) == (d, f1, f2)
            assert r.n_tokens == sum(cnt.values())
            chao1 = d + f1 * (f1 - 1) / (2.0 * (f2 + 1))
            assert r.chao1 == pytest.approx(round(chao1, 4), abs=1e-4)
            assert r.gt_unseen_mass == pytest.approx(
                round(f1 / sum(cnt.values()), 6), abs=1e-6
            )
            # bias-corrected Chao1 is always >= observed richness
            assert r.chao1 >= d


class TestMannKendall:
    def test_matches_python(self, spark):
        daily = defaultdict(float)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
            daily[r.o_orderdate] += float(r.o_totalprice)
        xs = [round(daily[d], 0) for d in sorted(daily)]
        n = len(xs)
        s = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie_term = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(xs).values()
        )
        var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        sgn = (s > 0) - (s < 0)
        z = (s - sgn) / math.sqrt(var)
        r = P43.q_mann_kendall_trend(spark, SF).collect()[0]
        assert r.n_days == n
        assert r.s_stat == s
        assert r.sd_s == pytest.approx(round(math.sqrt(var), 4), abs=1e-4)
        assert r.z_mk == pytest.approx(round(z, 6), abs=1e-6)
        assert 0.0 <= r.p_two_sided <= 1.0
