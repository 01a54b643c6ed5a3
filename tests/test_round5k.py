"""Round-5 wave-14 semantics: KL/JS divergence, target encoding,
WOE/IV, feature hashing, Simpson slopes
(datafusion_archive_spark/queries/pipeline16.py)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import numpy as np

from datafusion_archive_spark.plans import summarize
from datafusion_archive_spark.queries import pipeline16 as P16

SF = "/root/testdata/sf0.001"


def _token_dists(spark):
    by_lang = defaultdict(Counter)
    for r in (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("lang", "text")
        .collect()
    ):
        if r.text is None:
            continue
        toks = re.sub(r"\s+", " ", r.text).strip().lower().split(" ")
        by_lang[r.lang].update(toks)
    return by_lang


class TestKlDivergence:
    def test_matches_python(self, spark):
        by_lang = _token_dists(spark)
        corpus = Counter()
        for c in by_lang.values():
            corpus.update(c)
        ct = sum(corpus.values())
        got = {r.lang: r for r in P16.q_kl_divergence_lang(spark, SF).collect()}
        assert set(got) == set(by_lang)
        for lang, cnt in by_lang.items():
            lt = sum(cnt.values())
            kl = sum(
                (n / lt) * math.log((n / lt) / (corpus[t] / ct))
                for t, n in cnt.items()
            )
            assert got[lang].n_vocab == len(cnt)
            assert got[lang].n_tokens == lt
            assert math.isclose(got[lang].kl_nats, kl, abs_tol=1e-5), lang

    def test_kl_nonnegative(self, spark):
        for r in P16.q_kl_divergence_lang(spark, SF).collect():
            assert r.kl_nats >= 0


class TestJsDivergence:
    def test_matches_python(self, spark):
        by_lang = _token_dists(spark)
        langs = sorted(by_lang)
        got = {
            (r.lang1, r.lang2): r
            for r in P16.q_js_divergence_langs(spark, SF).collect()
        }
        assert set(got) == {
            (a, b) for i, a in enumerate(langs) for b in langs[i + 1 :]
        }
        for (a, b), r in got.items():
            ta, tb = sum(by_lang[a].values()), sum(by_lang[b].values())
            union = set(by_lang[a]) | set(by_lang[b])
            jsd = 0.0
            shared = 0
            for t in union:
                p = by_lang[a][t] / ta
                q = by_lang[b][t] / tb
                m = (p + q) / 2
                if p > 0:
                    jsd += 0.5 * p * math.log(p / m)
                if q > 0:
                    jsd += 0.5 * q * math.log(q / m)
                if p > 0 and q > 0:
                    shared += 1
            assert math.isclose(r.jsd_nats, jsd, abs_tol=1e-5), (a, b)
            assert r.n_shared_vocab == shared
            assert r.n_union_vocab == len(union)
            # JSD is bounded by ln 2 and non-negative
            assert 0 <= r.jsd_nats <= math.log(2) + 1e-9

    def test_no_cartesian(self, spark):
        s = summarize(P16.q_js_divergence_langs(spark, SF))
        assert "CartesianProduct" not in s.joins


class TestTargetEncoding:
    def test_matches_python(self, spark):
        orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
        cust = {
            r.c_custkey: r.c_nationkey
            for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
        }
        nation = {
            r.n_nationkey: r.n_name
            for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
        }
        agg = defaultdict(lambda: [0, 0.0])
        for o in orders:
            nm = nation[cust[o.o_custkey]]
            agg[nm][0] += 1
            agg[nm][1] += 1.0 if o.o_orderpriority == "1-URGENT" else 0.0
        prior = sum(v[1] for v in agg.values()) / sum(
            v[0] for v in agg.values()
        )
        got = {
            r.nation: r
            for r in P16.q_target_encoding_nation(spark, SF).collect()
        }
        assert set(got) == set(agg)
        for nm, (n, ny) in agg.items():
            assert got[nm].n_orders == n
            assert math.isclose(got[nm].urgent_rate, ny / n, abs_tol=1e-5)
            want = (ny + P16._TE_SMOOTH * prior) / (n + P16._TE_SMOOTH)
            assert math.isclose(got[nm].encoded, want, abs_tol=1e-5)
            # smoothing pulls the encoding toward the prior
            lo, hi = sorted((ny / n, prior))
            assert lo - 1e-9 <= got[nm].encoded <= hi + 1e-9


class TestWoeIv:
    def test_matches_python(self, spark):
        orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
        width = (P16._WOE_HI - P16._WOE_LO) / P16._WOE_BINS
        cells = defaultdict(lambda: [0, 0])
        for o in orders:
            if o.o_totalprice <= 0:
                continue
            b = int((o.o_totalprice - P16._WOE_LO) // width)
            b = min(max(b, 0), P16._WOE_BINS - 1)
            good = o.o_orderpriority in ("1-URGENT", "2-HIGH")
            cells[b][0 if good else 1] += 1
        tg = sum(v[0] for v in cells.values())
        tb = sum(v[1] for v in cells.values())
        sm = 0.5 * P16._WOE_BINS
        got = {r.bin: r for r in P16.q_woe_iv_price_bins(spark, SF).collect()}
        assert set(got) == set(cells)
        for b, (g, bad) in cells.items():
            gs = (g + 0.5) / (tg + sm)
            bs = (bad + 0.5) / (tb + sm)
            woe = math.log(gs / bs)
            assert got[b].n_good == g and got[b].n_bad == bad
            assert math.isclose(got[b].woe, woe, abs_tol=1e-5)
            assert math.isclose(
                got[b].iv_part, (gs - bs) * woe, abs_tol=1e-5
            )
            # smoothed IV contributions are non-negative by construction
            assert got[b].iv_part >= 0


class TestFeatureHash:
    def test_matches_python(self, spark):
        import hashlib

        def h64(tok):
            return int(
                hashlib.md5(f"{tok}:0".encode()).hexdigest()[:15], 16
            )

        want = defaultdict(int)
        for r in (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text")
            .collect()
        ):
            if r.text is None:
                continue
            for tok in re.sub(r"\s+", " ", r.text).strip().lower().split(" "):
                want[(r.doc_id, h64(tok) % P16._FH_DIM)] += 1
        got = {
            (r.doc_id, r.bucket): r.cnt
            for r in P16.q_feature_hash_counts(spark, SF).collect()
        }
        assert got == dict(want)

    def test_buckets_in_range(self, spark):
        import hashlib

        rows = P16.q_feature_hash_counts(spark, SF).collect()
        assert all(0 <= r.bucket < P16._FH_DIM for r in rows)
        # the observed bucket set is exactly the hashed vocabulary's
        # (the synthetic corpus has a small closed vocabulary, so the
        # 64-dim space is NOT saturated — derive, don't assume)
        vocab = set()
        for r in (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("text")
            .collect()
        ):
            if r.text is not None:
                vocab.update(
                    re.sub(r"\s+", " ", r.text).strip().lower().split(" ")
                )
        want = {
            int(hashlib.md5(f"{t}:0".encode()).hexdigest()[:15], 16)
            % P16._FH_DIM
            for t in vocab
        }
        assert {r.bucket for r in rows} == want


class TestSimpsonSlopes:
    def test_matches_numpy(self, spark):
        li = (
            spark.read.parquet(f"{SF}/lineitem.parquet")
            .select("l_returnflag", "l_quantity", "l_extendedprice")
            .collect()
        )
        groups = defaultdict(list)
        for r in li:
            groups[r.l_returnflag].append((r.l_quantity, r.l_extendedprice))
        groups["ALL"] = [(r.l_quantity, r.l_extendedprice) for r in li]
        got = {r.l_returnflag: r for r in P16.q_simpson_slopes(spark, SF).collect()}
        assert set(got) == set(groups)
        for flag, pts in groups.items():
            x = np.array([p[0] for p in pts], dtype=float)
            y = np.array([p[1] for p in pts], dtype=float)
            slope = np.cov(x, y, bias=True)[0, 1] / np.var(x)
            r2 = float(np.corrcoef(x, y)[0, 1]) ** 2
            assert got[flag].n == len(pts)
            assert math.isclose(got[flag].slope, slope, abs_tol=0.01), flag
            assert math.isclose(got[flag].r2, r2, abs_tol=1e-4), flag
