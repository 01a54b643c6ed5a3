"""Round-5 wave-29 semantics: token dispersion, Laspeyres index,
Heaps' law (datafusion_archive_spark/queries/pipeline31.py)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import numpy as np

from datafusion_archive_spark.queries import pipeline31 as P31

SF = "/root/testdata/sf0.001"


def _doc_tokens(spark):
    out = {}
    for r in (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ):
        if r.text is not None:
            out[r.doc_id] = (
                re.sub(r"\s+", " ", r.text).strip().lower().split(" ")
            )
    return out


class TestDispersion:
    def test_matches_python(self, spark):
        docs = _doc_tokens(spark)
        n_docs = len(docs)
        per = defaultdict(Counter)
        for did, toks in docs.items():
            for t in toks:
                per[t][did] += 1
        rows = P31.q_token_dispersion(spark, SF).collect()
        assert len(rows) == P31._DISP_TOPK
        freqs = [r.n_occurrences for r in rows]
        assert freqs == sorted(freqs, reverse=True)
        for r in rows:
            counts = per[r.token]
            xs = np.zeros(n_docs)
            xs[: len(counts)] = list(counts.values())
            mean = xs.sum() / n_docs
            vmr = xs.var() / mean
            assert r.n_occurrences == int(xs.sum())
            assert r.doc_freq == len(counts)
            assert math.isclose(r.vmr, vmr, abs_tol=1e-4), r.token


class TestLaspeyres:
    def test_matches_python(self, spark):
        cells = defaultdict(lambda: [0.0, 0])
        for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
            k = (r.l_partkey, r.l_shipdate.year)
            cells[k][0] += r.l_extendedprice
            cells[k][1] += int(r.l_quantity)
        p = {k: v[0] / v[1] for k, v in cells.items()}
        base = {
            pk: (p[(pk, yr)], cells[(pk, yr)][1])
            for (pk, yr) in cells
            if yr == P31._IDX_BASE_YEAR
        }
        years = sorted({yr for _, yr in cells})
        got = {r.yr: r for r in P31.q_price_index_laspeyres(spark, SF).collect()}
        for yr in years:
            parts = [
                pk for (pk, y) in cells if y == yr and pk in base
            ]
            if not parts:
                assert yr not in got
                continue
            num = sum(p[(pk, yr)] * base[pk][1] for pk in parts)
            den = sum(base[pk][0] * base[pk][1] for pk in parts)
            assert got[yr].n_parts == len(parts)
            assert math.isclose(
                got[yr].laspeyres_index, num / den, abs_tol=1e-5
            ), yr
        # base year indexes to exactly 1
        assert math.isclose(
            got[P31._IDX_BASE_YEAR].laspeyres_index, 1.0, abs_tol=1e-9
        )


class TestHeaps:
    def test_matches_numpy(self, spark):
        docs = _doc_tokens(spark)
        seen = set()
        n = v = 0
        ns, vs = [], []
        for did in sorted(docs):
            toks = docs[did]
            n += len(toks)
            for t in toks:
                if t not in seen:
                    seen.add(t)
                    v += 1
            ns.append(n)
            vs.append(v)
        ln_n = np.log(ns)
        ln_v = np.log(vs)
        b = np.cov(ln_n, ln_v, bias=True)[0, 1] / np.var(ln_n)
        lk = ln_v.mean() - b * ln_n.mean()
        r2 = float(np.corrcoef(ln_n, ln_v)[0, 1]) ** 2
        row = P31.q_heaps_law_fit(spark, SF).collect()[0]
        assert row.n_tokens == ns[-1]
        assert row.vocab == vs[-1]
        assert math.isclose(row.b, b, abs_tol=1e-4)
        assert math.isclose(row.k, math.exp(lk), rel_tol=1e-3)
        assert math.isclose(row.r2, r2, abs_tol=1e-4)
        # tiny closed vocabulary: growth must be strongly sublinear
        assert row.b < 0.5
