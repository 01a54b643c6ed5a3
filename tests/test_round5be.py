"""Round-5 wave-62 semantics: winnowing / MOSS fingerprints
(datafusion_archive_spark/queries/pipeline64.py)."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import pytest

from datafusion_archive_spark.queries import pipeline64 as P64

SF = "/root/testdata/sf0.001"


def _h(s, seed):
    return int(
        hashlib.md5(f"{s}:{seed}".encode()).hexdigest()[:15], 16
    )


def _select(text):
    """Reference winnowing: min (hash, pos) per window, dedup."""
    t = re.sub(r"\s+", " ", text).strip().lower()
    k, w = P64._K, P64._WIN
    if len(t) < k + w - 1:
        return t, set()
    keys = [
        (str(_h(t[p - 1 : p - 1 + k], P64._SEED)).zfill(19)
         + str(p).zfill(7))
        for p in range(1, len(t) - k + 2)
    ]
    sel = set()
    for s in range(len(keys) - w + 1):
        sel.add(min(keys[s : s + w]))
    return t, sel


class TestWinnowing:
    def test_matches_python_and_density(self, spark):
        docs = [
            r
            for r in spark.read.parquet(
                f"{SF}/documents.parquet"
            ).collect()
            if r.text is not None
        ]
        per_source = defaultdict(lambda: [0, 0, 0])
        sels = {}
        for r in docs:
            t, sel = _select(r.text)
            if len(t) < P64._K + P64._WIN - 1 or not sel:
                continue
            sels[r.doc_id] = sel
            agg = per_source[r.source]
            agg[0] += 1
            agg[1] += len(t) - (P64._K - 1)
            agg[2] += len(sel)
        got = {r.source: r for r in
               P64.q_winnowing_fingerprints(spark, SF).collect()}
        assert set(got) == set(per_source)
        for src, (nd, np_, ns) in per_source.items():
            r = got[src]
            assert (r.n_docs, r.n_positions, r.n_fingerprints) == (
                nd, np_, ns,
            )
            # winnowing's expected density is 2/(w+1) = 0.4
            assert 0.2 < r.density < 0.6

    def test_shared_pairs_match(self, spark):
        docs = [
            r
            for r in spark.read.parquet(
                f"{SF}/documents.parquet"
            ).collect()
            if r.text is not None
        ]
        hashes = {}
        for r in docs:
            _, sel = _select(r.text)
            if sel:
                hashes[r.doc_id] = {s[:19] for s in sel}
        # the MOSS boilerplate filter (round 11d): fingerprints in
        # more than _MAX_HASH_DF documents are excluded on both sides
        from collections import Counter

        df = Counter(h for s in hashes.values() for h in s)
        hashes = {
            d: {h for h in s if df[h] <= P64._MAX_HASH_DF}
            for d, s in hashes.items()
        }
        pairs = []
        ids = sorted(hashes)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                shared = len(hashes[a] & hashes[b])
                if shared:
                    pairs.append((-shared, a, b))
        want = sorted(pairs)[: P64._TOP]
        got = P64.q_moss_shared_fingerprints(spark, SF).collect()
        assert [(-r.shared, r.doc_a, r.doc_b) for r in got] == want
