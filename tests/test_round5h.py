"""Round-5 wave-11 semantics: vocab richness, Zipf fit, readability,
embedding centroids (datafusion_archive_spark/queries/pipeline13.py)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from datafusion_archive_spark.queries import pipeline13 as P13

SF = "/root/testdata/sf0.001"


def _norm_tokens(text):
    return [
        t
        for t in re.sub(r"\s+", " ", text).strip().lower().split(" ")
        if t
    ]


class TestVocabRichness:
    def test_matches_python(self, spark):
        freq = defaultdict(Counter)
        for r in (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("lang", "text")
            .collect()
        ):
            if r.text is not None:
                freq[r.lang].update(_norm_tokens(r.text))
        got = {r.lang: r for r in P13.q_vocab_richness(spark, SF).collect()}
        for lang, c in freq.items():
            r = got[lang]
            n_tokens = sum(c.values())
            n_types = len(c)
            hapax = sum(1 for v in c.values() if v == 1)
            assert r.n_tokens == n_tokens
            assert r.n_types == n_types
            assert r.n_hapax == hapax
            assert math.isclose(r.ttr, n_types / n_tokens, abs_tol=1e-5)
            assert math.isclose(
                r.hapax_share, hapax / n_types, abs_tol=1e-5
            )


class TestZipf:
    def test_matches_numpy_lstsq(self, spark):
        c = Counter()
        for r in (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("text")
            .collect()
        ):
            if r.text is not None:
                c.update(_norm_tokens(r.text))
        head = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[
            : P13._ZIPF_HEAD
        ]
        xs = [math.log(i + 1) for i in range(len(head))]
        ys = [math.log(f) for _, f in head]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        r2 = (n * sxy - sx * sy) ** 2 / (
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        got = P13.q_zipf_fit(spark, SF).collect()[0]
        assert got.n_head == n
        assert math.isclose(got.zipf_slope, slope, abs_tol=1e-3)
        assert math.isclose(got.r2, r2, abs_tol=1e-3)

    def test_slope_negative(self, spark):
        """Frequency is non-increasing in rank, so the fitted slope
        must be negative; synthetic near-uniform token frequencies
        sit far above natural corpora's ≈ −1 (by design — a flat
        slope is exactly the crawl-pathology signal this measures)."""
        got = P13.q_zipf_fit(spark, SF).collect()[0]
        assert -2.0 < got.zipf_slope < 0.0
        assert 0.0 <= got.r2 <= 1.0


class TestReadability:
    def test_matches_python(self, spark):
        got = {
            r.doc_id: r
            for r in P13.q_readability_scores(spark, SF).collect()
        }
        for r in (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text")
            .collect()
        ):
            if r.text is None:
                continue
            words = len(_norm_tokens(r.text))
            sents = max(
                1,
                sum(
                    1
                    for s in re.split(r"[.!?]+", r.text)
                    if s.strip(" ")
                ),
            )
            syls = len(re.findall(r"[aeiouy]+", r.text.lower()))
            g = got[r.doc_id]
            assert g.n_words == words
            assert g.n_sentences == sents
            assert g.n_vowel_groups == syls
            flesch = 206.835 - 1.015 * (words / sents) - 84.6 * (syls / words)
            assert math.isclose(g.flesch, flesch, abs_tol=1e-3)


class TestEmbeddingCentroids:
    def test_matches_numpy(self, spark):
        vecs = defaultdict(list)
        for r in (
            spark.read.parquet(f"{SF}/embeddings.parquet")
            .select("label", "embedding")
            .collect()
        ):
            vecs[r.label].append([float(x) for x in r.embedding])
        got = {
            r.label: r
            for r in P13.q_embedding_centroids(spark, SF).collect()
        }
        for label, vs in vecs.items():
            n = len(vs)
            dim = len(vs[0])
            c = [sum(v[i] for v in vs) / n for i in range(dim)]
            inertia = sum(
                sum((v[i] - c[i]) ** 2 for i in range(dim)) for v in vs
            )
            norm = math.sqrt(sum(x * x for x in c))
            g = got[label]
            assert g.n_vecs == n
            assert math.isclose(g.centroid_norm, norm, abs_tol=1e-3)
            assert math.isclose(g.inertia, inertia, abs_tol=0.05)
