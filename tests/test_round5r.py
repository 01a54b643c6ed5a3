"""Round-5 wave-22 semantics: minhash audit, novelty, embedding QA
(datafusion_archive_spark/queries/pipeline24.py)."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import numpy as np

from datafusion_archive_spark.queries import pipeline24 as P24

SF = "/root/testdata/sf0.001"


def _shingle_sets(spark):
    out = {}
    for r in (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ):
        if r.text is None:
            continue
        w = re.sub(r"\s+", " ", r.text).strip().lower().split(" ")
        if len(w) <= 3:
            out[r.doc_id] = {" ".join(w)}
        else:
            out[r.doc_id] = {
                " ".join(w[i : i + 3]) for i in range(len(w) - 2)
            }
    return out


class TestMinhashAudit:
    def test_exact_side_matches_python(self, spark):
        sets = _shingle_sets(spark)
        rows = P24.q_minhash_estimate_audit(spark, SF).collect()
        assert rows  # candidate pairs exist at this SF
        for r in rows:
            a, b = sets[r.id_a], sets[r.id_b]
            exact = len(a & b) / len(a | b)
            assert math.isclose(r.exact_jaccard, exact, abs_tol=1e-3), (
                r.id_a,
                r.id_b,
            )
            assert math.isclose(
                r.abs_err, abs(r.est_jaccard - r.exact_jaccard), abs_tol=1e-9
            )

    def test_sketch_error_is_bounded(self, spark):
        """16 hashes: standard error ≈ sqrt(J(1-J)/16) ≤ 0.125 — the
        audit itself must show the sketch is usable (no pair off by
        more than 3 standard errors ≈ 0.38)."""
        rows = P24.q_minhash_estimate_audit(spark, SF).collect()
        assert max(r.abs_err for r in rows) <= 0.38


class TestNovelty:
    def test_matches_python(self, spark):
        sets = _shingle_sets(spark)
        df = defaultdict(int)
        for s in sets.values():
            for sh in s:
                df[sh] += 1
        got = {r.doc_id: r for r in P24.q_ngram_novelty_rate(spark, SF).collect()}
        assert set(got) == set(sets)
        for did, s in sets.items():
            uniq = sum(1 for sh in s if df[sh] == 1)
            assert got[did].n_shingles == len(s)
            assert got[did].n_unique == uniq
            assert math.isclose(
                got[did].novelty, uniq / len(s), abs_tol=1e-5
            )


class TestEmbeddingNorms:
    def test_matches_numpy(self, spark):
        vecs = {
            r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
        }
        norms = {k: float(np.sqrt((v * v).sum())) for k, v in vecs.items()}
        mu = float(np.mean(list(norms.values())))
        sd = float(np.std(list(norms.values()), ddof=1))
        ranked = sorted(
            norms, key=lambda k: (-abs((norms[k] - mu) / sd), k)
        )[: P24._NORM_TOPK]
        rows = P24.q_embedding_norm_outliers(spark, SF).collect()
        assert [r.vec_id for r in rows] == ranked
        for r in rows:
            assert math.isclose(r.l2_norm, norms[r.vec_id], abs_tol=1e-4)
            assert math.isclose(
                r.z, (norms[r.vec_id] - mu) / sd, abs_tol=1e-3
            )

    def test_ordered_by_deviation(self, spark):
        rows = P24.q_embedding_norm_outliers(spark, SF).collect()
        zs = [abs(r.z) for r in rows]
        assert zs == sorted(zs, reverse=True)


class TestDimVariance:
    def test_matches_numpy(self, spark):
        mat = np.array(
            [
                r.embedding
                for r in spark.read.parquet(
                    f"{SF}/embeddings.parquet"
                ).collect()
            ],
            dtype=np.float64,
        )
        got = {r.dim: r for r in P24.q_embedding_dim_variance(spark, SF).collect()}
        assert set(got) == set(range(mat.shape[1]))
        for d in range(mat.shape[1]):
            col = mat[:, d]
            assert math.isclose(got[d].mean, col.mean(), abs_tol=1e-4)
            assert math.isclose(
                got[d].variance, col.var(ddof=1), abs_tol=1e-4
            )
            assert math.isclose(got[d].min_x, col.min(), abs_tol=1e-4)
            assert math.isclose(got[d].max_x, col.max(), abs_tol=1e-4)
        # uniform synthetic data: no dead dimensions expected
        assert all(r.variance > 0.01 for r in got.values())
