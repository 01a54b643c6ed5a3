"""Round-5 wave-45 semantics: power-iteration PCA, quantization audit
(datafusion_archive_spark/queries/pipeline47.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from datafusion_archive_spark.queries import pipeline47 as P47

SF = "/root/testdata/sf0.001"


def _matrix(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    return np.array([r.embedding for r in rows], dtype=np.float64)


class TestPowerIterationPCA:
    def test_matches_numpy_replay(self, spark):
        x = _matrix(spark)
        c = x - x.mean(axis=0)
        n = c.shape[0]
        v = np.full(P47._DIM, 1.0 / math.sqrt(P47._DIM))
        for _ in range(P47._PCA_ITERS):
            w = c.T @ (c @ v) / n
            v = w / np.linalg.norm(w)
        eig = float(((c @ v) ** 2).sum() / n)
        tv = float((c**2).sum() / n)
        got = P47.q_pca_power_iteration(spark, SF).collect()
        assert len(got) == P47._PCA_TOP
        order = sorted(
            range(P47._DIM), key=lambda i: (-abs(v[i]), i)
        )[: P47._PCA_TOP]
        assert [r.dim for r in got] == [i + 1 for i in order]
        for r, i in zip(got, order):
            assert r.loading == pytest.approx(round(v[i], 5), abs=1e-4)
        assert got[0].eigenvalue == pytest.approx(round(eig, 4), abs=1e-3)
        assert got[0].explained_share == pytest.approx(
            round(eig / tv, 6), abs=1e-4
        )

    def test_rayleigh_below_total_variance(self, spark):
        got = P47.q_pca_power_iteration(spark, SF).collect()
        assert 0.0 < got[0].explained_share < 1.0
        # unit-norm loadings: top-8 mass below 1
        assert sum(r.loading**2 for r in got) < 1.0 + 1e-6


class TestQuantizationAudit:
    def test_matches_numpy(self, spark):
        x = _matrix(spark)
        lo = x.min(axis=0)
        hi = x.max(axis=0)
        code = np.minimum(
            P47._QLEVELS - 1,
            np.floor((x - lo) / (hi - lo) * P47._QLEVELS),
        )
        recon = lo + (code + 0.5) * (hi - lo) / P47._QLEVELS
        mse = float(((x - recon) ** 2).mean())
        ents = []
        for d in range(x.shape[1]):
            _, counts = np.unique(code[:, d], return_counts=True)
            p = counts / counts.sum()
            ents.append(float(-(p * np.log2(p)).sum()))
        r = P47.q_embedding_quantization_audit(spark, SF).collect()[0]
        assert r.n_cells == x.size
        assert r.mse_e4 == pytest.approx(round(mse * 1e4, 4), abs=1e-3)
        assert r.avg_code_entropy_bits == pytest.approx(
            round(sum(ents) / len(ents), 4), abs=1e-3
        )
        # 4-bit code can't carry more than 4 bits
        assert r.avg_code_entropy_bits < 4.0
