"""Round-5 wave-58 semantics: DBSCAN, simplified silhouette
(datafusion_archive_spark/queries/pipeline60.py)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pytest

from datafusion_archive_spark.queries import pipeline60 as P60

SF = "/root/testdata/sf0.001"


def _pt(key, seed):
    h = hashlib.md5(f"{key}:{seed}".encode()).hexdigest()
    return int(h[:15], 16) / float(1 << 60) * 10.0


class TestDbscan:
    def test_matches_python_dbscan(self, spark):
        from datafusion_archive_spark.queries.pipeline10 import (
            _GEO_SEED_LAT,
            _GEO_SEED_LON,
        )

        # ε is density-adaptive (_eps_for): at sf0.001's 150 points
        # the default already yields mean degree ≈ 3 — real clusters
        # with no densifying monkeypatch, and the differential
        # exercises the exact radius the sweeps certify
        ids = [
            r.c_custkey
            for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
        ]
        pts = {
            i: (_pt(i, _GEO_SEED_LAT), _pt(i, _GEO_SEED_LON))
            for i in ids
        }
        eps = P60._eps_for(len(ids))
        eps2 = eps * eps
        nbrs = defaultdict(set)
        items = list(pts.items())
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                (ia, (xa, ya)), (ib, (xb, yb)) = items[i], items[j]
                if (xa - xb) ** 2 + (ya - yb) ** 2 < eps2:
                    nbrs[ia].add(ib)
                    nbrs[ib].add(ia)
        core = {i for i in ids if len(nbrs[i]) >= P60._MIN_PTS}
        # components over core-core edges
        comp = {}
        for c in core:
            if c in comp:
                continue
            stack, label = [c], c
            comp[c] = label
            while stack:
                u = stack.pop()
                for v in nbrs[u]:
                    if v in core and v not in comp:
                        comp[v] = label
                        stack.append(v)
        border = {}
        for i in ids:
            if i in core:
                continue
            cands = [comp[v] for v in nbrs[i] if v in core]
            if cands:
                border[i] = min(cands)
        sizes = defaultdict(int)
        for v in comp.values():
            sizes[v] += 1
        for v in border.values():
            sizes[v] += 1
        r = P60.q_dbscan_clusters(spark, SF).collect()[0]
        # component labels differ (min-id vs traversal) but the
        # partition-level summary must match exactly
        assert r.n_clusters == len(set(comp.values()))
        assert r.n_core == len(core)
        assert r.n_border == len(border)
        assert r.n_noise == len(ids) - len(core) - len(border)
        assert r.max_cluster_size == max(sizes.values())

    def test_definitions_hold(self, spark):
        r = P60.q_dbscan_clusters(spark, SF).collect()[0]
        assert r.n_core + r.n_border >= r.max_cluster_size
        assert r.n_clusters >= 1

    def test_all_noise_when_sparse(self, spark, monkeypatch):
        # shrink the base radius so even the adaptive ε is deeply
        # subcritical — the summary must degrade to zeros, not NULLs
        monkeypatch.setattr(P60, "_EPS", 0.02)
        r = P60.q_dbscan_clusters(spark, SF).collect()[0]
        assert (r.n_clusters, r.n_core, r.n_border) == (0, 0, 0)
        assert r.max_cluster_size == 0
        assert r.n_noise == 150


class TestSilhouette:
    def test_matches_numpy(self, spark):
        rows = (
            spark.read.parquet(f"{SF}/embeddings.parquet")
            .select("vec_id", "label", "embedding")
            .collect()
        )
        by_label = defaultdict(list)
        for r in rows:
            by_label[r.label].append(
                np.array(r.embedding, dtype=np.float64)
            )
        cents = {
            lab: np.mean(vs, axis=0) for lab, vs in by_label.items()
        }
        sums = defaultdict(list)
        for r in rows:
            v = np.array(r.embedding, dtype=np.float64)
            a = float(np.linalg.norm(v - cents[r.label]))
            b = min(
                float(np.linalg.norm(v - c))
                for lab, c in cents.items()
                if lab != r.label
            )
            sums[r.label].append((b - a) / max(a, b))
        got = {r.label: r for r in
               P60.q_silhouette_simplified(spark, SF).collect()}
        assert set(got) == set(sums)
        for lab, ss in sums.items():
            r = got[lab]
            assert r.n_vectors == len(ss)
            assert r.mean_silhouette == pytest.approx(
                round(sum(ss) / len(ss), 6), abs=1e-5
            )
            # random embeddings: clusters are weak, silhouette ~ 0
            assert -0.5 < r.mean_silhouette < 0.5
