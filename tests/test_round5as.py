"""Round-5 wave-50 semantics: retrieval metrics, conformal coverage
(datafusion_archive_spark/queries/pipeline52.py)."""

from __future__ import annotations

import hashlib
import json
import math
from collections import defaultdict

import numpy as np
import pytest

from datafusion_archive_spark.queries import pipeline52 as P52
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


class TestRetrievalMetrics:
    def test_matches_numpy(self, spark):
        rows = (
            spark.read.parquet(f"{SF}/embeddings.parquet")
            .select("vec_id", "embedding")
            .collect()
        )
        rows.sort(key=lambda r: r.vec_id)
        ids = [r.vec_id for r in rows]
        x = np.array([r.embedding for r in rows], dtype=np.float64)

        def topk(dims):
            sub = x[:, :dims]
            nrm = np.linalg.norm(sub, axis=1)
            out = {}
            for qi in range(len(ids)):
                if ids[qi] >= P52._N_QUERIES:
                    continue
                score = sub @ sub[qi] / (nrm * nrm[qi])
                order = sorted(
                    (j for j in range(len(ids)) if j != qi),
                    key=lambda j: (-score[j], ids[j]),
                )[: P52._TOPK]
                out[ids[qi]] = [ids[j] for j in order]
            return out

        exact = topk(64)
        approx = topk(P52._TRUNC)
        idcg = sum(1 / math.log2(i + 1) for i in range(1, P52._TOPK + 1))
        recalls, rrs, ndcgs = [], [], []
        for q in exact:
            rel = set(exact[q])
            hits = [
                (rank, cid)
                for rank, cid in enumerate(approx[q], 1)
                if cid in rel
            ]
            recalls.append(len(hits) / P52._TOPK)
            rrs.append(1.0 / hits[0][0] if hits else 0.0)
            ndcgs.append(
                sum(1 / math.log2(r + 1) for r, _ in hits) / idcg
            )
        r = P52.q_retrieval_metrics_truncation(spark, SF).collect()[0]
        assert r.n_queries == len(exact)
        assert r.recall_at_10 == pytest.approx(
            round(sum(recalls) / len(recalls), 6), abs=1e-5
        )
        assert r.mrr == pytest.approx(
            round(sum(rrs) / len(rrs), 6), abs=1e-5
        )
        assert r.ndcg_at_10 == pytest.approx(
            round(sum(ndcgs) / len(ndcgs), 6), abs=1e-5
        )
        # sanity: metrics nest recall >= ndcg is not guaranteed, but
        # all live in [0, 1] and truncation must lose something
        assert 0.0 < r.recall_at_10 < 1.0


class TestConformal:
    def test_matches_python_and_guarantee(self, spark):
        rows = [
            r
            for r in load_events(spark, SF).collect()
            if r.event_type == "purchase"
        ]
        cal, test = [], []
        for r in rows:
            g = json.loads(r.props)["k"] % 5
            h = hashlib.md5(
                f"{r.event_id}:{P52._CONF_SEED}".encode()
            ).hexdigest()
            (cal if int(h[:15], 16) % 2 == 0 else test).append(
                (g, float(r.value))
            )
        mus = defaultdict(list)
        for g, y in cal:
            mus[g].append(y)
        mu = {g: sum(v) / len(v) for g, v in mus.items()}
        resid = sorted(abs(y - mu[g]) for g, y in cal)
        n = len(resid)
        k = min(n, math.ceil((n + 1) * (1 - P52._ALPHA)))
        qhat = resid[k - 1]
        covered = sum(
            1 for g, y in test if abs(y - mu[g]) <= qhat
        )
        r = P52.q_conformal_interval_coverage(spark, SF).collect()[0]
        assert r.n_test == len(test)
        assert r.half_width == pytest.approx(round(qhat, 4), abs=1e-3)
        assert r.coverage == pytest.approx(
            round(covered / len(test), 6), abs=1e-6
        )
        # the finite-sample guarantee: coverage near nominal
        assert r.coverage >= 1 - P52._ALPHA - 0.08
