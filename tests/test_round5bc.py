"""Round-5 wave-60 semantics: Lloyd k-means, SRM check
(datafusion_archive_spark/queries/pipeline62.py)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from datafusion_archive_spark.queries import pipeline62 as P62
from datafusion_archive_spark.queries.timeseries import load_events

SF = "/root/testdata/sf0.001"


class TestKmeans:
    def test_matches_numpy_lloyd(self, spark):
        rows = (
            spark.read.parquet(f"{SF}/embeddings.parquet")
            .select("vec_id", "embedding")
            .collect()
        )
        rows.sort(key=lambda r: r.vec_id)
        ids = np.array([r.vec_id for r in rows])
        x = np.array([r.embedding for r in rows], dtype=np.float64)
        k = P62._KM_K
        assign = ids % k
        for _ in range(P62._KM_ITERS):
            cents = np.stack(
                [x[assign == j].mean(axis=0) for j in range(k)]
            )
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(
                axis=2
            )
            # argmin with tie-break to lower cluster id (np argmin
            # already picks the first minimum)
            assign = d2.argmin(axis=1)
        cents = np.stack(
            [x[assign == j].mean(axis=0) for j in range(k)]
        )
        got = {r.k: r for r in P62.q_kmeans_lloyd(spark, SF).collect()}
        assert set(got) == set(range(k))
        for j in range(k):
            members = x[assign == j]
            r = got[j]
            assert r.size == len(members)
            wss = float(((members - cents[j]) ** 2).sum())
            assert r.within_ss == pytest.approx(round(wss, 4),
                                                abs=1e-2)
        assert sum(r.size for r in got.values()) == len(ids)

    def test_iterations_reduce_inertia(self, spark):
        # total within-SS after Lloyd steps <= initial partition's
        rows = (
            spark.read.parquet(f"{SF}/embeddings.parquet")
            .select("vec_id", "embedding")
            .collect()
        )
        x = np.array([r.embedding for r in rows], dtype=np.float64)
        ids = np.array([r.vec_id for r in rows])
        init = ids % P62._KM_K
        cents0 = np.stack(
            [x[init == j].mean(axis=0) for j in range(P62._KM_K)]
        )
        inertia0 = sum(
            float(((x[init == j] - cents0[j]) ** 2).sum())
            for j in range(P62._KM_K)
        )
        got = P62.q_kmeans_lloyd(spark, SF).collect()
        assert sum(r.within_ss for r in got) <= inertia0 + 1e-6


class TestSrm:
    def test_matches_python(self, spark):
        n = n_a = 0
        for r in load_events(spark, SF).collect():
            if r.event_type != "purchase":
                continue
            n += 1
            h = hashlib.md5(
                f"{r.event_id}:{P62._SRM_SEED}".encode()
            ).hexdigest()
            n_a += int(h[:15], 16) % 2 == 0
        chi2 = (n_a - n / 2) ** 2 / (n / 2) + (
            (n - n_a) - n / 2
        ) ** 2 / (n / 2)
        r = P62.q_ab_srm_check(spark, SF).collect()[0]
        assert (r.n_events, r.n_arm_a) == (n, n_a)
        assert r.share_a == pytest.approx(round(n_a / n, 6), abs=1e-6)
        assert r.chi2_srm == pytest.approx(round(chi2, 6), abs=1e-5)
        # a healthy hash split should NOT trip the SRM alarm
        assert r.p_srm > 0.001
