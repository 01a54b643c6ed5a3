"""Round-5 wave-28 semantics: contrastive pair mining
(datafusion_archive_spark/queries/pipeline30.py)."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from datafusion_archive_spark.queries import pipeline30 as P30

SF = "/root/testdata/sf0.001"


def _vecs(spark):
    return {
        r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }


class TestHardNegatives:
    def test_matches_numpy(self, spark):
        vecs = _vecs(spark)
        normed = {
            k: (v / np.sqrt((v * v).sum()), lab) for k, (v, lab) in vecs.items()
        }
        got = {}
        for r in P30.q_hard_negatives_topk(spark, SF).collect():
            got.setdefault(r.query_id, []).append(r)
        assert set(got) == {k for k in vecs if k < P30._HN_QUERIES}
        for qid, rows in got.items():
            qv, qlab = normed[qid]
            cands = sorted(
                (
                    (-round(float(qv @ nv), 6), nid)
                    for nid, (nv, nlab) in normed.items()
                    if nid != qid and nlab != qlab
                ),
            )[: P30._HN_K]
            rows.sort(key=lambda r: r.rank)
            assert [r.neighbor_id for r in rows] == [c[1] for c in cands]
            for r, (negcos, nid) in zip(rows, cands):
                assert math.isclose(r.cosine, -negcos, abs_tol=1e-5)
                # the defining property: a DIFFERENT label
                assert r.neighbor_label != vecs[qid][1]

    def test_harder_than_random(self, spark):
        """Mined negatives are closer to the anchor than the average
        different-label vector — that's what 'hard' means."""
        vecs = _vecs(spark)
        normed = {
            k: (v / np.sqrt((v * v).sum()), lab) for k, (v, lab) in vecs.items()
        }
        rows = P30.q_hard_negatives_topk(spark, SF).collect()
        mined_mean = float(np.mean([r.cosine for r in rows]))
        rand = []
        for qid in range(P30._HN_QUERIES):
            qv, qlab = normed[qid]
            rand.extend(
                float(qv @ nv)
                for nid, (nv, nlab) in normed.items()
                if nid != qid and nlab != qlab
            )
        assert mined_mean > float(np.mean(rand))


class TestRandomNegatives:
    def test_matches_python(self, spark):
        n = len(_vecs(spark))
        want = {}
        for a in range(P30._RN_ANCHORS):
            for s in range(P30._RN_K):
                d = (
                    int(
                        hashlib.md5(f"{a}:{s}:0".encode()).hexdigest()[:15],
                        16,
                    )
                    % n
                )
                want[(a, s)] = (d + 1) % n if d == a else d
        got = {
            (r.anchor_id, r.slot): r.negative_id
            for r in P30.q_contrastive_random_negatives(spark, SF).collect()
        }
        assert got == want
        # no anchor draws itself
        assert all(neg != a for (a, _), neg in got.items())
