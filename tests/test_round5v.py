"""Round-5 wave-26 semantics: LSH banding tuning curve
(datafusion_archive_spark/queries/pipeline28.py)."""

from __future__ import annotations

import math

from datafusion_archive_spark.queries import pipeline28 as P28

SF = "/root/testdata/sf0.001"


class TestTuningCurve:
    def test_curve_shape(self, spark):
        rows = {r.bands: r for r in P28.q_lsh_tuning_curve(spark, SF).collect()}
        assert set(rows) == set(P28._CONFIGS)
        # theory: capture probability at s=0.5 rises with band count
        probs = [rows[b].capture_prob_at_05 for b in sorted(rows)]
        assert probs == sorted(probs)
        for b, r in rows.items():
            want = 1 - (1 - P28._S_PROBE ** (P28._N_MINHASH // b)) ** b
            assert math.isclose(r.capture_prob_at_05, want, abs_tol=1e-6)
        # measurement: candidates grow (weakly) with bands — more
        # bands = looser buckets = more candidate pairs
        cands = [rows[b].n_candidates for b in sorted(rows)]
        assert cands == sorted(cands)
        for r in rows.values():
            assert 0 <= r.n_verified <= r.n_candidates

    def test_certified_config_consistent(self, spark):
        """The 4x4 row's verified count equals the certified
        dedup_minhash_lsh pair count at the same threshold."""
        from datafusion_archive_spark.operators import dedup

        rows = {r.bands: r for r in P28.q_lsh_tuning_curve(spark, SF).collect()}
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        certified = dedup.minhash_lsh_pairs(
            docs, num_hashes=16, bands=4, k=3, threshold=P28._VERIFY_T
        ).count()
        assert rows[4].n_verified == certified
