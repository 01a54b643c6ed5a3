"""Round-5 wave-2 semantics: Markov transitions, mixture weights, PII
redaction, passage-level dedup, and the self-trained perplexity filter
(datafusion_archive_spark/queries/pipeline4.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datafusion_archive_spark.queries import pipeline4 as P4
from datafusion_archive_spark.queries import pipeline5 as P5

SF = "/root/testdata/sf0.001"


class TestEventsTransitions:
    def test_probabilities_normalize_per_row(self, spark):
        rows = P4.q_events_transitions(spark, SF).collect()
        assert rows
        by_from = {}
        for r in rows:
            by_from.setdefault(r.from_type, 0.0)
            by_from[r.from_type] += r.p
            assert 0.0 < r.p <= 1.0
        for ft, tot in by_from.items():
            # per-pair half-up rounding at 6dp: row sums drift by at
            # most n_pairs * 5e-7
            assert tot == pytest.approx(1.0, abs=1e-4), ft

    def test_counts_match_manual_lag(self, spark):
        e = (
            spark.read.parquet(f"{SF}/events.parquet")
            .orderBy("user_id", "ts", "event_id")
            .collect()
        )
        manual = {}
        for a, b in zip(e, e[1:]):
            if a.user_id == b.user_id:
                k = (a.event_type, b.event_type)
                manual[k] = manual.get(k, 0) + 1
        got = {
            (r.from_type, r.to_type): r.n_transitions
            for r in P4.q_events_transitions(spark, SF).collect()
        }
        assert got == manual


class TestMixtureWeights:
    def test_weights_sum_to_one_and_boost_flips_at_mean(self, spark):
        rows = P4.q_mixture_weights(spark, SF).collect()
        assert sum(r.weight for r in rows) == pytest.approx(1.0, abs=1e-4)
        # temperature < 1 up-weights tail languages and down-weights
        # the head: boost must be anti-monotone in token mass
        by_mass = sorted(rows, key=lambda r: r.n_tokens)
        boosts = [r.boost for r in by_mass]
        assert boosts == sorted(boosts, reverse=True)

    def test_alpha_half_closed_form(self, spark):
        rows = P4.q_mixture_weights(spark, SF).collect()
        tot_sqrt = sum(math.sqrt(r.n_tokens) for r in rows)
        for r in rows:
            assert r.weight == pytest.approx(
                math.sqrt(r.n_tokens) / tot_sqrt, abs=1e-5
            )


class TestPiiRedact:
    def test_no_pii_survives_redaction(self, spark):
        rows = P4.q_pii_redact(spark, SF).collect()
        assert rows
        for r in rows:
            assert r.n_emails == 1 and r.n_phones == 1
            assert "<EMAIL>" in r.redacted and "<PHONE>" in r.redacted
            assert "@" not in r.redacted
            assert "+1-555-" not in r.redacted

    def test_redaction_kernel_on_freeform_text(self, spark):
        # the registered query builds its PII deterministically; the
        # kernel itself must also catch PII embedded in arbitrary prose
        df = spark.createDataFrame(
            [Row(t="mail bob.smith@corp.io or call +1-555-0199 now")]
        )
        out = df.select(
            F.regexp_replace(
                F.regexp_replace(F.col("t"), P4._EMAIL_RE, "<EMAIL>"),
                P4._PHONE_RE,
                "<PHONE>",
            ).alias("r")
        ).first()
        assert out.r == "mail <EMAIL> or call <PHONE> now"


class TestDedupPassages:
    def test_unaligned_copy_is_invisible_to_fixed_windows(self, spark):
        # fixed non-overlapping windows only fire when the shared text
        # lands on the same window boundary in both docs — a passage
        # copied at a 12-word offset is NOT detected (that's the
        # documented trade-off vs the shingle-based containment query)
        passage = " ".join(f"tok{i}" for i in range(10))
        docs = [
            Row(doc_id=1, text=passage + " " + "filler one " * 5),
            Row(doc_id=2, text="other words here " * 4 + passage),
            Row(doc_id=3, text="completely unrelated words " * 7),
        ]
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(docs).write.mode("overwrite").parquet(
                f"{td}/documents.parquet"
            )
            out = {
                r.doc_id: r
                for r in P4.q_dedup_passages(spark, td).collect()
            }
        assert out[1].n_shared == 0  # offset 0 vs offset 12: no match
        assert out[2].n_shared == 0
        assert out[3].n_shared == 0
        assert out[1].n_passages >= 1

    def test_aligned_duplicates_flagged_symmetrically(self, spark):
        passage = " ".join(f"tok{i}" for i in range(10))
        tail = " ".join(f"fill{i}" for i in range(10))
        docs = [
            Row(doc_id=1, text=passage + " " + tail),
            Row(doc_id=2, text=passage + " " + " ".join(f"x{i}" for i in range(10))),
            Row(doc_id=3, text=tail + " " + " ".join(f"y{i}" for i in range(10))),
        ]
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(docs).write.mode("overwrite").parquet(
                f"{td}/documents.parquet"
            )
            out = {
                r.doc_id: r
                for r in P4.q_dedup_passages(spark, td).collect()
            }
        # doc 1 shares window 0 with doc 2 AND window 1 with doc 3
        assert out[1].n_shared == 2 and out[1].shared_ratio == 1.0
        assert out[2].n_shared == 1 and out[2].n_passages == 2
        assert out[3].n_shared == 1


class TestPerplexityBigram:
    def test_rare_bigram_doc_ranks_most_surprising(self, spark):
        # 20 docs repeat the same fluent bigrams; one doc is the same
        # vocabulary scrambled into bigrams seen nowhere else — the
        # scrambled doc must rank #1 by avg negative log-likelihood
        fluent = "the quick brown fox jumps over the lazy dog again "
        docs = [Row(doc_id=i, text=fluent * 3) for i in range(20)]
        docs.append(
            Row(doc_id=99, text="dog the over fox lazy quick jumps brown again the")
        )
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(docs).write.mode("overwrite").parquet(
                f"{td}/documents.parquet"
            )
            rows = P4.q_perplexity_bigram(spark, td).collect()
        assert rows[0].doc_id == 99
        assert rows[0].avg_nll > rows[-1].avg_nll

    def test_smoothed_probability_identity(self, spark):
        # two docs, tiny corpus: check one term against the closed form
        docs = [Row(doc_id=1, text="a b a b"), Row(doc_id=2, text="a b c")]
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(docs).write.mode("overwrite").parquet(
                f"{td}/documents.parquet"
            )
            rows = {
                r.doc_id: r
                for r in P4.q_perplexity_bigram(spark, td).collect()
            }
        # corpus: tokens a×3 b×3 c×1, V=3; doc 2 bigrams: (a b), (b c)
        # c(a)=3, c(a b)=3 -> nll1 = ln(3+3) - ln(3+1)
        # c(b)=3, c(b c)=1 -> nll2 = ln(3+3) - ln(1+1)
        exp = (
            (math.log(6) - math.log(4)) + (math.log(6) - math.log(2))
        ) / 2
        assert rows[2].avg_nll == pytest.approx(exp, abs=1e-3)
        assert rows[2].n_bigrams == 2


class TestBpeMerges:
    """Differential pin of the iterative BPE trainer
    (operators/bpe.py) against a pure-Python reference."""

    @staticmethod
    def _ref_bpe(word_freqs, n_merges):
        syms = {}
        for w, f in word_freqs.items():
            key = tuple(w) + ("</w>",)
            syms[key] = syms.get(key, 0) + f
        merges = []
        for i in range(n_merges):
            pc = {}
            for ws, f in syms.items():
                for a, b in zip(ws, ws[1:]):
                    pc[(a, b)] = pc.get((a, b), 0) + f
            if not pc:
                break
            (left, right), n = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
            )
            merges.append((i, left, right, n))
            new = {}
            for ws, f in syms.items():
                out, j = [], 0
                while j < len(ws):
                    if (
                        j < len(ws) - 1
                        and ws[j] == left
                        and ws[j + 1] == right
                    ):
                        out.append(ws[j] + ws[j + 1])
                        j += 2
                    else:
                        out.append(ws[j])
                        j += 1
                new[tuple(out)] = new.get(tuple(out), 0) + f
            syms = new
        return merges

    def test_matches_reference_on_corpus(self, spark):
        from datafusion_archive_spark.operators import bpe

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        wf = {
            r.word: r.freq
            for r in bpe.word_frequencies(docs).collect()
        }
        expected = self._ref_bpe(wf, 8)
        got = [
            tuple(r)
            for r in bpe.bpe_merge_table(spark, docs, n_merges=8).collect()
        ]
        assert got == expected

    def test_classic_example(self, spark):
        from pyspark.sql import Row

        from datafusion_archive_spark.operators import bpe

        docs = spark.createDataFrame(
            [Row(text="low lower lowest low low newer newest new")]
        )
        got = [
            tuple(r)
            for r in bpe.bpe_merge_table(spark, docs, n_merges=4).collect()
        ]
        assert got[:2] == [(0, "l", "o", 5), (1, "lo", "w", 5)]

    def test_greedy_left_nonoverlapping_merge(self, spark):
        # "aaaa" under merge (a,a) must become "aa aa", not "aa a a"
        from pyspark.sql import Row

        from datafusion_archive_spark.operators import bpe

        docs = spark.createDataFrame([Row(text="aaaa aaaa aaaa")])
        got = [
            tuple(r)
            for r in bpe.bpe_merge_table(spark, docs, n_merges=2).collect()
        ]
        assert got[0] == (0, "a", "a", 9)
        # second merge: each word is now "aa aa </w>" -> (aa,aa)=3,
        # (aa,</w>)=3; tie breaks on the pair string: "aa </w>" < "aa aa"
        assert got[1] == (1, "aa", "</w>", 3)


class TestCurationFunnel:
    def test_funnel_is_monotone_and_stages_match_parts(self, spark):
        from datafusion_archive_spark.queries import llm, pipeline3

        rows = {
            r.stage: r
            for r in P5.q_curation_funnel(spark, SF).collect()
        }
        assert [rows[i].stage_name for i in range(4)] == [
            "raw",
            "after_exact_dedup",
            "after_quality_gate",
            "after_decontamination",
        ]
        # monotone shrink
        for i in range(3):
            assert rows[i].n_docs >= rows[i + 1].n_docs
            assert rows[i].n_tokens >= rows[i + 1].n_tokens
        # stage 0 is the corpus; stage 1 matches the certified
        # standalone dedup row's distinct-content count
        n_raw = spark.read.parquet(f"{SF}/documents.parquet").count()
        assert rows[0].n_docs == n_raw
        n_distinct = llm.q_dedup_exact(spark, SF).count()
        assert rows[1].n_docs == n_distinct

    def test_quality_stage_agrees_with_standalone_gate(self, spark):
        from datafusion_archive_spark.queries import llm, pipeline3

        rows = {
            r.stage: r
            for r in P5.q_curation_funnel(spark, SF).collect()
        }
        keep_ids = {
            r.doc_id
            for r in pipeline3.q_quality_filter_pipeline(spark, SF)
            .filter("keep")
            .collect()
        }
        surv_ids = {
            r.keep_id for r in llm.q_dedup_exact(spark, SF).collect()
        }
        assert rows[2].n_docs == len(keep_ids & surv_ids)


class TestQualityQuantileNorm:
    def test_rank_bounds_and_order(self, spark):
        rows = P5.q_quality_quantile_norm(spark, SF).collect()
        assert rows
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r.lang, []).append(r)
        for lang, rs in by_lang.items():
            rs.sort(key=lambda r: r.quality)
            assert rs[0].q_rank == 0.0
            assert rs[-1].q_rank <= 1.0
            # ranks are non-decreasing in the score
            ranks = [r.q_rank for r in rs]
            assert ranks == sorted(ranks)

    def test_ties_share_a_rank(self, spark):
        rows = P5.q_quality_quantile_norm(spark, SF).collect()
        seen = {}
        for r in rows:
            key = (r.lang, r.quality)
            if key in seen:
                assert seen[key] == r.q_rank
            seen[key] = r.q_rank


class TestSnapshotDiff:
    def test_classification_matches_manual_diff(self, spark):
        a = {
            r.o_orderkey: r.o_totalprice
            for r in spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey", "o_totalprice")
            .collect()
        }
        b = {}
        for k, p in a.items():
            if k % P5._DEL_MOD == 0:
                continue
            b[k] = p * 1.1 if k % P5._UPD_MOD == 0 else p
        for k, p in a.items():
            if k % P5._INS_MOD == 0:
                b[k + P5._INS_OFFSET] = p
        manual = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
        for k in set(a) | set(b):
            if k not in a:
                manual["added"] += 1
            elif k not in b:
                manual["removed"] += 1
            elif a[k] != b[k]:
                manual["changed"] += 1
            else:
                manual["unchanged"] += 1
        got = {
            r.change_type: r.n_rows
            for r in P5.q_snapshot_diff(spark, SF).collect()
        }
        assert got == {k: v for k, v in manual.items() if v > 0}


class TestKMeans:
    """Distributed Lloyd's trainer (operators/kmeans.py) pinned
    differentially against NumPy with identical deterministic
    seeding, plus objective monotonicity and IVF integration."""

    @staticmethod
    def _ref_kmeans(X, k, n_iters):
        import numpy as np

        cents = X[:k].copy()  # ids are 0..n-1 in fixture order
        for _ in range(n_iters):
            d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            lab = d.argmin(axis=1)  # ties -> lowest index, like the
            # operator's (dist, list_id) ordering
            for i in range(k):
                if (lab == i).any():
                    cents[i] = X[lab == i].mean(axis=0)
        # final labels against the FINAL centroids (kmeans_assign runs
        # after training, not as part of the last iteration)
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return cents, d.argmin(axis=1)

    @staticmethod
    def _fixture(spark, n=90, dim=8, seed=3):
        import numpy as np
        from pyspark.sql import Row

        rng = np.random.RandomState(seed)
        X = rng.normal(size=(n, dim))
        df = spark.createDataFrame(
            [
                Row(vec_id=i, embedding=[float(x) for x in X[i]])
                for i in range(n)
            ]
        )
        return X, df

    def test_matches_numpy_lloyds(self, spark):
        import numpy as np

        from datafusion_archive_spark.operators import kmeans as KM

        X, df = self._fixture(spark)
        cents = KM.kmeans_train(df, k=4, n_iters=4)
        ref_cents, ref_lab = self._ref_kmeans(X, 4, 4)
        assert np.allclose(np.array(cents), ref_cents, atol=1e-9)
        got = {
            r.pid: r.list_id
            for r in KM.kmeans_assign(df, cents).collect()
        }
        assert [got[i] for i in range(len(X))] == list(ref_lab)

    def test_inertia_non_increasing(self, spark):
        from datafusion_archive_spark.operators import kmeans as KM

        _, df = self._fixture(spark, seed=11)
        inertias = []
        for iters in (1, 3, 6):
            cents = KM.kmeans_train(df, k=4, n_iters=iters)
            inertias.append(
                KM.kmeans_inertia(KM.kmeans_assign(df, cents))
            )
        assert inertias[0] >= inertias[1] >= inertias[2]

    def test_recovers_planted_clusters(self, spark):
        # trained centroids must put each planted cluster in its own
        # cell — the IVF regime the stride-seeding rule only gets by
        # fixture construction
        import numpy as np
        from pyspark.sql import Row

        from datafusion_archive_spark.operators import kmeans as KM

        rng = np.random.RandomState(5)
        centers = rng.normal(size=(4, 16)) * 3
        rows = []
        for cid in range(4):
            for j in range(25):
                p = centers[cid] + 0.1 * rng.normal(size=16)
                # round-robin ids: the deterministic smallest-id
                # seeding then starts with one point from each
                # planted cluster (a reasonable init; pathological
                # all-seeds-in-one-cluster inits are a known Lloyd's
                # failure mode, not what this test pins)
                rows.append(
                    Row(
                        vec_id=j * 4 + cid,
                        embedding=[float(x) for x in p],
                    )
                )
        df = spark.createDataFrame(rows)
        cents = KM.kmeans_train(df, k=4, n_iters=6)
        lab = {
            r.pid: r.list_id
            for r in KM.kmeans_assign(df, cents).collect()
        }
        for cid in range(4):
            cluster_labels = {lab[j * 4 + cid] for j in range(25)}
            assert len(cluster_labels) == 1, f"cluster {cid} split"
        assert len({lab[cid] for cid in range(4)}) == 4


class TestProductQuantization:
    """PQ compression (operators/pq.py): encode/decode contract,
    recall vs exact search on planted clusters, and the map-only
    encoding plan shape."""

    DIM, M, KSUB, K = 16, 4, 8, 5

    @pytest.fixture(scope="class")
    def planted_pq(self, spark):
        import numpy as np

        rng = np.random.RandomState(9)
        centers = rng.normal(size=(6, self.DIM)) * 3
        rows = []
        for cid in range(6):
            for j in range(20):
                p = centers[cid] + 0.1 * rng.normal(size=self.DIM)
                rows.append(
                    Row(
                        vec_id=j * 6 + cid,
                        embedding=[float(x) for x in p],
                    )
                )
        corpus = spark.createDataFrame(rows).coalesce(4)
        queries = corpus.filter(F.col("vec_id") < 6)
        return corpus, queries

    def test_codes_are_m_small_ints(self, spark, planted_pq):
        from datafusion_archive_spark.operators import pq as PQ

        corpus, _ = planted_pq
        books = PQ.pq_train(corpus, m=self.M, ksub=self.KSUB)
        codes = PQ.pq_encode(corpus, books)
        rows = codes.collect()
        assert len(rows) == corpus.count()
        for r in rows:
            assert len(r.codes) == self.M
            assert all(0 <= c < self.KSUB for c in r.codes)

    @pytest.mark.slow
    def test_adc_recall_vs_exact_euclidean(self, spark, planted_pq):
        # ground truth: exact squared-euclidean top-k (PQ's metric).
        # finer codebooks (m=8 x ksub=32 over dim 16) resolve
        # within-cluster structure, not just cluster identity
        import collections as C

        import numpy as np

        from datafusion_archive_spark.operators import pq as PQ

        corpus, queries = planted_pq
        vecs = {
            r.vec_id: np.array(r.embedding) for r in corpus.collect()
        }
        exact = {}
        for qid in [r.vec_id for r in queries.collect()]:
            d = {
                pid: float(((vecs[qid] - v) ** 2).sum())
                for pid, v in vecs.items()
                if pid != qid
            }
            exact[qid] = set(sorted(d, key=lambda p: (d[p], p))[: self.K])
        books = PQ.pq_train(corpus, m=8, ksub=32)
        codes = PQ.pq_encode(corpus, books)

        def recall(df):
            approx = C.defaultdict(set)
            for r in df.collect():
                approx[r.query_id].add(r.neighbor_id)
            hits = total = 0
            for qid, truth in exact.items():
                total += len(truth)
                hits += len(truth & approx[qid])
            return hits / total

        raw = recall(PQ.pq_topk(codes, queries, books, k=self.K))
        refined = recall(
            PQ.pq_topk_refined(codes, corpus, queries, books, k=self.K)
        )
        # raw ADC is capped by quantization error on tight clusters;
        # the shortlist-refine pattern recovers near-exact recall
        assert raw >= 0.5, f"raw ADC recall {raw}"
        assert refined >= 0.9, f"refined recall {refined}"
        assert refined >= raw

    def test_coarse_codes_identify_planted_clusters(self, spark, planted_pq):
        # at coarse quantization (m=4 x ksub=8) PQ still nails the
        # cluster: every returned neighbor shares the query's planted
        # cluster (vec_id % 6)
        from datafusion_archive_spark.operators import pq as PQ

        corpus, queries = planted_pq
        books = PQ.pq_train(corpus, m=self.M, ksub=self.KSUB)
        codes = PQ.pq_encode(corpus, books)
        for r in PQ.pq_topk(codes, queries, books, k=self.K).collect():
            assert r.neighbor_id % 6 == r.query_id % 6

    def test_encoding_is_map_only(self, spark, planted_pq):
        from datafusion_archive_spark.operators import pq as PQ
        from datafusion_archive_spark.plans import summarize

        corpus, _ = planted_pq
        books = PQ.pq_train(corpus, m=self.M, ksub=self.KSUB)
        s = summarize(PQ.pq_encode(corpus, books))
        assert s.n_hash_exchanges == 0, s.raw
        assert not s.joins


class TestIvfKmeans:
    def test_trained_centroids_beat_stride_on_shuffled_ids(self, spark):
        """When vector ids carry no cluster structure, the id-stride
        centroid rule seeds arbitrarily while trained centroids still
        recover the planted clusters: k-means IVF recall must be high
        AND at least match the stride variant on the same corpus."""
        import collections as C

        import numpy as np

        from datafusion_archive_spark.operators import similarity as S

        rng = np.random.RandomState(13)
        centers = rng.normal(size=(6, 16))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        rows = []
        # shuffled ids: cluster membership is NOT recoverable from id
        perm = rng.permutation(120)
        i = 0
        for cid in range(6):
            for _ in range(20):
                p = centers[cid] + 0.05 * rng.normal(size=16)
                rows.append(
                    Row(
                        vec_id=int(perm[i]),
                        embedding=[float(x) for x in p],
                    )
                )
                i += 1
        corpus = spark.createDataFrame(rows).coalesce(4)
        queries = corpus.filter(F.col("vec_id") < 6)

        def neighbor_sets(df):
            out = C.defaultdict(set)
            for r in df.collect():
                out[r.query_id].add(r.neighbor_id)
            return out

        def recall(approx, exact):
            hits = total = 0
            for qid, truth in exact.items():
                total += len(truth)
                hits += len(truth & approx.get(qid, set()))
            return hits / total

        exact = neighbor_sets(S.cosine_topk(corpus, queries, k=5))
        r_kmeans = recall(
            neighbor_sets(
                S.ivf_topk_kmeans(
                    corpus, queries, k=5, nprobe=2, n_lists=6
                )
            ),
            exact,
        )
        r_stride = recall(
            neighbor_sets(
                S.ivf_topk(
                    corpus, queries, k=5, nprobe=2, centroid_stride=20
                )
            ),
            exact,
        )
        assert r_kmeans >= 0.9, f"kmeans-IVF recall {r_kmeans}"
        assert r_kmeans >= r_stride
