"""Round-5 regressions: dtype-strict local oracle gate, xxhash NULL
semantics, upsert-sink crash safety, the heavy-hitters batch twin, and
ANN recall on planted clusters."""

from __future__ import annotations

import collections
import os
import sys

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")

from check_oracle import normalize, typed_value, value_repr  # noqa: E402


class TestCheckOracleDtypeStrict:
    """The round-4 postmortem: two driver rows shipped red because the
    local gate compared values with ``==`` (0 == 0.0). The gate must
    now reproduce the driver's dtype-sensitive hash semantics."""

    def test_int_vs_float_mismatch_fails(self):
        s = pd.DataFrame({"a": pd.array([0, 1], dtype="int64")})
        o = pd.DataFrame({"a": pd.array([0.0, 1.0], dtype="float64")})
        assert value_repr(normalize(s)) != value_repr(normalize(o))

    def test_identical_dtypes_pass(self):
        s = pd.DataFrame({"a": [0, 1], "b": ["x", None]})
        o = pd.DataFrame({"a": [1, 0], "b": [None, "x"]})
        assert value_repr(normalize(s)) == value_repr(normalize(o))

    def test_bool_is_not_int(self):
        assert typed_value(True) != typed_value(1)

    def test_numpy_and_python_scalars_unify(self):
        assert typed_value(np.int64(7)) == typed_value(7)
        assert typed_value(np.float64(7.5)) == typed_value(7.5)

    def test_int32_and_int64_unify(self):
        # the driver hashes VALUES by type class, not by width: Spark
        # int vs long both arrive as Python ints after normalization
        assert typed_value(np.int32(3)) == typed_value(np.int64(3))

    def test_null_forms_unify(self):
        assert typed_value(None) == typed_value(float("nan"))


class TestHash64NullSemantics:
    def test_xxhash_null_input_hashes_to_null(self, spark):
        """Advice r4: bare F.xxhash64(c, seed) IGNORES a NULL column
        and returns the seed hash — every null-text doc would share
        one fingerprint, silently changing dedup grouping vs the md5
        family (which yields NULL). Both families must agree: NULL in,
        NULL out."""
        from datafusion_archive_spark.functions import text as TX

        df = spark.createDataFrame(
            [Row(s="alpha"), Row(s=None), Row(s="beta"), Row(s=None)]
        )
        md5_rows = df.select(TX.hash64(F.col("s")).alias("h")).collect()
        with TX.use_hash("xxhash64"):
            xx = df.select(TX.hash64(F.col("s")).alias("h"))
        xx_rows = xx.collect()
        assert [r.h is None for r in md5_rows] == [False, True, False, True]
        assert [r.h is None for r in xx_rows] == [False, True, False, True]
        # non-null hashes stay deterministic and 60-bit positive
        non_null = [r.h for r in xx_rows if r.h is not None]
        assert len(set(non_null)) == 2
        assert all(0 <= h < (1 << 60) for h in non_null)

    def test_certified_build_rejects_use_hash_scope(self, spark, sf_dir):
        """Certified queries bake hashes into their plans at build
        time; building one inside use_hash('xxhash64') would certify
        non-oracle-reproducible fingerprints. The registry wrapper
        must refuse."""
        from datafusion_archive_spark.functions import text as TX
        from datafusion_archive_spark.queries import QUERIES

        with TX.use_hash("xxhash64"):
            with pytest.raises(RuntimeError, match="use_hash"):
                QUERIES["text_fingerprint"](spark, sf_dir)


class TestUpsertSinkCrashSafety:
    def test_failed_swap_rolls_back(self, spark, tmp_path, monkeypatch):
        """A crash between the two renames must not strand the table
        under __old: the sink rolls the rename back so readers never
        see a missing target (ADVICE r4, sinks.py swap)."""
        from datafusion_archive_spark.streaming.sinks import ParquetUpsertSink

        target = str(tmp_path / "tbl")
        sink = ParquetUpsertSink(spark, target, key="k")
        b0 = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")])
        sink(b0, 0)
        assert {r.k for r in sink.read().collect()} == {1, 2}

        real_rename = os.rename

        def failing_rename(src, dst):
            if src.endswith("__tmp"):
                raise OSError("injected crash mid-swap")
            return real_rename(src, dst)

        monkeypatch.setattr(os, "rename", failing_rename)
        b1 = spark.createDataFrame([Row(k=2, v="B"), Row(k=3, v="c")])
        with pytest.raises(OSError, match="injected"):
            sink(b1, 1)
        monkeypatch.undo()
        # the pre-batch table must still be intact and readable
        assert {(r.k, r.v) for r in sink.read().collect()} == {
            (1, "a"),
            (2, "b"),
        }
        # and a subsequent healthy batch converges normally
        sink(b1, 2)
        assert {(r.k, r.v) for r in sink.read().collect()} == {
            (1, "a"),
            (2, "B"),
            (3, "c"),
        }


def test_heavy_hitters_streaming_matches_certified_batch_twin(
    spark, sf_dir, tmp_path_factory
):
    """The certified ``heavy_hitters_topk`` row IS the exactness
    contract for the streaming space-saving sketch: with capacity
    above the distinct-token cardinality the final streaming state
    must equal the certified batch query (same k, same tie-break)."""
    from datafusion_archive_spark.functions import text as TX
    from datafusion_archive_spark.queries.pipeline3 import (
        _HH_K,
        q_heavy_hitters_topk,
    )
    from datafusion_archive_spark.streaming.stateful import (
        streaming_heavy_hitters,
    )

    expected = collections.defaultdict(list)
    for r in q_heavy_hitters_topk(spark, sf_dir).collect():
        expected[r.lang].append((r.token, r.cnt))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "lang",
        F.explode(F.split(TX.normalize_text(F.col("text")), " ")).alias(
            "token"
        ),
    ).filter(F.col("token") != "")
    src = str(tmp_path_factory.mktemp("hh_twin") / "tokens")
    toks.coalesce(3).write.parquet(src)

    stream = spark.readStream.schema(toks.schema).parquet(src)
    q = (
        streaming_heavy_hitters(stream, k=_HH_K, capacity=100_000)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("hh_twin_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM hh_twin_out").collect()
    finally:
        q.stop()
    best = collections.defaultdict(dict)
    for r in rows:  # update mode: counts only grow, max is final
        if r.cnt >= best[r.lang].get(r.token, 0):
            best[r.lang][r.token] = r.cnt
    final = {
        lang: sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[:_HH_K]
        for lang, d in best.items()
    }
    assert dict(final) == dict(expected)


class TestAnnRecallPlantedClusters:
    """Measured recall on CLUSTERED embeddings (the testdata tables
    are uniform-random, where sublinear ANN recall is inherently
    weak — PERF.md). Planted Gaussian clusters give LSH/IVF their
    design regime; these asserts fail if bands x bits-per-band or
    nprobe are degraded."""

    DIM = 32
    N_CLUSTERS = 8
    PER_CLUSTER = 30
    K = 5

    @pytest.fixture(scope="class")
    def planted(self, spark):
        rng = np.random.RandomState(7)
        centers = rng.normal(size=(self.N_CLUSTERS, self.DIM))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        rows = []
        for cid in range(self.N_CLUSTERS):
            pts = centers[cid] + 0.05 * rng.normal(
                size=(self.PER_CLUSTER, self.DIM)
            )
            for j, p in enumerate(pts):
                # sequential per-cluster ids: cluster c owns
                # [c*PER_CLUSTER, (c+1)*PER_CLUSTER) — so IVF's
                # id % PER_CLUSTER == 0 centroid rule seeds exactly
                # one centroid per planted cluster
                vid = cid * self.PER_CLUSTER + j
                rows.append(
                    Row(vec_id=vid, embedding=[float(x) for x in p])
                )
        corpus = spark.createDataFrame(rows).coalesce(4)
        # one query per cluster (the j == 1 member of each)
        queries = corpus.filter(F.col("vec_id") % self.PER_CLUSTER == 1)
        return corpus, queries

    @staticmethod
    def _neighbor_sets(df):
        out = collections.defaultdict(set)
        for r in df.collect():
            out[r.query_id].add(r.neighbor_id)
        return out

    def _recall(self, approx, exact):
        hits = total = 0
        for qid, truth in exact.items():
            total += len(truth)
            hits += len(truth & approx.get(qid, set()))
        return hits / total

    def test_lsh_recall_at_k(self, planted):
        from datafusion_archive_spark.operators import similarity as S

        corpus, queries = planted
        exact = self._neighbor_sets(
            S.cosine_topk(corpus, queries, k=self.K)
        )
        approx = self._neighbor_sets(
            S.lsh_cosine_topk(
                corpus, queries, k=self.K, planes=16, bands=4, dim=self.DIM
            )
        )
        assert self._recall(approx, exact) >= 0.9

    def test_ivf_recall_and_nprobe_monotonic(self, planted):
        from datafusion_archive_spark.operators import similarity as S

        corpus, queries = planted
        exact = self._neighbor_sets(
            S.cosine_topk(corpus, queries, k=self.K)
        )
        # centroid ids are vec_id % stride == 0: sequential ids +
        # stride=PER_CLUSTER seed one centroid per planted cluster
        r_probe2 = self._recall(
            self._neighbor_sets(
                S.ivf_topk(
                    corpus, queries, k=self.K,
                    nprobe=2, centroid_stride=self.PER_CLUSTER,
                )
            ),
            exact,
        )
        r_probe1 = self._recall(
            self._neighbor_sets(
                S.ivf_topk(
                    corpus, queries, k=self.K,
                    nprobe=1, centroid_stride=self.PER_CLUSTER,
                )
            ),
            exact,
        )
        assert r_probe2 >= 0.9
        assert r_probe2 >= r_probe1


def test_containment_detects_doc_in_doc(spark):
    """The semantics containment adds over Jaccard: a short document
    embedded verbatim at the head of a long one must score
    containment 1.0 (every short-doc shingle appears in the long doc)
    while Jaccard stays low (union dominated by the long doc)."""
    from datafusion_archive_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"word{i}" for i in range(80))
    rows = [
        Row(doc_id=1, text=short),
        Row(doc_id=2, text=short + " " + filler),
        Row(doc_id=3, text="totally unrelated content about other things"),
    ]
    df = spark.createDataFrame(rows)
    cont = {
        (r.id_a, r.id_b): (r.cont_a_in_b, r.cont_b_in_a)
        for r in containment_pairs(df, k=3, threshold=0.9).collect()
    }
    assert cont[(1, 2)][0] == 1.0  # short fully inside long
    assert cont[(1, 2)][1] < 0.1  # long barely inside short
    jac = ngram_jaccard_pairs(df, k=3, threshold=0.5).collect()
    assert not [r for r in jac if {r.id_a, r.id_b} == {1, 2}], (
        "Jaccard must NOT flag the asymmetric pair at 0.5"
    )


def test_salted_sampler_equals_unsalted_on_skewed_corpus(
    spark, tmp_path_factory
):
    """The skew escape hatch must be semantics-free where it matters:
    on a corpus that is ~90% one language, the salted two-phase top-k
    returns EXACTLY the same sample as the single-window formulation."""
    from datafusion_archive_spark.queries.pipeline2 import (
        q_weighted_sample_per_lang,
    )
    from datafusion_archive_spark.queries.pipeline3 import (
        q_weighted_sample_per_lang_salted,
    )

    rows = []
    for i in range(3000):
        lang = "en" if i % 10 else ("de" if i % 20 else "fr")
        rows.append(
            Row(
                doc_id=i,
                text=f"document number {i} " + "filler words here " * (i % 7),
                lang=lang,
                source="synthetic",
                n_chars=20,
            )
        )
    base = str(tmp_path_factory.mktemp("skewed"))
    spark.createDataFrame(rows).write.parquet(f"{base}/documents.parquet")

    unsalted = sorted(
        map(tuple, q_weighted_sample_per_lang(spark, base).collect())
    )
    salted = sorted(
        map(tuple, q_weighted_sample_per_lang_salted(spark, base).collect())
    )
    assert salted == unsalted
    assert len(salted) == 60  # 20 per language, 3 languages
