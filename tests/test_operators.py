"""Operator-level tests: dedup family, similarity search, as-of join —
small hand-checkable inputs with planted duplicates/neighbors."""

import math

import pytest
from pyspark.sql import functions as F

from datafusion_archive_spark.operators import asof, dedup, similarity

_BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while the morning sun rises slowly over the quiet green valley "
    "and birds sing softly in the tall old trees by the water"
)

DOCS = [
    (1, _BASE),
    (2, _BASE),  # exact dup of 1
    # near dup of 1: single-word edit in a long doc → Jaccard ≈ 0.92
    (3, _BASE.replace("river", "creek")),
    (4, "completely different content about database query engines and spark"),
    (5, "another unrelated document discussing machine learning pipelines"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_duplicates(docs):
    out = dedup.exact_duplicates(docs).collect()
    by_copies = sorted((r.n_copies, r.keep_id) for r in out)
    assert len(out) == 4  # 1&2 collapse
    assert by_copies[-1] == (2, 1)  # the dup group keeps min id


def test_ngram_jaccard_pairs(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert 0.5 < pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_minhash_lsh_finds_planted_dups(docs):
    # bands=8 (2 rows/band) targets J ≳ 0.5 recall; the default 4×4
    # banding targets J ≳ 0.8 and can deterministically miss a 0.6-0.7
    # pair — banding choice is the recall/candidate-volume dial
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(
            docs, bands=8, threshold=0.25
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical docs agree on all hashes
    assert (1, 3) in pairs  # near dup caught by banding
    assert (4, 5) not in pairs


def test_minhash_more_hashes_tightens_estimate(docs):
    sig = dedup.minhash_signatures(docs, num_hashes=8).collect()
    rows = {r.id: [r[f"mh_{i}"] for i in range(8)] for r in sig}
    assert rows[1] == rows[2]  # identical text → identical signature
    agree_13 = sum(a == b for a, b in zip(rows[1], rows[3]))
    assert agree_13 >= 4  # near-dup shares most minhashes


def test_simhash_identical_and_near(docs):
    sig = {r.id: r.simhash for r in dedup.simhash64(docs).collect()}
    assert sig[1] == sig[2]
    ham_13 = bin(sig[1] ^ sig[3]).count("1")
    ham_14 = bin(sig[1] ^ sig[4]).count("1")
    assert ham_13 < ham_14  # near dup closer than unrelated


def test_simhash_near_pairs_blocking(docs):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_near_pairs(docs, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0


# -- similarity --------------------------------------------------------------

VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
    (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
    (3, [0.7, 0.7, 0.0, 0.0]),   # diagonal
    (4, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
]


@pytest.fixture(scope="module")
def vecs(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(VECS, schema)


def test_cosine_topk_exact(vecs):
    out = similarity.cosine_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=2)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.neighbor_id for r in rows] == [1, 3]
    assert rows[0].cosine == pytest.approx(0.9 / math.sqrt(0.82), abs=1e-6)


def test_cosine_pairs_threshold(vecs):
    pairs = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs(vecs, threshold=0.999).collect()
    }
    assert pairs == set()  # nothing that close (cos(v0,v1) ≈ 0.9939)
    pairs2 = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs(vecs, threshold=0.9).collect()
    }
    assert (0, 1) in pairs2


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    """On real embeddings, multi-probe LSH must recover most of the
    exact top-5 neighbor set."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(e, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_cosine_topk(e, q, k=5, planes=12).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"LSH recall too low: {recall}"


def test_ivf_returns_k_per_query(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 3)
    out = similarity.ivf_topk(e, q, k=5, nprobe=2, centroid_stride=20)
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in counts)


# -- as-of join ---------------------------------------------------------------


def test_asof_join_backward(spark):
    import datetime as dt

    t = dt.datetime
    left = spark.createDataFrame(
        [
            ("u1", t(2024, 1, 1, 10, 0), 100),
            ("u1", t(2024, 1, 1, 12, 0), 101),
            ("u2", t(2024, 1, 1, 9, 0), 200),
        ],
        ["key", "ts", "order_id"],
    )
    right = spark.createDataFrame(
        [
            ("u1", t(2024, 1, 1, 9, 30), 1.0),
            ("u1", t(2024, 1, 1, 11, 0), 2.0),
            ("u1", t(2024, 1, 1, 13, 0), 3.0),
            ("u2", t(2024, 1, 1, 9, 0), 9.0),  # same instant → visible
        ],
        ["key", "ts", "price"],
    )
    out = {
        r.order_id: r.price_asof
        for r in asof.asof_join(
            left, right, "key", "ts", "ts", ["price"]
        ).collect()
    }
    assert out == {100: 1.0, 101: 2.0, 200: 9.0}


# -- range join -------------------------------------------------------------


@pytest.fixture(scope="module")
def range_frames(spark):
    from datetime import datetime as DT

    left = spark.createDataFrame(
        [
            (1, 7, DT(2024, 1, 1, 10, 0, 0)),
            (2, 7, DT(2024, 1, 1, 12, 0, 0)),   # no clicks in window
            (3, 8, DT(2024, 1, 1, 10, 0, 0)),   # other key
            (4, 7, DT(2024, 1, 1, 11, 0, 0)),   # boundary cases
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (7, DT(2024, 1, 1, 9, 30, 0), 1.0),    # in window of e1
            (7, DT(2024, 1, 1, 10, 0, 0), 2.0),    # == l.ts → inclusive
            (7, DT(2024, 1, 1, 9, 0, 0), 4.0),     # == l.ts - 1h → EXCLUDED
            (7, DT(2024, 1, 1, 10, 0, 1), 8.0),    # 1s into e4's window edge
            (9, DT(2024, 1, 1, 9, 45, 0), 16.0),   # wrong key
        ],
        ["user_id", "ts", "value"],
    )
    return left, right


def test_range_join_inner(spark, range_frames):
    from datafusion_archive_spark.operators.range_join import (
        range_join_recent,
    )

    left, right = range_frames
    out = range_join_recent(
        left, right, "user_id", "ts", "ts", 3_600_000_000
    ).collect()
    got = sorted((r.event_id, r.value) for r in out)
    # e1: 9:30 (cross-bucket: 9:30 is in bucket 9, e1 in bucket 10)
    #     and 10:00 (inclusive right edge); 9:00 excluded (open left edge)
    # e4 (11:00): only 10:00:01 — 10:00 sits ON the open left edge
    # (11:00 - 1h) and is excluded; e2, e3: nothing
    assert got == [(1, 1.0), (1, 2.0), (4, 8.0)]


def test_range_join_outer_restore(spark, range_frames):
    from datafusion_archive_spark.operators.range_join import (
        range_join_recent,
    )

    left, right = range_frames
    out = range_join_recent(
        left, right, "user_id", "ts", "ts", 3_600_000_000,
        left_id="event_id",
    ).collect()
    by_event = {}
    for r in out:
        by_event.setdefault(r.event_id, []).append(r.value)
    assert sorted(by_event[1]) == [1.0, 2.0]
    assert by_event[2] == [None]          # restored, null right columns
    assert by_event[3] == [None]
    assert by_event[4] == [8.0]


# -- KMV sketch -------------------------------------------------------------


def test_kmv_accuracy(spark):
    from datafusion_archive_spark.operators.sketch import kmv_distinct

    df = spark.range(2000).select(
        (F.col("id") % 2).cast("string").alias("grp"),
        (F.expr("id div 2") % 700).alias("v"),
    )
    # per group, id div 2 covers 0..999, so v hits all of 0..699 →
    # exact distinct = 700 per group
    out = {r.grp: r for r in kmv_distinct(df, "grp", "v", k=64).collect()}
    for g in ("0", "1"):
        assert out[g].n_kept == 64
        # KMV relative std error ≈ 1/sqrt(k-2) ≈ 12.7%; allow 4σ
        assert abs(out[g].kmv_estimate - 700) / 700 < 0.51


def test_kmv_exact_below_k(spark):
    from datafusion_archive_spark.operators.sketch import kmv_distinct

    df = spark.range(100).select(
        F.lit("g").alias("grp"), (F.col("id") % 7).alias("v")
    )
    r = kmv_distinct(df, "grp", "v", k=32).collect()[0]
    assert r.n_kept == 7 and r.kmv_estimate == 7.0


def test_kmv_mergeability(spark):
    """min-k(A ∪ B) == min-k(min-k(A) ∪ min-k(B)) — the property that
    lets sketch partials merge across partitions/time windows."""
    from datafusion_archive_spark.functions import text as TX
    from datafusion_archive_spark.operators.sketch import kmv_distinct

    k = 16
    whole = spark.range(500).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    est_whole = kmv_distinct(whole, "grp", "v", k=k).collect()[0].kmv_estimate

    # simulate partial sketches: bottom-k hashes of each half, merged
    halves = []
    for lo, hi in ((0, 250), (250, 500)):
        h = (
            spark.range(lo, hi)
            .select(TX.hash64(F.col("id").cast("string"), seed=11).alias("hv"))
            .orderBy("hv")
            .limit(k)
        )
        halves.append(h)
    merged = halves[0].union(halves[1]).orderBy("hv").limit(k).collect()
    u_k = merged[-1].hv / float(1 << 60)
    est_merged = (k - 1) / u_k
    assert abs(est_merged - est_whole) < 1e-9


class TestSpread:
    def test_no_rdd_conversion_for_file_scans(self, spark, sf_dir, monkeypatch):
        """spread() must size file scans from the file index, not by
        forcing a logical->physical conversion via df.rdd — query
        construction has to stay cheap at interactive rates."""
        from pyspark.sql import DataFrame

        from datafusion_archive_spark.operators.util import spread

        df = spark.read.parquet(f"{sf_dir}/documents.parquet")

        def boom(self):
            raise AssertionError("spread() touched df.rdd for a file scan")

        monkeypatch.setattr(DataFrame, "rdd", property(boom))
        out = spread(df)
        assert out.columns == df.columns

    def test_small_scan_is_spread(self, spark, sf_dir):
        from datafusion_archive_spark.operators.util import spread

        df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        target = spark.sparkContext.defaultParallelism
        assert spread(df).rdd.getNumPartitions() >= min(target, 2)

    def test_parse_bytes(self):
        from datafusion_archive_spark.operators.util import _parse_bytes

        assert _parse_bytes("134217728") == 134217728
        assert _parse_bytes("128m") == 128 * 2**20
        assert _parse_bytes("128MB") == 128 * 2**20
        assert _parse_bytes("1g") == 2**30
        assert _parse_bytes("garbage") == 128 * 2**20


class TestProductionHashPath:
    def test_xxhash_finds_planted_near_dups(self, spark, sf_dir):
        """The xxhash64 production path must detect the same planted
        near-duplicates as the oracle md5 path: every pair the exact
        (hash-independent) 3-gram Jaccard rates >= 0.8 must surface
        from xxhash-based MinHash-LSH candidates."""
        from datafusion_archive_spark.functions import text as TX
        from datafusion_archive_spark.operators import dedup

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        planted = {
            (r.id_a, r.id_b)
            for r in dedup.ngram_jaccard_pairs(
                docs, k=3, threshold=0.8, max_shingle_df=50
            ).collect()
        }
        assert planted, "testdata should contain planted near-dups"

        with TX.use_hash("xxhash64"):
            xx_pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
        got = {(r.id_a, r.id_b) for r in xx_pairs.collect()}
        missed = planted - got
        assert not missed, f"xxhash path missed planted pairs: {missed}"

    def test_use_hash_restores_default(self):
        from datafusion_archive_spark.functions import text as TX

        assert TX.HASH_METHOD == "md5"
        with TX.use_hash("xxhash64"):
            assert TX.HASH_METHOD == "xxhash64"
        assert TX.HASH_METHOD == "md5"

        import pytest as _pytest

        with _pytest.raises(ValueError):
            with TX.use_hash("sha1"):
                pass


class TestIvfAtRest:
    def test_index_query_matches_in_memory_and_prunes(
        self, spark, sf_dir, tmp_path_factory
    ):
        """The at-rest IVF index must (a) return exactly the in-memory
        ivf_topk results and (b) actually prune: the probed scan reads
        only the probed lists' partition directories."""
        from datafusion_archive_spark.operators.similarity import (
            ivf_index_write,
            ivf_topk,
            ivf_topk_from_index,
        )
        from datafusion_archive_spark.operators.util import release_caches

        corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = corpus.filter(F.col("vec_id") % 100 == 1).limit(2)
        base = str(tmp_path_factory.mktemp("ivf") / "index")

        ivf_index_write(corpus, base, centroid_stride=20)
        got = ivf_topk_from_index(
            spark, base, queries, k=5, nprobe=2
        )
        got_rows = {tuple(r) for r in got.collect()}
        release_caches()
        want_rows = {
            tuple(r)
            for r in ivf_topk(
                corpus, queries, k=5, nprobe=2, centroid_stride=20
            ).collect()
        }
        release_caches()
        assert got_rows == want_rows

        # pruning: the probed IN-list must reach the lists scan as a
        # PartitionFilter (directory pruning), covering fewer lists
        # than exist on disk
        import os
        import re as _re

        from datafusion_archive_spark.plans import summarize

        all_lists = [
            d for d in os.listdir(f"{base}/lists") if d.startswith("list_id=")
        ]
        probed = ivf_topk_from_index(spark, base, queries, k=5, nprobe=2)
        s = summarize(probed)
        pf = ";".join(s.partition_filters)
        release_caches()
        assert "list_id" in pf, s.partition_filters
        probed_ids = set(_re.findall(r"\b(\d+)\b", pf))
        assert 0 < len(probed_ids) < len(all_lists), (pf, len(all_lists))
