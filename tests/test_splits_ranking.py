"""Tests for the train/val/test splitter, BM25 ranking, and the
edit-distance dedup blocker added late in round 2."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datafusion_archive_spark.functions.ranking import bm25_topk
from datafusion_archive_spark.operators.dedup import editdistance_pairs
from datafusion_archive_spark.operators.splits import (
    assign_splits,
    split_column,
    split_report,
)

SF = "/root/testdata/sf0.01"


def test_assign_splits_stable_across_partitioning(spark):
    """The whole point of hash splits: repartitioning (a different
    cluster layout) must not migrate any document between splits."""
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    a = assign_splits(d).collect()
    b = assign_splits(d.repartition(7, "doc_id")).collect()
    assert sorted((r.doc_id, r.split) for r in a) == sorted(
        (r.doc_id, r.split) for r in b
    )


def test_assign_splits_ratios_and_exhaustive(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    n = d.count()
    counts = dict(
        assign_splits(d)
        .groupBy("split")
        .count()
        .rdd.map(lambda r: (r["split"], r["count"]))
        .collect()
    )
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == n
    # 500 docs, binomial(500, .8): ±5 sigma ≈ ±45
    assert abs(counts.get("train", 0) - 0.8 * n) < 0.1 * n


def test_split_column_rejects_bad_weights():
    with pytest.raises(ValueError, match="sum to 1"):
        split_column(F.col("id"), {"train": 0.8, "val": 0.1})


def test_split_report_covers_strata(spark):
    rep = split_report(
        spark.read.parquet(f"{SF}/documents.parquet")
    ).collect()
    assert all(r.n_docs > 0 for r in rep)
    assert {r.split for r in rep} == {"train", "val", "test"}


def test_bm25_ranks_term_rich_docs_first(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark spark spark window merge"),
            Row(doc_id=2, text="spark window"),
            Row(doc_id=3, text="nothing relevant here at all"),
            Row(doc_id=4, text="window window merge merge vector"),
        ]
    )
    got = bm25_topk(docs, ["window", "merge", "vector"], k=3).collect()
    assert [r.rank for r in got] == [1, 2, 3]
    # doc 4 contains every query term, multiple times, in a short doc
    assert got[0].doc_id == 4
    assert got[0].score > got[1].score > 0
    # doc 3 matches nothing: never scored
    assert 3 not in {r.doc_id for r in got}


def test_bm25_k_bounds_result(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    got = bm25_topk(d, ["merge", "vector", "window"], k=5).collect()
    assert len(got) == 5
    assert [r.rank for r in got] == [1, 2, 3, 4, 5]
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)


def test_editdistance_pairs_finds_suffix_edit(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the dog"),
            Row(doc_id=2, text="the quick brown fox jumps over the dog!!"),
            Row(doc_id=3, text="the quick brown fox leaps over a big cat"),
            Row(doc_id=4, text="completely unrelated text about parquet"),
        ]
    )
    got = {
        (r.id_a, r.id_b): r.dist
        for r in editdistance_pairs(docs, max_dist=8).collect()
    }
    assert got[(1, 2)] == 2  # two appended chars
    assert (1, 4) not in got and (2, 4) not in got
    for (a, b), d in got.items():
        assert a < b and 0 <= d <= 8


def test_editdistance_prefix_block_miss_is_documented(spark):
    """An edit inside the first prefix_len chars moves the doc to a
    different block — the documented recall tradeoff."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="abcdefghijklmnop same tail here"),
            Row(doc_id=2, text="Xbcdefghijklmnop same tail here"),  # head edit
            Row(doc_id=3, text="abcdefghijklmnop same tail herXX"),  # tail edit
        ]
    )
    got = {
        (r.id_a, r.id_b): r.dist
        for r in editdistance_pairs(docs, max_dist=8).collect()
    }
    assert (1, 2) not in got  # head edit changed the block: missed
    assert got[(1, 3)] == 2  # tail edit shares the block: found
