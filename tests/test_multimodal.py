"""Multimodal binary-column plumbing (decode step is a documented
deterministic stub; the Spark-side schema/batching/partitioning is
real)."""

import pytest
from pyspark.sql import functions as F

from datafusion_archive_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, b"\x89PNG fake bytes"), (2, b"RIFF fake wav bytes longer")],
        ["doc_id", "payload"],
    )
    return multimodal.attach_media(df, "payload", media_type="image")


def test_attach_media_metadata(media):
    rows = {r.doc_id: r.media_meta for r in media.collect()}
    assert rows[1].media_type == "image"
    assert rows[1].byte_len == 15
    assert len(rows[1].content_md5) == 32


def test_decode_stub_deterministic(media):
    out = {r.doc_id: r for r in multimodal.decode_media(media, "payload").collect()}
    n = 15
    assert out[1].width == 64 + n % 577
    assert out[1].height == 64 + (n * 31) % 389
    assert out[1].n_frames == 1 + n % 7
    # stable across runs
    again = {
        r.doc_id: r for r in multimodal.decode_media(media, "payload").collect()
    }
    assert out[1] == again[1]


def test_frame_sample(media):
    decoded = multimodal.decode_media(media, "payload")
    frames = multimodal.frame_sample(decoded, every_n=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    dec = {r.doc_id: r.n_frames for r in decoded.collect()}
    for doc_id, idxs in by_doc.items():
        assert sorted(idxs) == list(range(0, dec[doc_id], 2))


def test_decode_stub_rejects_empty_payload():
    with pytest.raises(ValueError):
        multimodal._decode_stub(b"")
