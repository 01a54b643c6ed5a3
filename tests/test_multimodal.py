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


def test_decoder_resolver_prefers_pillow_else_stub():
    """VERDICT r9 #6: the codec path is a guarded per-executor import —
    Pillow when present (dormant in this container), the deterministic
    stub otherwise. Behavior without the dep must be byte-identical to
    the pre-guard code, which test_decode_stub_deterministic already
    pins end-to-end; here we pin the selection itself."""
    try:
        import PIL.Image  # noqa: F401

        have_pillow = True
    except ImportError:
        have_pillow = False
    expected = (
        multimodal._decode_pillow if have_pillow else multimodal._decode_stub
    )
    assert multimodal._resolve_decoder() is expected


def test_decode_pillow_roundtrip(media):
    """Runs only where Pillow exists: a real PNG round-trips through
    the SAME mapInPandas plumbing as the stub (schema, batch shape),
    with the true dimensions and a ValueError on corrupt bytes."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    PIL_Image.new("RGB", (37, 21)).save(buf, format="PNG")
    png = buf.getvalue()
    assert multimodal._decode_pillow(png) == (37, 21, 1)
    with pytest.raises(ValueError, match="corrupt"):
        multimodal._decode_pillow(b"\x00not-an-image")
    spark = media.sparkSession
    df = multimodal.attach_media(
        spark.createDataFrame([(1, png)], "doc_id long, payload binary"),
        "payload",
    )
    row, = multimodal.decode_media(df, "payload").collect()
    assert (row.width, row.height, row.n_frames) == (37, 21, 1)
