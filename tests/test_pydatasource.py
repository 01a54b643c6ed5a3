"""Custom Python DataSource (fixed-width text): the Spark analog of
implementing the reference's ``trait DataSource``
(sources/pydatasource.py; DDL extension STORED AS FIXEDWIDTH)."""

from __future__ import annotations

import pytest

from datafusion_archive_spark.context import ExecutionContext
from datafusion_archive_spark import ddl


ROWS = [
    (1, "london", 51.5),
    (2, "paris", 48.9),
    (3, "berlin", 52.5),
    (4, "madrid", 40.4),
    (None, "oslo", None),  # blank fields → NULL
]


def _write_files(tmp_path, n_files=3):
    d = tmp_path / "fw"
    d.mkdir()
    # widths: id=4, city=8, lat=6
    for i in range(n_files):
        lines = []
        for rid, city, lat in ROWS[i::n_files]:
            sid = "" if rid is None else str(rid)
            slat = "" if lat is None else f"{lat}"
            lines.append(f"{sid:<4}{city:<8}{slat:<6}")
        (d / f"part{i}.txt").write_text("\n".join(lines) + "\n")
    return str(d)


def test_read_with_schema_and_types(spark, tmp_path):
    path = _write_files(tmp_path)
    from datafusion_archive_spark.sources import pydatasource

    pydatasource.register(spark)
    df = (
        spark.read.format("fixedwidth")
        .schema("id int, city string, lat double")
        .option("widths", "4,8,6")
        .option("path", path)
        .load()
    )
    got = {(r.id, r.city, r.lat) for r in df.collect()}
    assert got == set(ROWS)


def test_default_schema_all_strings(spark, tmp_path):
    path = _write_files(tmp_path)
    from datafusion_archive_spark.sources import pydatasource

    pydatasource.register(spark)
    df = (
        spark.read.format("fixedwidth")
        .option("widths", "4,8,6")
        .option("path", path)
        .load()
    )
    assert [f.name for f in df.schema.fields] == ["c0", "c1", "c2"]
    assert all(f.dataType.simpleString() == "string" for f in df.schema.fields)
    cities = {r.c1 for r in df.collect()}
    assert cities == {c for _, c, _ in ROWS}


def test_one_partition_per_file(spark, tmp_path):
    """The split unit is the file — per-file parallelism, the same
    fallback Spark's own unsplittable text formats use."""
    path = _write_files(tmp_path, n_files=3)
    from datafusion_archive_spark.sources.pydatasource import (
        FixedWidthReader,
    )
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("id int, city string, lat double")
    reader = FixedWidthReader(schema, {"path": path, "widths": "4,8,6"})
    assert len(reader.partitions()) == 3


def test_ddl_fixedwidth_end_to_end(spark, tmp_path):
    path = _write_files(tmp_path)
    ctx = ExecutionContext(spark)
    ctx.sql(
        f"CREATE EXTERNAL TABLE fw (id INT, city VARCHAR, lat DOUBLE) "
        f"STORED AS FIXEDWIDTH WIDTHS '4,8,6' LOCATION '{path}'"
    )
    out = ctx.sql(
        "SELECT city FROM fw WHERE lat > 50 ORDER BY city"
    ).collect()
    assert [r.city for r in out] == ["berlin", "london"]


def test_ddl_fixedwidth_requires_widths():
    with pytest.raises(ValueError, match="WIDTHS"):
        ddl.parse_create_external_table(
            "CREATE EXTERNAL TABLE t (a INT) STORED AS FIXEDWIDTH "
            "LOCATION '/tmp/x'"
        )


def test_reader_rejects_width_mismatch(spark, tmp_path):
    from datafusion_archive_spark.sources.pydatasource import (
        FixedWidthReader,
    )
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("id int, city string")
    with pytest.raises(ValueError, match="widths"):
        FixedWidthReader(schema, {"path": "/tmp/x", "widths": "4,8,6"})


def test_streaming_new_files_arrive_exactly_once(spark, tmp_path):
    """The streaming half: each micro-batch is the newly arrived
    files; appending a file after the first drain delivers ONLY the
    new rows (offset bookkeeping, no re-reads)."""
    from datafusion_archive_spark.sources import pydatasource

    pydatasource.register(spark)
    d = tmp_path / "fw_stream"
    d.mkdir()
    (d / "a.txt").write_text("1   london  51.5  \n")
    (d / "b.txt").write_text("2   paris   48.9  \n")
    stream = (
        spark.readStream.format("fixedwidth")
        .schema("id int, city string, lat double")
        .option("widths", "4,8,6")
        .option("path", str(d))
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("fw_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r.city for r in spark.sql("SELECT * FROM fw_out").collect()}
        assert first == {"london", "paris"}
        (d / "c.txt").write_text("3   berlin  52.5  \n")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM fw_out").collect()
        assert {r.city for r in rows} == {"london", "paris", "berlin"}
        assert len(rows) == 3  # exactly once — no replays
    finally:
        q.stop()


def test_binary_file_ingestion_to_multimodal(spark, tmp_path):
    """binaryFile source → multimodal decode plumbing end-to-end:
    payload bytes arrive as BINARY and flow through the stubbed
    Arrow-batched decoder; a metadata-only projection must prune the
    content column at the scan."""
    from datafusion_archive_spark.context import ExecutionContext
    from datafusion_archive_spark.operators.multimodal import (
        attach_media,
        decode_media,
    )
    from datafusion_archive_spark.plans import summarize
    from pyspark.sql import functions as F

    d = tmp_path / "media"
    d.mkdir()
    payloads = {f"img{i}.png": bytes([i]) * (16 + i) for i in range(4)}
    (d / "skip.txt").write_text("not media")
    for name, data in payloads.items():
        (d / name).write_bytes(data)

    ctx = ExecutionContext(spark)
    media = ctx.register_binary("media", str(d), path_glob="*.png")
    rows = media.select("path", "length", "content").collect()
    assert {r.path.rsplit("/", 1)[-1] for r in rows} == set(payloads)
    for r in rows:
        assert bytes(r.content) == payloads[r.path.rsplit("/", 1)[-1]]
        assert r.length == len(payloads[r.path.rsplit("/", 1)[-1]])

    # metadata-only projection prunes the payload at the scan
    s = summarize(media.select("path", "length"))
    assert all("content" not in rs for rs in s.read_schemas), s.read_schemas

    # stubbed decode over the ingested binary column (attach the
    # JVM-side metadata struct first — the decode contract)
    with_id = attach_media(
        media.select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("content").alias("payload"),
        ),
        "payload",
    )
    decoded = decode_media(with_id, "payload")
    assert decoded.count() == len(payloads)
