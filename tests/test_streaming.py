"""Structured Streaming surface: a file-driven stream through the
windowed aggregation must equal the batch computation over the same
rows (memory sink + processAllAvailable drives it to completion)."""

import pytest
from pyspark.sql import functions as F

from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.streaming import (
    sessionize_batch,
    windowed_event_counts,
    windowed_event_counts_stream,
)


@pytest.fixture(scope="module")
def events_path(spark, sf_dir, tmp_path_factory):
    """Events re-written as µs timestamps (streaming source can't use
    the NANOS originals)."""
    out = str(tmp_path_factory.mktemp("stream") / "events")
    load_events(spark, sf_dir).coalesce(2).write.parquet(out)
    return out


def test_stream_equals_batch(spark, events_path):
    batch_df = spark.read.parquet(events_path)
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_counts(batch_df, "1 hour").collect()
    }

    stream = windowed_event_counts_stream(
        spark, events_path, batch_df.schema, "1 hour", watermark="10 years"
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in spark.sql("SELECT * FROM win_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_sessionize_batch_sanity(spark, events_path):
    ev = spark.read.parquet(events_path)
    out = sessionize_batch(ev, gap_minutes=30)
    rows = out.collect()
    assert len(rows) == ev.select("user_id").distinct().count()
    total_sessions = sum(r.n_sessions for r in rows)
    assert total_sessions >= len(rows)  # at least one session per user
    assert all(r.max_session_events >= 1 for r in rows)


def test_stream_exact_dedup_equals_batch_distinct(
    spark, sf_dir, tmp_path_factory
):
    """First-wins streaming dedup: a completed stream over a corpus
    written TWICE (every doc a duplicate) must surface exactly the
    batch-distinct fingerprint set, once each."""
    from datafusion_archive_spark.functions import text as TX
    from datafusion_archive_spark.streaming import exact_dedup_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path_factory.mktemp("sdedup") / "docs")
    docs.coalesce(1).write.parquet(path)
    docs.coalesce(1).write.mode("append").parquet(path)

    stream = exact_dedup_stream(spark, path, docs.schema)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT fp FROM dedup_out").collect()
    finally:
        q.stop()
    batch_fps = {
        r.fp
        for r in docs.select(TX.fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .collect()
    }
    assert len(got) == len(batch_fps)  # each fingerprint exactly once
    assert {r.fp for r in got} == batch_fps


def test_stream_event_dedup_within_watermark(spark, events_path):
    """Watermarked dedup drops duplicate (user_id, ts) arrivals while
    keeping state bounded by the watermark horizon."""
    from datafusion_archive_spark.streaming import event_dedup_stream

    batch_df = spark.read.parquet(events_path)
    doubled_path = events_path + "_doubled"
    batch_df.coalesce(1).write.mode("overwrite").parquet(doubled_path)
    batch_df.coalesce(1).write.mode("append").parquet(doubled_path)

    stream = event_dedup_stream(
        spark, doubled_path, batch_df.schema,
        keys=["user_id", "ts"], watermark="10 years",
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("ededup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) AS n FROM ededup_out").collect()[0].n
    finally:
        q.stop()
    assert n == batch_df.select("user_id", "ts").distinct().count()


def test_stream_stream_attribution_join_equals_batch(spark, events_path):
    """Stream-stream join with event-time bounds: a completed stream
    must produce exactly the batch join's pair set."""
    from datafusion_archive_spark.streaming.events import (
        attribution_join_batch,
        attribution_join_stream,
    )

    batch_df = spark.read.parquet(events_path)
    want = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in attribution_join_batch(
            batch_df, within_minutes=60
        ).collect()
    }
    assert want  # non-vacuous: the testdata really has conversions

    stream = attribution_join_stream(
        spark, events_path, batch_df.schema,
        within_minutes=60, watermark="10 years",
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.click_id, r.purchase_id)
            for r in spark.sql("SELECT * FROM attr_out").collect()
        }
    finally:
        q.stop()
    assert got == want


def test_hopping_stream_equals_batch(spark, events_path):
    """Hopping (1h window / 30min slide) streaming agg must equal the
    batch computation — each event in exactly two overlapping windows."""
    batch_df = spark.read.parquet(events_path)
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_counts(
            batch_df, "1 hour", slide="30 minutes"
        ).collect()
    }
    assert expected, "batch hopping agg must not be empty"

    stream = windowed_event_counts_stream(
        spark, events_path, batch_df.schema, "1 hour",
        watermark="10 years", slide="30 minutes",
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hop_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in spark.sql("SELECT * FROM hop_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_foreach_batch_upsert_equals_batch_latest(
    spark, sf_dir, tmp_path_factory
):
    """Streaming foreachBatch-upsert must converge to the batch
    latest-row-per-key result, and re-delivering a batch (failure
    replay) must be a no-op (idempotent exactly-once contract)."""
    from datafusion_archive_spark.streaming.sinks import (
        ParquetUpsertSink,
        stream_upsert_parquet,
    )

    base = tmp_path_factory.mktemp("upsert")
    src = str(base / "src")
    tgt = str(base / "tgt")

    ev = load_events(spark, sf_dir).select("event_id", "user_id", "value")
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(src)
    # second delivery overlaps the first (odd ids + a repriced overlap
    # slice) so the upsert path actually updates rows
    ev.filter(F.col("event_id") % 3 == 0).withColumn(
        "value", F.col("value") * 2
    ).write.mode("append").parquet(src)

    q = stream_upsert_parquet(
        spark, src, ev.schema, tgt, key="event_id"
    )
    q.awaitTermination(120)

    got = spark.read.parquet(tgt)
    # every source id present exactly once
    n_ids = (
        spark.read.parquet(src).select("event_id").distinct().count()
    )
    assert got.count() == n_ids
    assert got.groupBy("event_id").count().filter("count > 1").count() == 0

    # replaying the full source as one batch must change nothing
    sink = ParquetUpsertSink(spark, tgt, "event_id")
    before = {(r.event_id, r.value) for r in got.collect()}
    sink(spark.read.parquet(src).dropDuplicates(["event_id"]), 999)
    after = {
        (r.event_id, r.value)
        for r in spark.read.parquet(tgt).collect()
    }
    assert {e for e, _ in after} == {e for e, _ in before}
