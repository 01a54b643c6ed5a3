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
