"""Streaming session_window: real streaming sessionization with a
watermark, driven to completion — final sessions must match the batch
session_window over the same rows."""

import pytest
from pyspark.sql import functions as F

from datafusion_archive_spark.queries.timeseries import load_events


@pytest.fixture(scope="module")
def events_path(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sess") / "events")
    load_events(spark, sf_dir).coalesce(2).write.parquet(out)
    return out


def test_streaming_session_window_equals_batch(spark, events_path):
    batch_df = spark.read.parquet(events_path)
    expected = {
        (r.user_id, r.n): r.cnt
        for r in (
            batch_df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("user_id", "n")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
    }

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_path)
        .withWatermark("ts", "10 years")  # nothing dropped: full compare
    )
    agg = stream.groupBy(
        F.session_window("ts", "30 minutes"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sessions_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.n): r.cnt
            for r in spark.sql(
                "SELECT user_id, n, count(*) AS cnt FROM sessions_out "
                "GROUP BY user_id, n"
            ).collect()
        }
    finally:
        q.stop()
    assert got == expected
