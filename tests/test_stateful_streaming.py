"""applyInPandasWithState operator: the final state after draining a
file-driven stream must equal the batch aggregation over the same rows."""

import pytest
from pyspark.sql import functions as F

from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.streaming.stateful import running_user_profile


def test_stateful_profile_equals_batch(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stateful") / "events")
    ev = load_events(spark, sf_dir)
    # two files → at least one micro-batch boundary exercised
    ev.coalesce(2).write.parquet(out)
    batch_df = spark.read.parquet(out)

    expected = {
        r.user_id: (r.n, round(r.s, 2))
        for r in batch_df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "1")  # force multiple micro-batches
        .parquet(out)
    )
    q = (
        running_user_profile(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("profiles")
        .start()
    )
    try:
        q.processAllAvailable()
        # 'update' emits one row per key per batch; the LAST emission per
        # key is the final state
        got_rows = spark.sql("SELECT * FROM profiles").collect()
    finally:
        q.stop()

    final = {}
    for r in got_rows:  # memory sink appends in batch order
        final[r.user_id] = (r.n_events, r.sum_value)
    assert len(final) == len(expected)
    for uid, (n, s) in expected.items():
        assert final[uid] == (n, s), f"user {uid}"
