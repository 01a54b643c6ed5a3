"""Incremental materialized-view maintenance: the drip-fed
incremental rollup must equal the one-shot batch aggregate
(streaming/matview.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datafusion_archive_spark.functions.rounding import decimal_sum
from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.streaming.matview import (
    IncrementalRollupSink,
    merge_states,
    partial_state,
)


def _batch_rollup(events):
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        decimal_sum(F.col("value")).cast("double").alias("sum_value"),
    )


def test_incremental_equals_batch_over_drip(spark, sf_dir, tmp_path):
    """Drip the events table through in 5 micro-batches; the
    maintained view must equal the full-recompute rollup exactly."""
    events = load_events(spark, sf_dir).select("event_type", "value")
    target = str(tmp_path / "rollup")
    sink = IncrementalRollupSink(spark, target, ["event_type"], "value")
    # simulate micro-batches deterministically: 5 hash-slices
    for i in range(5):
        sink(events.filter(F.crc32(F.col("value").cast("string")) % 5 == i), i)
    got = {
        r.event_type: (r.n_events, r.sum_value, r.avg_value)
        for r in sink.read_view().collect()
    }
    want = {
        r.event_type: (r.n_events, r.sum_value)
        for r in _batch_rollup(events).collect()
    }
    assert set(got) == set(want)
    for k, (n, s) in want.items():
        assert got[k][0] == n
        assert math.isclose(got[k][1], s, abs_tol=1e-6), k
        assert math.isclose(got[k][2], s / n, abs_tol=1e-6), k


def test_merge_states_is_associative_under_reorder(spark, sf_dir):
    """⊕ must give the same state regardless of slice order — the
    property that makes replay-free incremental maintenance sound."""
    events = load_events(spark, sf_dir).select("event_type", "value")
    slices = [
        partial_state(
            events.filter(
                F.crc32(F.col("value").cast("string")) % 3 == i
            ),
            ["event_type"],
            "value",
        )
        for i in range(3)
    ]
    ab_c = merge_states(
        merge_states(slices[0], slices[1], ["event_type"]),
        slices[2],
        ["event_type"],
    )
    c_ba = merge_states(
        slices[2],
        merge_states(slices[1], slices[0], ["event_type"]),
        ["event_type"],
    )
    rows1 = {
        r.event_type: (r.n, float(r.sum_v)) for r in ab_c.collect()
    }
    rows2 = {
        r.event_type: (r.n, float(r.sum_v)) for r in c_ba.collect()
    }
    assert rows1 == rows2


def test_streaming_drip_equals_batch(spark, sf_dir, tmp_path):
    """The real streaming path: multi-file source, one file per
    trigger, availableNow — final view == batch rollup."""
    from datafusion_archive_spark.streaming.matview import (
        stream_incremental_rollup,
    )

    events = load_events(spark, sf_dir).select("event_type", "value")
    src = str(tmp_path / "src")
    events.repartition(4).write.parquet(src)
    target = str(tmp_path / "rollup_stream")
    q, sink = stream_incremental_rollup(
        spark,
        src,
        spark.read.parquet(src).schema,
        target,
        ["event_type"],
        "value",
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        r.event_type: (r.n_events, r.sum_value)
        for r in sink.read_view().collect()
    }
    want = {
        r.event_type: (r.n_events, r.sum_value)
        for r in _batch_rollup(events).collect()
    }
    assert got == want


def test_streaming_restart_with_checkpoint_no_double_fold(
    spark, sf_dir, tmp_path
):
    """Stop-and-restart against the same checkpoint: the second run
    must fold in only the NEW files — the batch-id marker plus the
    checkpointed offsets together guarantee no already-applied
    micro-batch is added twice (the ADVICE r5 at-least-once hole,
    exercised through the real streaming machinery, not the sink
    called directly)."""
    from datafusion_archive_spark.streaming.matview import (
        stream_incremental_rollup,
    )

    events = load_events(spark, sf_dir).select("event_type", "value")
    half1 = events.filter(F.crc32(F.col("value").cast("string")) % 2 == 0)
    half2 = events.filter(F.crc32(F.col("value").cast("string")) % 2 == 1)
    src = str(tmp_path / "src")
    target = str(tmp_path / "rollup_restart")
    schema = events.schema

    half1.coalesce(1).write.mode("append").parquet(src)
    q1, sink1 = stream_incremental_rollup(spark, src, schema, target,
                                          ["event_type"], "value")
    try:
        q1.awaitTermination(120)
    finally:
        q1.stop()
    after1 = {
        r.event_type: (r.n_events, r.sum_value)
        for r in sink1.read_view().collect()
    }
    want1 = {
        r.event_type: (r.n_events, r.sum_value)
        for r in _batch_rollup(half1).collect()
    }
    assert after1 == want1

    # new files arrive; a FRESH query + sink resume from the same
    # checkpoint and parquet state
    half2.coalesce(1).write.mode("append").parquet(src)
    q2, sink2 = stream_incremental_rollup(spark, src, schema, target,
                                          ["event_type"], "value")
    try:
        q2.awaitTermination(120)
    finally:
        q2.stop()
    got = {
        r.event_type: (r.n_events, r.sum_value)
        for r in sink2.read_view().collect()
    }
    want = {
        r.event_type: (r.n_events, r.sum_value)
        for r in _batch_rollup(events).collect()
    }
    # exact equality: the long-micros state makes the two-step fold
    # bit-identical to the one-shot rollup, whatever the replay split
    assert got == want, "restart must fold in exactly the new files"
