"""Stream-static enrichment: the file-driven stream joined to the
static customer dimension must equal the certified batch twin
(streaming/enrich.py; queries/pipeline20.py)."""

from __future__ import annotations

import pytest

from datafusion_archive_spark.queries.timeseries import load_events
from datafusion_archive_spark.streaming.enrich import (
    enrich_events_batch,
    enrich_events_stream,
)


@pytest.fixture(scope="module")
def enrich_paths(spark, sf_dir, tmp_path_factory):
    """Re-materialize events as a multi-file directory so the stream
    arrives in several micro-batches (order-independence matters)."""
    path = str(tmp_path_factory.mktemp("enrich") / "events")
    load_events(spark, sf_dir).repartition(4).write.parquet(path)
    return path


def test_stream_equals_batch(spark, sf_dir, enrich_paths):
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    events = spark.read.parquet(enrich_paths)
    expected = {
        r.segment: (r.n_events, r.sum_value)
        for r in enrich_events_batch(events, customer).collect()
    }
    assert expected  # non-vacuous: the dim covers the user range

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(enrich_paths)
    )
    q = (
        enrich_events_stream(stream, customer)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("enrich_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.segment: (r.n_events, r.sum_value)
            for r in spark.sql("SELECT * FROM enrich_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_dimension_is_broadcast(spark, sf_dir):
    """The enrichment join must broadcast the dimension — the fact
    side must not shuffle for the join."""
    from datafusion_archive_spark.plans import summarize

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    events = load_events(spark, sf_dir)
    s = summarize(enrich_events_batch(events, customer))
    assert any("Broadcast" in j for j in s.joins), s.joins
