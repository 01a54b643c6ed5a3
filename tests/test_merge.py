"""MERGE/upsert/SCD2 emulation + foreachBatch exactly-once sink."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from datafusion_archive_spark.operators.merge import (
    merge_delete,
    merge_upsert,
    scd2_apply,
)


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["id", "name", "score"],
    )


def test_merge_upsert(spark, target):
    source = spark.createDataFrame(
        [(2, "b2", 22.0), (4, "d", 40.0)], ["id", "name", "score"]
    )
    out = {r.id: (r.name, r.score) for r in merge_upsert(target, source, "id").collect()}
    assert out == {
        1: ("a", 10.0), 2: ("b2", 22.0), 3: ("c", 30.0), 4: ("d", 40.0),
    }


def test_merge_delete(spark, target):
    deletes = spark.createDataFrame([(1,), (3,)], ["id"])
    out = sorted(r.id for r in merge_delete(target, deletes, "id").collect())
    assert out == [2]  # 1 and 3 removed


def test_scd2_apply(spark):
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    dim = spark.createDataFrame(
        [(1, "alice", t0, None, True), (2, "bob", t0, None, True)],
        "id long, name string, valid_from timestamp, valid_to timestamp, "
        "is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "alicia", t1)], "id long, name string, valid_from timestamp"
    )
    out = scd2_apply(dim, updates, "id")
    rows = sorted(
        ((r.id, r.name, r.is_current, r.valid_to) for r in out.collect())
    )
    assert rows == [
        (1, "alice", False, t1),   # closed-out old version
        (1, "alicia", True, None), # new current version
        (2, "bob", True, None),    # untouched
    ]


def test_foreachbatch_exactly_once_sink(spark, sf_dir, tmp_path_factory):
    """foreachBatch + epoch-keyed idempotent writes: re-delivering a
    batch must not duplicate data (the exactly-once sink pattern)."""
    src = str(tmp_path_factory.mktemp("fb") / "src")
    out = str(tmp_path_factory.mktemp("fb") / "out")
    from datafusion_archive_spark.queries.timeseries import load_events

    # repartition (not coalesce): limit collapses to one partition and
    # coalesce cannot increase the count — we need ≥2 files for ≥2
    # micro-batches
    load_events(spark, sf_dir).limit(500).repartition(2).write.parquet(src)
    batch_df = spark.read.parquet(src)

    seen_epochs = []

    def write_epoch(df, epoch_id):
        # idempotence: one deterministic directory per epoch, overwrite
        df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")
        seen_epochs.append(epoch_id)
        if len(seen_epochs) == 1:  # simulate a redelivery of epoch 0
            df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

    q = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(write_epoch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(seen_epochs) >= 2  # multiple micro-batches ran
    total = spark.read.parquet(f"{out}/epoch=*").count()
    assert total == batch_df.count()  # no duplicates despite redelivery
