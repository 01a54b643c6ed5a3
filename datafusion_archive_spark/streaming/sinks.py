"""Streaming sinks beyond the built-ins: foreachBatch upsert — the
canonical Structured Streaming → table pattern when the store has no
transactional streaming sink (the copy-on-write lakehouse shape).

Each micro-batch MERGEs into the target via
:func:`datafusion_archive_spark.operators.merge.merge_upsert`; batch
replays (failure recovery re-delivers a micro-batch) are idempotent
because upsert by key converges — the exactly-once-by-idempotence
contract foreachBatch is designed around.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_archive_spark.operators.merge import merge_upsert


class ParquetUpsertSink:
    """foreachBatch target: maintain a parquet table upserted by key.

    Serializes batches with a lock (foreachBatch may overlap under
    some triggers) and rewrites copy-on-write via an adjacent tmp dir
    + atomic rename — the same never-lose-data swap as
    ``sources.layout.compact``. Local paths only (object stores need a
    table-format commit protocol; out of scope here).
    """

    def __init__(self, spark: SparkSession, path: str, key: str):
        self.spark = spark
        self.path = path
        self.key = key
        self._lock = threading.Lock()

    def read(self) -> DataFrame | None:
        if not os.path.isdir(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        with self._lock:
            current = self.read()
            # within-batch dedup first: a micro-batch may carry several
            # versions of a key. dropDuplicates keeps whichever row a
            # partition happens to deliver first — a REPLAYED batch
            # could then converge to a different row per key, silently
            # violating the idempotence contract. The lexicographic
            # struct-max is deterministic under any partitioning
            # (upstream queries that care still order by a real
            # version column before the sink).
            value_cols = [c for c in batch.columns if c != self.key]
            batch = (
                batch.groupBy(self.key)
                .agg(F.max(F.struct(*value_cols)).alias("_r"))
                .select(self.key, "_r.*")
            )
            merged = (
                merge_upsert(current, batch, self.key)
                if current is not None
                else batch
            )
            tmp = self.path.rstrip("/") + "__tmp"
            merged.write.mode("overwrite").parquet(tmp)
            old = self.path.rstrip("/") + "__old"
            import shutil

            if os.path.exists(old):
                shutil.rmtree(old)
            had_current = os.path.exists(self.path)
            try:
                if had_current:
                    os.rename(self.path, old)
                os.rename(tmp, self.path)
            except OSError:
                # crash-safety: if the second rename failed after the
                # first succeeded, the target is missing — restore it
                # from __old so data is never stranded (same recovery
                # contract as sources.layout.compact)
                if had_current and not os.path.exists(self.path):
                    os.rename(old, self.path)
                raise
            if os.path.exists(old):
                shutil.rmtree(old)


def stream_upsert_parquet(
    spark: SparkSession,
    source_path: str,
    schema,
    target_path: str,
    key: str,
):
    """File stream → foreachBatch MERGE into a parquet table. Returns
    the StreamingQuery (caller awaits / stops)."""
    sink = ParquetUpsertSink(spark, target_path, key)
    stream = spark.readStream.schema(schema).parquet(source_path)
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", target_path.rstrip("/") + "__ckpt")
        .trigger(availableNow=True)
        .start()
    )
