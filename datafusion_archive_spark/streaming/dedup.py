"""Streaming deduplication — the stream twin of
:mod:`datafusion_archive_spark.operators.dedup`.

Ingestion pipelines dedupe on the fly: the batch fingerprint
(:func:`~datafusion_archive_spark.functions.text.fingerprint`) computes
scan-side on the stream exactly as in batch, and Spark keeps the
seen-key set as managed state. Two state regimes:

- :func:`exact_dedup_stream` — ``dropDuplicates`` on the content
  fingerprint: state holds every distinct key forever. Right for
  bounded key spaces or reprocessing-window jobs; at 100 TB/∞ streams
  prefer the watermarked form.
- :func:`event_dedup_stream` — ``dropDuplicatesWithinWatermark``:
  duplicates arriving within the watermark horizon are suppressed and
  state is EVICTED once the watermark passes — bounded state, the
  at-scale default for at-least-once sources whose duplicates arrive
  close together (Kafka redeliveries, retried batches).

Semantics (both): first arrival wins; a completed stream's distinct
key set equals the batch ``distinct`` over the same rows (asserted in
tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_archive_spark.functions import text as TX


def exact_dedup_stream(
    spark: SparkSession,
    path: str,
    schema,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """File-source stream → content fingerprint → first-wins dedup.
    Returns the streaming DataFrame (caller attaches a sink)."""
    src = spark.readStream.schema(schema).parquet(path)
    return src.select(
        TX.fingerprint(F.col(text_col)).alias("fp"), F.col(id_col)
    ).dropDuplicates(["fp"])


def event_dedup_stream(
    spark: SparkSession,
    path: str,
    schema,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream dedup: suppress duplicate (keys) arrivals
    within the watermark horizon, evicting state beyond it."""
    src = spark.readStream.schema(schema).parquet(path)
    return src.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys or ["user_id", ts_col]
    )
